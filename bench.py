"""Benchmark harness — run on the real TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: two-tower training throughput (examples/s/chip) at the
reference configuration scale (H&M: ~1.37M customers, ~105k articles,
B=512, logQ in-batch softmax — ref: main.py:32-111, README.md). Also
measures full-corpus exact top-100 retrieval queries/s; details land in
bench_results.json.

Method notes (tunnel-aware):
- all timing loops run ON DEVICE via lax.scan with data generated/varied on
  device, then one host sync — host<->device latency through the axon relay
  is ~150ms and would otherwise dominate;
- training batches are pre-generated on device OUTSIDE the timed scan
  (threefry id synthesis is input-pipeline work, not train-step work);
- identical repeated dispatches can be served from a cache by the remote
  runtime, so every iteration varies its inputs.

``vs_baseline`` compares against the TF/Keras reference architecture
executing the same workload on this host's CPU (measured by
benchmarks/tf_reference_baseline.py, recorded in BASELINE.md).
"""

import argparse
import json
import os
import time

import jax

# Persistent compilation cache: remote compiles through the tunnel can take
# minutes; cached reruns skip them.
os.makedirs(".jax_cache", exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

# Reference-architecture throughput on this host's CPU (TF/Keras, B=512,
# same tower shapes), measured 2026-08-17 by
# benchmarks/tf_reference_baseline.py — see BASELINE.md.
TF_CPU_BASELINE_EXAMPLES_PER_S = 1280.3


def hm_scale_model(
    n_customers: int = 1_371_980,
    n_articles: int = 105_542,
    emb_dim: int = 128,
    history_len: int = 0,
    history_pooling: str = "mean",
):
    """``history_len > 0`` adds a last-N purchase-history SEQUENCE
    query feature over the article vocab (BASELINE config[3])."""
    from hm_retrieval_tpu.models import TwoTowerModel
    from hm_retrieval_tpu.schema import (
        Feature,
        FeatureFamily,
        FeatureKind,
    )

    # Feature with direct table size (bypasses building a 1.4M-entry
    # string vocab — vocab identity is irrelevant for throughput).
    class SizedFeature(Feature):
        def __init__(self, name, family, emb, V):
            super().__init__(
                name,
                FeatureKind.CATEGORICAL,
                family,
                embedding_size=emb,
                vocab=np.array(["x"]),
            )
            self._V = V

        @property
        def num_embeddings(self):
            return self._V + 1

    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.full(n_articles, 0.5))
    logq = np.zeros(n_articles + 1, np.float32)
    logq[1:] = np.log(probs + 1e-12).astype(np.float32)

    query_features = [
        SizedFeature(
            "customer_id", FeatureFamily.QUERY, emb_dim, n_customers
        ),
    ]
    if history_len:
        from hm_retrieval_tpu.schema import FeatureKind as _FK

        class SizedSeqFeature(SizedFeature):
            def __init__(self, name, family, emb, V, max_len, pooling):
                Feature.__init__(
                    self,
                    name,
                    _FK.SEQUENCE,
                    family,
                    embedding_size=emb,
                    vocab=np.array(["x"]),
                    max_len=max_len,
                    pooling=pooling,
                )
                self._V = V

        query_features.append(
            SizedSeqFeature(
                "purchase_history",
                FeatureFamily.QUERY,
                emb_dim,
                n_articles,
                history_len,
                history_pooling,
            )
        )

    model = TwoTowerModel(
        query_features=query_features,
        candidate_features=[
            SizedFeature(
                "article_id", FeatureFamily.CANDIDATE, emb_dim, n_articles
            ),
            SizedFeature(
                "product_type_name", FeatureFamily.CANDIDATE, 16, 130
            ),
            SizedFeature(
                "colour_group_name", FeatureFamily.CANDIDATE, 8, 50
            ),
        ],
        candidate_id_col="article_id",
        joint_embedding_size=emb_dim,
        query_tower_units=[256],
        candidate_tower_units=[256],
        logq=logq,
    )
    return model, n_customers, n_articles


def measure_null_roundtrip(n: int = 5) -> float:
    """Median seconds for dispatch + value-fetch of a trivial jitted
    op: the fixed tunnel/runtime overhead baked into EVERY timed
    dispatch below. Reported so readers can judge how much of a short
    measurement is relay latency rather than device time."""
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0.0)))  # compile
    ts = []
    for i in range(n):
        t0 = time.time()
        float(f(jnp.float32(i)))
        ts.append(time.time() - t0)
    return float(np.median(ts))


# single-chip saturation sweep points (BASELINE.md B-sweep): shared by
# bench.py --bsweep and benchmarks/bsweep_training.py so the curve has
# one definition
BSWEEP_BATCHES = (512, 2048, 8192)


def bench_training(
    steps: int,
    batch: int,
    sparse: bool = True,
    n_customers: int = 1_371_980,
    n_articles: int = 105_542,
    emb_dim: int = 128,
    repeats: int = 3,
    history_len: int = 0,
    history_pooling: str = "mean",
):
    """Training throughput. ``sparse=True`` uses the sparse embedding
    Adagrad (models/sparse_optimizer.py — the production path for big
    tables: only batch rows are updated, exact dense parity); False uses
    the dense optax step for comparison.

    The timed scan runs ``repeats`` times on distinct device-generated
    data; the headline is the MEDIAN with min/max spread reported
    alongside (the relay tunnel adds tens of ms of per-dispatch jitter —
    the unexplained 33% swing between two rounds' single-shot numbers
    motivated this; see BASELINE.md)."""
    import optax

    from hm_retrieval_tpu.models import (
        OptimizerFactory,
        create_train_state,
    )
    from hm_retrieval_tpu.models.sparse_optimizer import (
        create_sparse_train_state,
        make_sparse_train_step,
    )

    model, n_customers, n_articles = hm_scale_model(
        n_customers,
        n_articles,
        emb_dim,
        history_len=history_len,
        history_pooling=history_pooling,
    )
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": 0.05}
    )

    def batches_for(key):
        """All step batches at once, shaped (steps, batch) per feature —
        generated on device OUTSIDE the timed scan so the measurement is
        the pure train step, not threefry id synthesis."""
        kc, ka, kp, kcol, kh = jax.random.split(key, 5)
        shp = (steps, batch)
        out = {
            "customer_id": jax.random.randint(
                kc, shp, 0, n_customers + 1, dtype=jnp.int32
            ),
            "article_id": jax.random.randint(
                ka, shp, 0, n_articles + 1, dtype=jnp.int32
            ),
            "product_type_name": jax.random.randint(
                kp, shp, 0, 131, dtype=jnp.int32
            ),
            "colour_group_name": jax.random.randint(
                kcol, shp, 0, 51, dtype=jnp.int32
            ),
        }
        if history_len:
            out["purchase_history"] = jax.random.randint(
                kh,
                (steps, batch, history_len),
                0,
                n_articles + 1,
                dtype=jnp.int32,
            )
        return out

    if sparse:
        state = create_sparse_train_state(model, opt, 0)
        inner = make_sparse_train_step(model, opt, 0.05)

        def one(st, data):
            return inner.__wrapped__(st, data)

    else:
        state = create_train_state(model, opt, seed=0)

        def one(st, data):
            loss, grads = jax.value_and_grad(model.loss)(
                st.params, data
            )
            updates, opt_state = opt.update(
                grads, st.opt_state, st.params
            )
            params = optax.apply_updates(st.params, updates)
            return (
                st._replace(
                    params=params,
                    opt_state=opt_state,
                    step=st.step + 1,
                ),
                {"loss": loss},
            )

    @jax.jit
    def run(state, data):
        def body(carry, step_data):
            st, _ = carry
            st, m = one(st, step_data)
            return (st, m["loss"]), None
        (st, loss), _ = jax.lax.scan(body, (state, 0.0), data)
        return st, loss

    gen = jax.jit(batches_for)
    datas = [
        gen(jax.random.PRNGKey(i)) for i in range(repeats + 1)
    ]
    # value-fetch sync: through the relay, block_until_ready can return
    # before execution finishes (CLAUDE.md timing note), which would let
    # the timed run below start while this one is still in flight
    float(jax.tree_util.tree_leaves(datas[-1])[0][0, 0])
    t0 = time.time()
    state, loss = run(state, datas[0])
    float(loss)
    first = time.time() - t0
    dts = []
    for data in datas[1:]:
        t0 = time.time()
        state, loss = run(state, data)
        float(loss)  # host sync
        dts.append(time.time() - t0)
    dt = float(np.median(dts))
    eps = steps * batch / dt
    return {
        "train_examples_per_s_per_chip": eps,
        "train_examples_per_s_spread": [
            steps * batch / max(dts),
            steps * batch / min(dts),
        ],
        "train_repeat_s": dts,
        "train_step_ms": dt / steps * 1e3,
        "train_compile_s": first - dt,
        "train_path": "sparse_adagrad" if sparse else "dense",
        "final_loss": float(loss),
    }


def bench_pipeline_training(
    steps: int,
    batch: int,
    n_customers: int = 1_371_980,
    n_articles: int = 105_542,
    emb_dim: int = 128,
    workdir: str = None,
    steps_per_dispatch: int = 1,
    repeats: int = 3,
):
    """END-TO-END pipeline-fed training throughput: real shard files ->
    ShardDataset.iter_batches (threaded reads + buffered shuffle) ->
    device_feed (background prefetch) -> per-step jitted sparse-Adagrad
    dispatch. This is the production runner loop
    (runners/modelling.py:train epoch), so unlike the pure-step scan it
    pays host decode, per-step dispatch through the relay tunnel, and
    host->device transfer — SURVEY §7 hard part #6 measured honestly
    rather than excluded.

    Hardened like the pure-step scan (round-5, verdict r4 #2): the full
    loop runs ``repeats`` times (median + min/max spread in the JSON),
    and two phase measurements attribute any day-to-day swing — a
    host-only pass over the SAME reader (decode ms/step) and a
    feed+transfer-only pass (device_put consumption, no train step), so
    tunnel jitter, host decode, and dispatch cost are separable."""
    import shutil
    import tempfile

    from hm_retrieval_tpu.data.dataset import ShardDataset
    from hm_retrieval_tpu.data.device_feed import device_feed
    from hm_retrieval_tpu.models import OptimizerFactory
    from hm_retrieval_tpu.models.sparse_optimizer import (
        create_sparse_train_state,
        make_sparse_train_step,
    )

    model, n_customers, n_articles = hm_scale_model(
        n_customers, n_articles, emb_dim
    )
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": 0.05}
    )
    state = create_sparse_train_state(model, opt, 0)
    step = make_sparse_train_step(model, opt, 0.05)

    # Write real shard files with the H&M feature layout (int32 ids,
    # columnar npz + manifest — the ShardWriter format).
    rows = (steps + 8) * batch  # warmup + timed epoch worth of rows
    tmp = workdir or tempfile.mkdtemp(prefix="bench_shards_")
    rng = np.random.default_rng(0)
    cols = {
        "customer_id": rng.integers(
            0, n_customers + 1, rows, dtype=np.int32
        ),
        "article_id": rng.integers(
            0, n_articles + 1, rows, dtype=np.int32
        ),
        "product_type_name": rng.integers(
            0, 131, rows, dtype=np.int32
        ),
        "colour_group_name": rng.integers(
            0, 51, rows, dtype=np.int32
        ),
    }
    max_rows = 100_000
    num_shards = max(1, -(-rows // max_rows))
    for s in range(num_shards):
        lo, hi = s * max_rows, min((s + 1) * max_rows, rows)
        np.savez(
            os.path.join(tmp, f"shard_{s:05d}.npz"),
            **{k: v[lo:hi] for k, v in cols.items()},
        )
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(
            {
                "num_rows": rows,
                "num_shards": num_shards,
                "max_rows": max_rows,
                "features": {k: "int32" for k in cols},
            },
            f,
        )

    ds = ShardDataset(tmp)

    def feed(n, seed=1):
        it = ds.iter_batches(
            batch,
            shuffle_buffer_size=8 * batch,
            seed=seed,
            drop_remainder=True,
        )
        count = 0
        for b in it:
            yield b
            count += 1
            if count >= n:
                return

    spd = steps_per_dispatch
    if spd > 1:
        # chunked dispatch: K steps per device round trip — the
        # TrainingConfig.steps_per_dispatch lever, identical numerics
        from hm_retrieval_tpu.data.device_feed import (
            device_feed_chunked,
            make_chunked_train_step,
        )

        chunk_fn = make_chunked_train_step(step)

        def run_steps(n, seed=1):
            loss = None
            for chunk in device_feed_chunked(feed(n, seed), spd):
                nonlocal_state["state"], m = chunk_fn(
                    nonlocal_state["state"], chunk
                )
                loss = m["loss"]
            return loss

    else:

        def run_steps(n, seed=1):
            loss = None
            for db in device_feed(feed(n, seed)):
                nonlocal_state["state"], m = step(
                    nonlocal_state["state"], db
                )
                loss = m["loss"]
            return loss

    nonlocal_state = {"state": state}
    # warm: compile + spin the reader threads
    float(run_steps(4 * spd))

    eff_steps = (steps // spd) * spd
    # --- phase 1: host decode only (same reader config, batches
    # consumed on the host — no device work at all) ---
    t0 = time.time()
    n_host = 0
    for _ in feed(steps, seed=101):
        n_host += 1
    host_ms = (time.time() - t0) / n_host * 1e3
    # --- phase 2: feed + transfer only (device_put consumption
    # through the real prefetching feeder; no train step) ---
    t0 = time.time()
    last = None
    if spd > 1:
        for chunk in device_feed_chunked(feed(steps, 102), spd):
            last = chunk
    else:
        for db in device_feed(feed(steps, 102)):
            last = db
    float(jax.tree_util.tree_leaves(last)[0].reshape(-1)[0])
    transfer_ms = (time.time() - t0) / eff_steps * 1e3
    # --- full loop, repeated; headline = median ---
    dts = []
    for r in range(repeats):
        t0 = time.time()
        float(run_steps(steps, seed=2 + r))  # one sync at the end
        dts.append(time.time() - t0)
    dt = float(np.median(dts))
    if workdir is None:
        shutil.rmtree(tmp, ignore_errors=True)
    key = (
        "train_pipeline_chunked"
        if spd > 1
        else "train_pipeline"
    )
    return {
        f"{key}_examples_per_s": eff_steps * batch / dt,
        f"{key}_examples_per_s_spread": [
            eff_steps * batch / max(dts),
            eff_steps * batch / min(dts),
        ],
        f"{key}_repeat_s": dts,
        f"{key}_step_ms": dt / eff_steps * 1e3,
        f"{key}_host_decode_ms_per_step": host_ms,
        f"{key}_feed_transfer_ms_per_step": transfer_ms,
        f"{key}_steps": eff_steps,
        **(
            {f"{key}_steps_per_dispatch": spd} if spd > 1 else {}
        ),
    }


def bench_retrieval(
    iters: int, B: int, N: int, E: int, K: int, method: str = "pallas"
):
    """Exact full-corpus top-K. ``method``: "pallas" = streaming bin-max
    kernel (ops/pallas_retrieval.py, never materializes (B,N));
    "partial_reduce" = XLA iterative PartialReduce on materialized
    scores."""
    from hm_retrieval_tpu.ops.exact_topk import exact_topk_scores
    from hm_retrieval_tpu.ops.pallas_retrieval import (
        pallas_exact_topk,
    )

    # generate on device: uploading a multi-GB catalog through the relay
    # tunnel (~10-20 MB/s) would dominate bench time
    q = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (B, E), jnp.float32
        )
    )()
    c = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(1), (N, E), jnp.float32
        )
    )()
    jax.block_until_ready((q, c))

    @jax.jit
    def run(q, c, salt):
        # `salt` makes every DISPATCH's argument list unique: the remote
        # runtime can serve a repeated identical dispatch from a cache
        # (observed: a 18ms/batch scan "returning" in 1us), so the warm
        # call and each timed call must differ in args, not just in
        # on-device iteration state.
        def body(carry, i):
            qq = jnp.roll(q, i + salt, axis=0)
            if method == "pallas":
                v, idx, r = pallas_exact_topk(
                    qq, c, K, keep_per_bin=2
                )
            else:
                s = jnp.dot(
                    qq, c.T, preferred_element_type=jnp.float32
                )
                v, idx, r = exact_topk_scores(s, K)
            # consume EVERY output element: a [0,0]-only consumer lets
            # XLA dead-code-eliminate whole query blocks of the blocked
            # driver (benchmarks/timing_util.py)
            return (
                carry
                + jnp.sum(v)
                + jnp.sum(idx).astype(jnp.float32)
                + r,
                None,
            )
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(run(q, c, jnp.int32(0)))  # compile + warm
    t0 = time.time()
    float(run(q, c, jnp.int32(1)))
    dt = (time.time() - t0) / iters
    return {
        "retrieval_queries_per_s": B / dt,
        "retrieval_ms_per_batch": dt * 1e3,
        "retrieval_method": method,
        "retrieval_config": {"B": B, "N": N, "E": E, "K": K},
    }


def bench_quantized(iters: int, B: int, N: int, E: int, K: int,
                    oversample: int = 2,
                    scale_mode: str = "per_row",
                    L: int = None, q_block: int = None,
                    fold: int = None, rounds: int = 1):
    """Quantized-index retrieval (int8 catalog stream + fp32 rescore of
    the oversampled survivors — the indices/quantized.py production
    path, measured at the kernel level). ``scale_mode="global"`` runs
    the one-shared-scale variant whose kernel drops the per-column
    dequantization FMA (pallas_quantized_topk_global)."""
    from hm_retrieval_tpu.ops.pallas_retrieval import (
        pallas_quantized_topk,
        pallas_quantized_topk_global,
    )
    from hm_retrieval_tpu.ops.topk import topk_pair

    c = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(1), (N, E), jnp.float32
        )
    )()

    @jax.jit
    def quantize(c):
        scales = jnp.max(jnp.abs(c), axis=1) / 127.0
        scales = jnp.where(scales > 0, scales, 1.0)
        codes = jnp.clip(
            jnp.rint(c / scales[:, None]), -127, 127
        ).astype(jnp.int8)
        return codes, scales.astype(jnp.float32)

    @jax.jit
    def quantize_global(c):
        g = jnp.max(jnp.abs(c)) / 127.0
        codes = jnp.clip(jnp.rint(c / g), -127, 127).astype(
            jnp.int8
        )
        return codes, g.astype(jnp.float32)

    if scale_mode == "global":
        codes, scales = quantize_global(c)
    else:
        codes, scales = quantize(c)
    q = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (B, E), jnp.float32
        )
    )()
    jax.block_until_ready((codes, scales, q))
    k_over = oversample * K

    @jax.jit
    def run(q, c, codes, scales, salt):
        def body(carry, i):
            qq = jnp.roll(q, i + salt, axis=0)
            if scale_mode == "global":
                v, idx, r = pallas_quantized_topk_global(
                    qq, codes, scales, k_over
                )
            else:
                v, idx, r = pallas_quantized_topk(
                    qq, codes, scales, k_over, max_rounds=rounds,
                    L=L, q_block=q_block, fold=fold,
                )
            rows = jnp.take(c, idx, axis=0)
            exact = jnp.einsum(
                "be,bke->bk",
                qq,
                rows,
                preferred_element_type=jnp.float32,
            )
            exact = jnp.where(jnp.isneginf(v), -jnp.inf, exact)
            # payload sort for k>256 (ops/topk.py): the product path's
            # round-5 rescore selection — top_k + take_along_axis here
            # re-adds the gather bound the rewrite removed (measured
            # +9.6ms at k=1000/N=1M)
            ts, ti = topk_pair(exact, idx, K)
            return (
                carry
                + jnp.sum(ts)
                + jnp.sum(ti).astype(jnp.float32)
                + r,
                None,
            )
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(run(q, c, codes, scales, jnp.int32(0)))  # compile + warm
    t0 = time.time()
    float(run(q, c, codes, scales, jnp.int32(1)))
    dt = (time.time() - t0) / iters
    return {
        "queries_per_s": B / dt,
        "ms_per_batch": dt * 1e3,
        "config": {
            "B": B, "N": N, "E": E, "K": K,
            "oversample": oversample, "rescore": True,
            "scale_mode": scale_mode, "rounds": rounds,
        },
    }


def bench_index_build(
    N: int,
    E: int = 128,
    batch: int = 10_000,
    e2e: bool = True,
    distributed: bool = False,
):
    """Per-epoch index (re)build throughput (verdict r4 #5): the
    reference re-embeds the whole catalog and rebuilds its index every
    epoch (ref: pkg/modelling/runner.py:88-93, brute_force.py:31-52),
    so build time is a product number, not a detail. Three phases:

    - ``embed_rows_per_s``: catalog embed through the candidate tower,
      device-only scan (the pure compute term);
    - ``quantize_rows_per_s``: per-row int8 quantization of the (N, E)
      catalog on device;
    - ``e2e_rows_per_s``: the REAL ``QuantizedIndex.build_from_batches``
      wall clock — host batches in, embeddings pulled to host, quantize,
      index constructed. Through the relay tunnel this is dominated by
      the (N*E*4)-byte embedding download; on attached hardware the
      embed term dominates. The phase split makes that attributable.

    ``distributed=True`` adds the streamed sharded build
    (DistributedQuantizedIndex over a model-axis mesh of every local
    device, O(N*E/S) host peak) — the multi-chip placement path.
    """
    import jax.numpy as jnp

    from hm_retrieval_tpu.indices.quantized import QuantizedIndex

    model, _, _ = hm_scale_model(
        n_customers=1000, n_articles=N, emb_dim=E
    )
    params = model.init_params(0)
    n_b = -(-N // batch)

    def dev_batch(i, salt):
        ids = (
            jnp.arange(batch, dtype=jnp.int32) + i * batch + salt
        ) % N + 1
        return {
            "article_id": ids,
            "product_type_name": ids % 130 + 1,
            "colour_group_name": ids % 50 + 1,
        }

    @jax.jit
    def embed_scan(params, salt):
        def body(carry, i):
            e = model.candidate_forward(params, dev_batch(i, salt))
            return carry + jnp.sum(e.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n_b))
        return acc

    # median of 3 timed dispatches on distinct salts (CLAUDE.md timing
    # rules: a single dispatch+fetch carries ~25ms of relay roundtrip)
    float(embed_scan(params, jnp.int32(0)))  # compile + warm
    embed_dts = []
    for salt in (1, 2, 3):
        t0 = time.time()
        float(embed_scan(params, jnp.int32(salt)))
        embed_dts.append(time.time() - t0)
    embed_dt = float(np.median(embed_dts))

    c = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(2), (N, E), jnp.float32
        )
    )()

    # the quantize kernel is only ~1-3ms of device time at N=1M: loop
    # it R times ON DEVICE so the dispatch roundtrip amortizes
    QR = 20

    @jax.jit
    def quant(c, salt):
        def body(carry, i):
            # scalar multiply (fuses into both consumers) defeats
            # loop-invariant hoisting without a roll's full-copy cost
            cc = c * (1.0 + (i + salt).astype(jnp.float32) * 1e-6)
            scales = jnp.max(jnp.abs(cc), axis=1) / 127.0
            scales = jnp.where(scales > 0, scales, 1.0)
            codes = jnp.clip(
                jnp.rint(cc / scales[:, None]), -127, 127
            ).astype(jnp.int8)
            return (
                carry
                + jnp.sum(codes.astype(jnp.int32)).astype(
                    jnp.float32
                )
                + jnp.sum(scales),
                None,
            )

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(QR))
        return acc

    float(quant(c, jnp.int32(0)))
    quant_dts = []
    for salt in (1, 2, 3):
        t0 = time.time()
        float(quant(c, jnp.int32(salt)))
        quant_dts.append((time.time() - t0) / QR)
    quant_dt = float(np.median(quant_dts))

    out = {
        "config": {"N": N, "E": E, "batch": batch},
        "embed_rows_per_s": N / embed_dt,
        "embed_s": embed_dt,
        "quantize_rows_per_s": N / quant_dt,
        "quantize_s": quant_dt,
    }

    def host_batches():
        for i in range(n_b):
            lo, hi = i * batch, min(N, (i + 1) * batch)
            ids = np.arange(lo, hi, dtype=np.int32) % N + 1
            yield {
                "article_id": ids,
                "product_type_name": (ids % 130 + 1).astype(
                    np.int32
                ),
                "colour_group_name": (ids % 50 + 1).astype(np.int32),
            }

    cand_fn = jax.jit(model.candidate_forward)

    def embed_fn(b):
        return cand_fn(
            params, {k: jnp.asarray(v) for k, v in b.items()}
        )

    if e2e:
        t0 = time.time()
        QuantizedIndex.build_from_batches(
            100,
            "article_id",
            embed_fn,
            host_batches(),
            batch,
            rescore=False,
        )
        e2e_dt = time.time() - t0
        out["e2e_rows_per_s"] = N / e2e_dt
        out["e2e_s"] = e2e_dt
        # device=True build: embeddings never leave the device (the
        # runner's per-epoch rebuild path since round 5) — same real
        # host batches in, no (N,E) download/upload
        t0 = time.time()
        idx = QuantizedIndex.build_from_batches(
            100,
            "article_id",
            embed_fn,
            host_batches(),
            batch,
            rescore=False,
            device=True,
        )
        # value-fetch sync DERIVED from the quantized output —
        # identifiers is an independent host upload and block_until_
        # ready alone can return early through the relay (CLAUDE.md)
        int(np.asarray(idx.codes[0, :8]).sum())
        dev_dt = time.time() - t0
        out["device_e2e_rows_per_s"] = N / dev_dt
        out["device_e2e_s"] = dev_dt

    if distributed:
        from hm_retrieval_tpu.indices.distributed import (
            DistributedQuantizedIndex,
        )
        from hm_retrieval_tpu.parallel import make_mesh

        mesh = make_mesh(data=1, model=len(jax.devices()))
        t0 = time.time()
        DistributedQuantizedIndex.build_from_batches(
            100,
            "article_id",
            embed_fn,
            host_batches(),
            batch,
            mesh=mesh,
            num_candidates=N,
            dim=E,
            rescore=False,
            method=(
                "pallas"
                if jax.default_backend() == "tpu"
                else "scan"
            ),
        )
        sh_dt = time.time() - t0
        out["sharded_rows_per_s"] = N / sh_dt
        out["sharded_s"] = sh_dt
        out["sharded_devices"] = len(jax.devices())
    return out


def bench_training_distributed(
    steps: int,
    batch_per_chip: int,
    n_customers: int = 1_371_980,
    n_articles: int = 105_542,
    emb_dim: int = 128,
    repeats: int = 3,
):
    """DP sparse-Adagrad training over EVERY local device (mesh data
    axis; global batch = batch_per_chip * n_devices). On one chip this
    reduces to the single-chip path (mesh overhead included); on a
    slice the SAME command measures scaling efficiency — the
    BASELINE.md blocked-table claim that multi-chip needs no code
    changes, kept true by running this mode every round."""
    from hm_retrieval_tpu.data.device_feed import (
        chunk_sharding,
        make_chunked_train_step,
    )
    from hm_retrieval_tpu.models import OptimizerFactory
    from hm_retrieval_tpu.models.sparse_optimizer import (
        create_sparse_train_state,
    )
    from hm_retrieval_tpu.parallel import (
        make_dp_sparse_train_step,
        make_mesh,
        replicate_sparse_state,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh()
    B = batch_per_chip * n_dev
    model, n_customers, n_articles = hm_scale_model(
        n_customers, n_articles, emb_dim
    )
    opt = OptimizerFactory.get_optimizer(
        "adagrad", {"learning_rate": 0.05}
    )
    state = replicate_sparse_state(
        create_sparse_train_state(model, opt, 0), mesh
    )
    step = make_dp_sparse_train_step(model, opt, 0.05, mesh)
    # the chunked step IS a scan over the dp step — reuse it as the
    # on-device timing loop (stacked batches sharded P(None, "data"))
    chunk_fn = make_chunked_train_step(step)
    sharding = chunk_sharding(mesh)

    def batches_for(key):
        kc, ka, kp, kcol = jax.random.split(key, 4)
        shp = (steps, B)
        return {
            "customer_id": jax.random.randint(
                kc, shp, 0, n_customers + 1, dtype=jnp.int32
            ),
            "article_id": jax.random.randint(
                ka, shp, 0, n_articles + 1, dtype=jnp.int32
            ),
            "product_type_name": jax.random.randint(
                kp, shp, 0, 131, dtype=jnp.int32
            ),
            "colour_group_name": jax.random.randint(
                kcol, shp, 0, 51, dtype=jnp.int32
            ),
        }

    gen = jax.jit(batches_for, out_shardings=sharding)
    datas = [
        gen(jax.random.PRNGKey(i)) for i in range(repeats + 1)
    ]
    float(jax.tree_util.tree_leaves(datas[-1])[0][0, 0])
    state, m = chunk_fn(state, datas[0])
    float(m["loss"])  # compile + warm
    dts = []
    for data in datas[1:]:
        t0 = time.time()
        state, m = chunk_fn(state, data)
        float(m["loss"])
        dts.append(time.time() - t0)
    dt = float(np.median(dts))
    total = steps * B / dt
    return {
        "dist_train_devices": n_dev,
        "dist_train_global_batch": B,
        "dist_train_examples_per_s": total,
        "dist_train_examples_per_s_per_chip": total / n_dev,
        "dist_train_step_ms": dt / steps * 1e3,
    }


def bench_retrieval_distributed(
    iters: int, B: int, N: int, E: int, K: int
):
    """Distributed int8 quantized retrieval: catalog row-sharded over
    the model axis (every local device), per-shard fused survivor
    selection + fp32 rescore + all-gather merge. The catalog is
    synthesized DIRECTLY INTO its sharded placement on device. One chip
    = model axis of 1 (collective overhead included); a slice measures
    scaling with the same command."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hm_retrieval_tpu.parallel import make_mesh
    from hm_retrieval_tpu.parallel.distributed_topk import (
        make_distributed_quantized_topk,
    )
    from hm_retrieval_tpu.parallel.mesh import MODEL_AXIS

    n_dev = len(jax.devices())
    mesh = make_mesh(data=1, model=n_dev)
    per = -(-N // n_dev)
    total = per * n_dev
    row = NamedSharding(mesh, P(MODEL_AXIS, None))
    vec = NamedSharding(mesh, P(MODEL_AXIS))

    def make_catalog(key):
        c = jax.random.normal(key, (total, E), jnp.float32)
        scales = jnp.max(jnp.abs(c), axis=1) / 127.0
        scales = jnp.where(scales > 0, scales, 1.0)
        codes = jnp.clip(
            jnp.rint(c / scales[:, None]), -127, 127
        ).astype(jnp.int8)
        valid = jnp.arange(total) < N
        bias = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
        ids = jnp.arange(total, dtype=jnp.int32)
        return codes, scales.astype(jnp.float32), c, ids, bias

    codes, scales, emb, ids, bias = jax.jit(
        make_catalog, out_shardings=(row, vec, row, vec, vec)
    )(jax.random.PRNGKey(1))
    q = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (B, E), jnp.float32
        )
    )()
    jax.block_until_ready((codes, q))
    fn = make_distributed_quantized_topk(
        mesh,
        K,
        oversample=2,
        # fused per-shard kernel on real chips (the measured path);
        # scan keeps the stage runnable on CPU smoke tests
        method=(
            "pallas" if jax.default_backend() == "tpu" else "scan"
        ),
    )

    @jax.jit
    def run(q, codes, scales, emb, ids, bias, salt):
        def body(carry, i):
            qq = jnp.roll(q, i + salt, axis=0)
            s, gi = fn(qq, codes, scales, emb, ids, bias)
            return (
                carry
                + jnp.sum(s)
                + jnp.sum(gi).astype(jnp.float32),
                None,
            )
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(run(q, codes, scales, emb, ids, bias, jnp.int32(0)))
    t0 = time.time()
    float(run(q, codes, scales, emb, ids, bias, jnp.int32(1)))
    dt = (time.time() - t0) / iters
    return {
        "dist_retrieval_devices": n_dev,
        "dist_retrieval_queries_per_s": B / dt,
        "dist_retrieval_ms_per_batch": dt * 1e3,
        "dist_retrieval_config": {
            "B": B, "N": N, "E": E, "K": K,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    # 600 on-device steps: at ~0.5ms/step the scan runs ~300ms, an
    # order of magnitude above the relay tunnel's per-dispatch jitter
    # (measure_null_roundtrip reports the floor); at 200 steps a 40ms
    # latency wobble moved the headline 30%+ between rounds.
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument(
        "--repeats",
        type=int,
        default=3,
        help="timed-scan repetitions; headline = median",
    )
    ap.add_argument("--skip-retrieval", action="store_true")
    ap.add_argument(
        "--skip-pipeline",
        action="store_true",
        help="skip the pipeline-fed (shards -> device_feed -> step) "
        "training measurement",
    )
    ap.add_argument(
        "--dense",
        action="store_true",
        help="dense optax step instead of sparse embedding adagrad",
    )
    ap.add_argument(
        "--retrieval-method",
        default="pallas",
        choices=["pallas", "partial_reduce"],
    )
    ap.add_argument(
        "--quantized",
        action="store_true",
        help="also measure the int8 quantized index kernels at the "
        "10M (E=64) catalog point (per-row AND global scale)",
    )
    ap.add_argument(
        "--full",
        action="store_true",
        help="also measure the reference's k=1000 operating point "
        "(ref main.py:107 serves max(ks)=1000): exact pallas at "
        "N=131k and quantized at N=1M",
    )
    ap.add_argument(
        "--seq",
        action="store_true",
        help="also measure the sequence-aware query tower (BASELINE "
        "config[3]: last-16 purchase history, mean + attention "
        "pooling) training step",
    )
    ap.add_argument(
        "--bsweep",
        action="store_true",
        help="also sweep the training batch size (512/2048/8192) at "
        "the selected scale — the single-chip saturation curve "
        "multi-chip DP projections stand on",
    )
    ap.add_argument(
        "--distributed",
        action="store_true",
        help="also run the mesh-distributed stages over every local "
        "device (DP training + row-sharded quantized retrieval); on "
        "one chip this measures collective overhead, on a slice the "
        "same command measures scaling efficiency",
    )
    ap.add_argument(
        "--scale",
        default="hm",
        choices=["hm", "synthetic10m"],
        help="hm = reference H&M scale; synthetic10m = BASELINE "
        "config[2] single-chip slice (10M items, 10M users, E=64)",
    )
    args = ap.parse_args()

    if args.scale == "synthetic10m":
        # Single-chip slice of BASELINE config[2]: training tables sized
        # so the scan's double-buffered {params, adagrad acc} carry fits
        # 16GB HBM (the full 10M-item/50M-user config is the multi-host
        # row-sharded path, parallel/sharded_training.py); retrieval runs
        # the full 10M-item catalog.
        sizes = dict(
            n_customers=5_000_000, n_articles=2_000_000, emb_dim=64
        )
        retrieval_cfg = (8, 1024, 10_000_000, 64, 100)
    else:
        sizes = {}
        # 100 on-device iters amortize the fixed tunnel sync (same
        # reasoning as --steps; at 20 iters the 5ms batches read ~40%
        # slower than their true device time)
        retrieval_cfg = (100, 1024, 131072, 128, 100)

    details = {
        "device": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "scale": args.scale,
        "null_roundtrip_ms": measure_null_roundtrip() * 1e3,
    }
    details.update(
        bench_training(
            args.steps,
            args.batch,
            sparse=not args.dense,
            repeats=args.repeats,
            **sizes,
        )
    )
    if not args.skip_pipeline and args.scale == "hm":
        details.update(
            bench_pipeline_training(200, args.batch)
        )
        # chunked dispatch (TrainingConfig.steps_per_dispatch): 64
        # steps per round trip measured best through the relay (16:
        # 634k ex/s, 64: 899k — overhead/dispatch grows with the
        # stacked transfer, diminishing returns past ~64)
        details.update(
            bench_pipeline_training(
                256, args.batch, steps_per_dispatch=64
            )
        )
    if not args.skip_retrieval:
        details.update(
            bench_retrieval(
                *retrieval_cfg, method=args.retrieval_method
            )
        )
    if not args.skip_retrieval:
        # the ANN-family headline ships in the default run (the 10M
        # point stays behind --quantized: ~3GB of on-device catalog)
        details["quantized_1m"] = bench_quantized(
            50, 1024, 1_048_576, 128, 100
        )
        details["quantized_1m_global"] = bench_quantized(
            50, 1024, 1_048_576, 128, 100, scale_mode="global"
        )
    if not args.skip_retrieval and args.scale == "hm":
        # the reference's own operating point (k = max(ks) = 1000,
        # ref main.py:107) ships in the DEFAULT run so the driver
        # captures it every round (verdict r4 #9)
        details["retrieval_k1000"] = bench_retrieval(
            20, 1024, 131072, 128, 1000, method="pallas"
        )
        # tuned k=1000 config (2026-08-21 sweep): oversample=1 with
        # L=2048 matches os=2's 0.969 recall at 2/3 the cost — at
        # k'~L the single pass's per-bin top-2 is the recall bound,
        # not the survivor count, so extra oversample buys nothing
        details["quantized_1m_k1000"] = bench_quantized(
            20, 1024, 1_048_576, 128, 1000,
            oversample=1, L=2048, q_block=128, fold=1,
        )
        # 2-round refinement: the cheap recall lever after the round-5
        # merge fix (0.968 -> 0.990 recall, BASELINE.md k=1000 table)
        details["quantized_1m_k1000_r2"] = bench_quantized(
            20, 1024, 1_048_576, 128, 1000,
            oversample=1, L=2048, q_block=128, fold=1, rounds=2,
        )
    if args.scale == "hm":
        # per-epoch index rebuild throughput (verdict r4 #5): embed +
        # quantize on device, plus the real build_from_batches wall
        # clock (host edge included; through the relay it is
        # download-dominated — the phase split attributes it)
        details["index_build_1m"] = bench_index_build(
            1_048_576, 128, distributed=args.distributed
        )
    if args.seq and args.scale != "hm":
        ap.error("--seq measures the H&M-scale tower; use --scale hm")
    if args.seq:
        for pooling in ("mean", "attention"):
            r = bench_training(
                args.steps,
                args.batch,
                repeats=args.repeats,
                history_len=16,
                history_pooling=pooling,
            )
            details[f"seq_train_{pooling}"] = {
                "examples_per_s": r[
                    "train_examples_per_s_per_chip"
                ],
                "step_ms": r["train_step_ms"],
                "spread": r["train_examples_per_s_spread"],
            }
    if args.bsweep:
        details["bsweep"] = {}
        for b in BSWEEP_BATCHES:
            r = bench_training(
                args.steps, b, repeats=args.repeats, **sizes
            )
            details["bsweep"][str(b)] = {
                "examples_per_s": r["train_examples_per_s_per_chip"],
                "step_ms": r["train_step_ms"],
                "spread": r["train_examples_per_s_spread"],
            }
    if args.distributed:
        details.update(
            bench_training_distributed(
                args.steps, args.batch, repeats=args.repeats
            )
        )
        details.update(
            bench_retrieval_distributed(
                20, 1024, 1_048_576, 128, 100
            )
        )
    if args.quantized:
        details["quantized_10m"] = bench_quantized(
            20, 1024, 10_000_000, 64, 100
        )
        details["quantized_10m_global"] = bench_quantized(
            20, 1024, 10_000_000, 64, 100, scale_mode="global"
        )
    if args.full:
        # config[2]-scale rebuild: 10M items, E=64 (e2e pulls the
        # 2.5GB fp32 catalog through the tunnel — minutes; the
        # device-only phases are the hardware numbers)
        details["index_build_10m"] = bench_index_build(
            10_000_000, 64, e2e=False
        )

    with open("bench_results.json", "w") as f:
        json.dump(details, f, indent=2)

    value = details["train_examples_per_s_per_chip"]
    # one line, both headline metrics: training throughput is the
    # primary (metric/value/unit/vs_baseline schema); retrieval rides
    # along as extra keys so BENCH_r{N}.json captures it too
    line = {
        "metric": "train_examples_per_s_per_chip",
        "value": round(value, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(
            value / TF_CPU_BASELINE_EXAMPLES_PER_S, 3
        ),
        "spread": [
            round(v, 1)
            for v in details["train_examples_per_s_spread"]
        ],
    }
    for pk in (
        "train_pipeline_examples_per_s",
        "train_pipeline_chunked_examples_per_s",
    ):
        if pk in details:
            line[pk] = round(details[pk], 1)
    if "retrieval_queries_per_s" in details:
        line["retrieval_queries_per_s"] = round(
            details["retrieval_queries_per_s"], 1
        )
        line["retrieval_ms_per_batch"] = round(
            details["retrieval_ms_per_batch"], 3
        )
    for k in (
        "quantized_1m",
        "quantized_1m_global",
        "quantized_10m",
        "quantized_10m_global",
        "retrieval_k1000",
        "quantized_1m_k1000",
        "quantized_1m_k1000_r2",
    ):
        if k in details:
            line[f"{k}_queries_per_s"] = round(
                details[k].get(
                    "queries_per_s",
                    details[k].get("retrieval_queries_per_s", 0),
                ),
                1,
            )
    if "index_build_1m" in details:
        ib = details["index_build_1m"]
        line["index_build_1m_embed_rows_per_s"] = round(
            ib["embed_rows_per_s"], 1
        )
        if "e2e_rows_per_s" in ib:
            line["index_build_1m_e2e_rows_per_s"] = round(
                ib["e2e_rows_per_s"], 1
            )
        if "device_e2e_rows_per_s" in ib:
            line["index_build_1m_device_e2e_rows_per_s"] = round(
                ib["device_e2e_rows_per_s"], 1
            )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
