"""Train + eval orchestration: the main pipeline stage.

Analog of ref: pkg/modelling/runner.py:18-107 with the TPU-native loop:

- schema + shard datasets in, jitted train step over a device mesh
- per-epoch: build brute-force index from the candidate tower, evaluate
  Recall@K at epoch START (reference behavior, ref: runner.py:85-105), then
  train one epoch
- after the FINAL epoch the index is rebuilt and evaluated again — fixing
  the reference quirk where post-training recall was never computed
  (SURVEY §3.2 note on ref: runner.py:107)
- Orbax checkpoint per epoch + npz model/tower export + index artifact
- TensorBoard scalars + a profiler trace window (ref: runner.py:63-69)
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import numpy as np

from hm_retrieval_tpu.data.dataset import ShardDataset
from hm_retrieval_tpu.data.device_feed import device_feed
from hm_retrieval_tpu.indices.brute_force import BruteForceIndex
from hm_retrieval_tpu.metrics.index_recall import IndexRecall
from hm_retrieval_tpu.models.optimizer_factory import OptimizerFactory
from hm_retrieval_tpu.models.two_tower import (
    TwoTowerModel,
    create_train_state,
    make_train_step,
)
from hm_retrieval_tpu.parallel.mesh import (
    replicate_pytree,
    shard_batch,
)
from hm_retrieval_tpu.runners.checkpoint import (
    CheckpointManager,
    export_model,
)
from hm_retrieval_tpu.schema.schema import Schema
from hm_retrieval_tpu.utils.profiling import StepProfiler
from hm_retrieval_tpu.utils.settings import Settings
from hm_retrieval_tpu.utils.summary import MetricWriter

logger = logging.getLogger(__name__)


def _pad_batch(batch: Dict[str, np.ndarray], size: int):
    """Pad a tail batch to the static batch size along axis 0 only
    (2-D sequence features keep their width); returns (batch, n)."""
    n = len(next(iter(batch.values())))
    if n == size:
        return batch, n

    def pad(v):
        v = np.asarray(v)
        widths = [(0, size - n)] + [(0, 0)] * (v.ndim - 1)
        return np.pad(v, widths)

    return {k: pad(v) for k, v in batch.items()}, n


def _allgather_reduce(n: int, op) -> int:
    """Reduce a host-local int across every JAX process (lockstep
    batch/step counts for multi-host runs): max for eval batch counts
    (drained hosts feed padding), min for train step counts."""
    if jax.process_count() == 1:
        return int(n)
    from jax.experimental import multihost_utils

    return int(
        op(multihost_utils.process_allgather(np.asarray([n])))
    )


def _allgather_max(n: int) -> int:
    return _allgather_reduce(n, np.max)


def _allgather_min(n: int) -> int:
    return _allgather_reduce(n, np.min)


def _is_coordinator() -> bool:
    """True on the process that writes host-side artifacts (npz
    exports, index files, TensorBoard events) — multiple hosts writing
    the same shared-filesystem paths would race. Orbax checkpoint saves
    are NOT gated: they are collective across processes."""
    return jax.process_index() == 0


def _active_sharded_features(tc, mesh):
    """Feature names to row-shard, or [] when the config asks for none
    or the mesh has no model axis to shard over (warned, not fatal —
    the replicated layout is always correct, just bigger)."""
    feats = list(tc.sharded_embedding_features)
    if not feats:
        return []
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        logger.warning(
            "sharded_embedding_features %s requested but the mesh has "
            "no model axis (> 1); training with replicated tables",
            feats,
        )
        return []
    return feats


def build_index(
    model: TwoTowerModel,
    params,
    candidate_ds: ShardDataset,
    candidate_batch_size: int,
    k: int,
    index_type: str = "brute_force",
    mesh=None,
    distributed: bool = False,
):
    """Embed the full catalog with the candidate tower in fixed-size
    batches (ref: runner.py:88-93 + brute_force.py:31-52).
    ``index_type`` picks the family (ModelConfig.index_type): exact
    brute force or the int8 quantized scan index. ``distributed=True``
    places the catalog row-sharded over ``mesh``'s model axis and serves
    retrieval through the collective top-k merge
    (indices/distributed.py) — the layout for catalogs bigger than one
    chip's HBM."""
    if distributed:
        if mesh is None:
            raise ValueError(
                "distributed index requires a mesh (make_mesh with a "
                "model axis)"
            )
        from hm_retrieval_tpu.indices import DISTRIBUTED_INDEX_TYPES

        index_cls = DISTRIBUTED_INDEX_TYPES[index_type]
        # manifest row count + tower width let the streaming sharded
        # builder run without materializing anything catalog-sized
        extra = {
            "mesh": mesh,
            "num_candidates": candidate_ds.num_rows,
            "dim": model.joint_embedding_size,
        }
    else:
        from hm_retrieval_tpu.indices import INDEX_TYPES

        index_cls = INDEX_TYPES[index_type]
        # catalog families build on device end to end (no host round
        # trip for the (N, E) embeddings — at 1M rows the round trip
        # dwarfs the ~45 ms of chip time, BASELINE.md index-build);
        # families advertise the capability themselves
        extra = (
            {"device": True}
            if getattr(index_cls, "supports_device_build", False)
            else {}
        )
    cand_fn = jax.jit(model.candidate_forward)

    def batches():
        for b in candidate_ds.iter_batches(candidate_batch_size):
            yield b

    return index_cls.build_from_batches(
        k,
        model.candidate_id_col,
        lambda b: cand_fn(params, {k_: jax.numpy.asarray(v) for k_, v in b.items()}),
        batches(),
        candidate_batch_size,
        **extra,
    )


def evaluate(
    model: TwoTowerModel,
    params,
    index: BruteForceIndex,
    test_ds: ShardDataset,
    test_batch_size: int,
    ks,
    epoch: Optional[int] = None,
    writer: Optional[MetricWriter] = None,
    mesh=None,
) -> Dict[int, float]:
    """Streaming Recall@K over the test set (ref: runner.py:95-101).
    Tail batches are padded to keep device shapes static; padded rows are
    masked out of the metric. With a mesh, eval batches are sharded
    P("data") — rows are independent, so GSPMD parallelizes the tower
    forward + scoring + top-k across chips with no collectives beyond the
    final metric reduction.

    Multi-host (SURVEY §2.9/§5.8): each process streams only ITS shard
    subset of ``test_ds`` and contributes ``test_batch_size / P`` rows
    to every global batch; batch counts are all-gathered so every host
    dispatches the same number of lockstep computations (drained hosts
    feed all-padding batches), and per-host tail padding is masked by a
    per-row validity column — the resulting recall is the GLOBAL metric,
    identical on every host."""
    usable_ks = [k for k in ks if k <= index.num_candidates]
    dropped = [k for k in ks if k > index.num_candidates]
    if dropped:
        logger.warning(
            "Dropping ks %s > catalog size %d",
            dropped,
            index.num_candidates,
        )
    metric = IndexRecall(usable_ks)
    query_fn = jax.jit(model.query_forward)
    cid = model.candidate_id_col

    P = jax.process_count()
    if P > 1:
        if mesh is None:
            raise ValueError("multi-host eval requires a mesh")
        from hm_retrieval_tpu.parallel.mesh import (
            data_axis_process_aligned,
        )

        if not data_axis_process_aligned(mesh):
            raise ValueError(
                "multi-host eval needs a mesh whose data-axis chunks "
                "each live on ONE process (hosts feed disjoint shard "
                "subsets); use make_mesh(data=P*k, ...) aligned with "
                "process order"
            )
        if test_batch_size % P:
            raise ValueError(
                f"test_batch_size {test_batch_size} must divide by "
                f"process count {P}"
            )
    local_bs = test_batch_size // P
    n_local = -(-test_ds.local_num_rows // local_bs)
    n_batches = _allgather_max(n_local)

    last_shapes = None
    batches = test_ds.iter_batches(local_bs)
    for _ in range(n_batches):
        batch = next(batches, None)
        if batch is None:
            # this host drained early: feed an all-padding batch so the
            # lockstep global dispatch count matches across hosts
            if last_shapes is None:
                raise RuntimeError(
                    "process has no local eval batches; write more "
                    "shards or use fewer hosts"
                )
            batch, n = (
                {
                    k_: np.zeros(s, d)
                    for k_, (s, d) in last_shapes.items()
                },
                0,
            )
        else:
            batch, n = _pad_batch(batch, local_bs)
            last_shapes = {
                k_: (np.asarray(v).shape, np.asarray(v).dtype)
                for k_, v in batch.items()
            }
        mask = np.arange(local_bs) < n
        if mesh is not None:
            sharded = shard_batch(
                {
                    "__valid__": mask,
                    **{
                        k_: np.asarray(v) for k_, v in batch.items()
                    },
                },
                mesh,
            )
            gmask = sharded.pop("__valid__")
            jbatch = sharded
        else:
            gmask = jax.numpy.asarray(mask)
            jbatch = {
                k_: jax.numpy.asarray(v)
                for k_, v in batch.items()
            }
        q = query_fn(params, jbatch)
        _, ids = index.topk_from_embeddings(q)
        metric.update(ids, jbatch[cid], valid_mask=gmask)
    if P == 1 and next(batches, None) is not None:
        # n_batches comes from the manifest-derived local_num_rows; a
        # stale/low count would silently drop eval rows and skew recall
        raise RuntimeError(
            "eval dataset yielded more batches than its manifest row "
            "count implies — the shard manifest is stale; rewrite the "
            "shards (data/shard_writer.py) or fix num_rows"
        )
    return metric.log_metric(epoch, writer)


def evaluation_runner(
    settings: Settings, mesh=None, distributed_index: bool = False
) -> Dict[int, float]:
    """Eval-only stage: restore the latest checkpoint, rebuild the index
    from the candidate tower, evaluate Recall@K, refresh the index
    artifact. No training. (No reference analog — the reference can only
    evaluate inside its train loop.) ``distributed_index`` row-shards the
    catalog over ``mesh``'s model axis (indices/distributed.py)."""
    schema = Schema.load(settings.schema_dirpath)
    tc, mc = schema.training_config, schema.model_config
    # multi-host: each process streams its own test-shard subset; the
    # candidate catalog is read in full everywhere (every host embeds
    # the whole catalog for its replicated/sharded index build)
    test_ds = ShardDataset(
        settings.test_shards_dirpath,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    cand_ds = ShardDataset(settings.candidate_shards_dirpath)

    model = TwoTowerModel.create_from_schema(schema)
    optimizer = OptimizerFactory.get_optimizer(
        tc.optimizer_name, tc.optimizer_kwargs
    )
    use_sparse = (
        tc.use_sparse_embedding_optimizer
        and tc.optimizer_name.lower() == "adagrad"
        and tc.num_uniform_negatives == 0
    )
    sharded_feats = _active_sharded_features(tc, mesh)
    if use_sparse:
        # checkpoints written by any sparse path (single-device, DP, or
        # row-sharded) hold a SparseTrainState; the row-sharded layout
        # additionally pads + shards the big tables, so the restore
        # template must match
        if sharded_feats:
            from hm_retrieval_tpu.parallel.sharded_sparse_training import (  # noqa: E501
                create_sharded_sparse_state,
            )

            state = create_sharded_sparse_state(
                model, optimizer, mesh, sharded_feats, seed=tc.seed
            )
        else:
            from hm_retrieval_tpu.models.sparse_optimizer import (
                create_sparse_train_state,
            )

            state = create_sparse_train_state(
                model, optimizer, seed=tc.seed
            )
    elif sharded_feats:
        from hm_retrieval_tpu.parallel.sharded_training import (
            create_sharded_train_state,
        )

        state = create_sharded_train_state(
            model, optimizer, mesh, sharded_feats, seed=tc.seed
        )
    else:
        state = create_train_state(model, optimizer, tc.seed)
    ckpt = CheckpointManager(settings.checkpoint_dirpath)
    state = ckpt.restore(state)
    ckpt.close()
    if mesh is not None and not sharded_feats:
        # mesh eval of a single-device checkpoint: replicate params so
        # the tower forward runs against mesh-sharded batches
        # (multi-host safe: built from each host's local copy)
        state = replicate_pytree(state, mesh)

    index = build_index(
        model,
        state.params,
        cand_ds,
        tc.candidate_batch_size,
        min(max(mc.ks), cand_ds.num_rows),
        index_type=mc.index_type,
        mesh=mesh,
        distributed=distributed_index,
    )
    res = evaluate(
        model,
        state.params,
        index,
        test_ds,
        tc.test_batch_size,
        mc.ks,
        epoch=None,
        mesh=mesh,
    )
    if getattr(index, "collective_save", False) or _is_coordinator():
        # sharded-built indices save collectively: every process writes
        # its own disjoint shard files (indices/distributed.py)
        index.save(settings.index_dirpath)
    return res


def modelling_runner(
    settings: Settings,
    mesh=None,
    resume: bool = False,
    distributed_index: bool = False,
    training_overrides: Optional[Dict[str, object]] = None,
) -> Dict[str, Dict[int, float]]:
    """Full train+eval stage (ref: modelling_runner,
    pkg/modelling/runner.py:18-107). Returns {"initial": recalls,
    "final": recalls}. ``distributed_index`` serves every eval (and the
    saved artifact) from a catalog row-sharded over ``mesh``'s model
    axis instead of a replicated single-device index.

    ``training_overrides``: TrainingConfig field values that replace
    the ones snapshotted into the schema artifact at schema-build time
    (the reference shares one config snapshot across stages,
    ref: schema.py:57-84 — but a stage-sliced rerun, e.g. training more
    epochs against existing shards, must be able to say so without
    rebuilding the schema). Logged loudly; numerics-affecting fields
    like batch sizes belong in the schema, run-shape knobs (epochs,
    steps_per_dispatch) are the intended use."""
    schema = Schema.load(settings.schema_dirpath)
    tc = schema.training_config
    mc = schema.model_config
    if training_overrides:
        import dataclasses as _dc

        for key, value in training_overrides.items():
            if not hasattr(tc, key):
                raise ValueError(
                    f"unknown TrainingConfig field {key!r}"
                )
            if getattr(tc, key) != value:
                logger.warning(
                    "Overriding schema TrainingConfig.%s: %r -> %r",
                    key,
                    getattr(tc, key),
                    value,
                )
        tc = _dc.replace(tc, **training_overrides)
        schema.training_config = tc
    if distributed_index and mesh is None:
        raise ValueError(
            "distributed_index=True requires a mesh (make_mesh)"
        )

    if settings.savedmodel_dirpath:
        # fail fast BEFORE training: an unexportable schema must not
        # surface as a post-training crash that loses the run's results
        from hm_retrieval_tpu.serving.savedmodel_export import (
            validate_exportable_schema,
        )

        validate_exportable_schema(schema)

    # multi-host: train/test shards are partitioned across processes
    # (each host feeds its 1/P of every global batch); the candidate
    # catalog is read in full on every host
    pi, pc = jax.process_index(), jax.process_count()
    if pc > 1 and mesh is None:
        raise ValueError("multi-host training requires a mesh")
    if pc > 1 and (
        tc.train_batch_size % pc or tc.test_batch_size % pc
    ):
        raise ValueError(
            "train/test batch sizes must divide by the process count"
        )
    if pc > 1:
        from hm_retrieval_tpu.parallel.mesh import (
            data_axis_process_aligned,
        )

        if not data_axis_process_aligned(mesh):
            raise ValueError(
                "multi-host training needs a mesh whose data-axis "
                "chunks each live on ONE process (hosts feed disjoint "
                "shard subsets); use make_mesh(data=P*k, ...) aligned "
                "with process order"
            )
    train_ds = ShardDataset(
        settings.train_shards_dirpath,
        process_index=pi,
        process_count=pc,
    )
    test_ds = ShardDataset(
        settings.test_shards_dirpath,
        process_index=pi,
        process_count=pc,
    )
    cand_ds = ShardDataset(settings.candidate_shards_dirpath)

    model = TwoTowerModel.create_from_schema(schema)
    optimizer = OptimizerFactory.get_optimizer(
        tc.optimizer_name, tc.optimizer_kwargs
    )

    catalog = None
    if tc.num_uniform_negatives > 0:
        from hm_retrieval_tpu.models.mixed_negatives import (
            CandidateCatalog,
        )

        catalog = CandidateCatalog(cand_ds.load_all())

    use_sparse = (
        tc.use_sparse_embedding_optimizer
        and tc.optimizer_name.lower() == "adagrad"
        and tc.num_uniform_negatives == 0
    )
    sharded_feats = _active_sharded_features(tc, mesh)
    if use_sparse:
        from hm_retrieval_tpu.models.sparse_optimizer import (
            create_sparse_train_state,
            make_sparse_train_step,
        )

        if sharded_feats:
            from hm_retrieval_tpu.parallel.sharded_sparse_training import (  # noqa: E501
                create_sharded_sparse_state,
                make_sharded_sparse_train_step,
            )

            logger.info(
                "Using row-sharded sparse Adagrad train step "
                "(sharded tables: %s)",
                sharded_feats,
            )
            state = create_sharded_sparse_state(
                model, optimizer, mesh, sharded_feats, seed=tc.seed
            )
            step_fn = make_sharded_sparse_train_step(
                model,
                optimizer,
                tc.optimizer_kwargs["learning_rate"],
                mesh,
                sharded_feats,
            )
        elif mesh is None:
            logger.info("Using sparse embedding Adagrad train step")
            state = create_sparse_train_state(
                model, optimizer, seed=tc.seed
            )
            step_fn = make_sparse_train_step(
                model,
                optimizer,
                tc.optimizer_kwargs["learning_rate"],
            )
        else:
            from hm_retrieval_tpu.parallel.sparse_data_parallel import (
                make_dp_sparse_train_step,
                replicate_sparse_state,
            )

            logger.info(
                "Using data-parallel sparse embedding Adagrad "
                "train step over the mesh"
            )
            state = replicate_sparse_state(
                create_sparse_train_state(
                    model, optimizer, seed=tc.seed
                ),
                mesh,
            )
            step_fn = make_dp_sparse_train_step(
                model,
                optimizer,
                tc.optimizer_kwargs["learning_rate"],
                mesh,
            )
    elif sharded_feats:
        from hm_retrieval_tpu.parallel.sharded_training import (
            create_sharded_train_state,
            make_sharded_train_step,
        )

        logger.info(
            "Using row-sharded dense train step (sharded tables: %s)",
            sharded_feats,
        )
        state = create_sharded_train_state(
            model, optimizer, mesh, sharded_feats, seed=tc.seed
        )
        step_fn = make_sharded_train_step(
            model,
            optimizer,
            mesh,
            catalog=catalog,
            num_uniform_negatives=tc.num_uniform_negatives,
            base_seed=tc.seed,
        )
    else:
        state = create_train_state(model, optimizer, tc.seed)
        if mesh is not None:
            state = replicate_pytree(state, mesh)
        step_fn = None  # built below

    ckpt = CheckpointManager(settings.checkpoint_dirpath)
    writer = MetricWriter(
        settings.tensorboard_logs_dir if _is_coordinator() else None
    )
    profiler = StepProfiler(
        settings.tensorboard_logs_dir, settings.profile_steps
    )
    try:
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)

        if step_fn is not None:
            pass
        elif mesh is not None:
            from hm_retrieval_tpu.parallel.data_parallel import (
                make_dp_train_step,
            )

            step_fn = make_dp_train_step(
                model,
                optimizer,
                mesh,
                catalog=catalog,
                num_uniform_negatives=tc.num_uniform_negatives,
                base_seed=tc.seed,
            )
        else:
            step_fn = make_train_step(
                model,
                optimizer,
                catalog=catalog,
                num_uniform_negatives=tc.num_uniform_negatives,
                base_seed=tc.seed,
            )
        index_k = max(mc.ks)

        results: Dict[str, Dict[int, float]] = {}
        global_step = int(state.step)
        t_train, examples = 0.0, 0
        for epoch in range(tc.epochs):
            # --- eval at epoch start (ref: runner.py:85-101) ---
            index = build_index(
                model,
                state.params,
                cand_ds,
                tc.candidate_batch_size,
                min(index_k, cand_ds.num_rows),
                index_type=mc.index_type,
                mesh=mesh,
                distributed=distributed_index,
            )
            res = evaluate(
                model,
                state.params,
                index,
                test_ds,
                tc.test_batch_size,
                mc.ks,
                epoch=epoch,
                writer=writer,
                mesh=mesh,
            )
            if epoch == 0:
                results["initial"] = res

            # --- train one epoch (ref: runner.py:103) ---
            # multi-host: each host contributes B/P rows per global
            # batch; the per-epoch step count is the min across hosts so
            # every process dispatches the same lockstep computations
            t0 = time.time()
            local_bs = tc.train_batch_size // pc
            # disjoint seed streams per (epoch, process): epoch*pc+pi
            # never collides across pairs (plain epoch+pi would reuse
            # host 0 epoch 1's shuffle order as host 1 epoch 0's)
            batches = train_ds.iter_batches(
                local_bs,
                shuffle_buffer_size=tc.shuffle_buffer_size,
                seed=tc.seed + epoch * pc + pi,
                drop_remainder=True,
            )
            n_steps = None
            if pc > 1:
                n_steps = _allgather_min(
                    train_ds.local_num_rows // local_bs
                )
                import itertools

                batches = itertools.islice(batches, n_steps)
            spd = tc.steps_per_dispatch
            if spd > 1:
                # chunked dispatch: K steps per device round trip
                # (identical numerics/batch order; the lever for slow
                # dispatch paths — BASELINE.md pipeline-fed section).
                # K-step tails that don't fill a chunk are dropped,
                # matching drop_remainder semantics one level up.
                from hm_retrieval_tpu.data.device_feed import (
                    device_feed_chunked,
                    make_chunked_train_step,
                )

                chunk_fn = make_chunked_train_step(step_fn)
                for dev_chunk in device_feed_chunked(
                    batches, spd, mesh=mesh
                ):
                    state, metrics = chunk_fn(state, dev_chunk)
                    global_step += spd
                    profiler.on_step(global_step)
                    if global_step % 100 < spd:
                        loss = float(metrics["loss"])
                        writer.add_scalar(
                            "train/loss", loss, global_step
                        )
                        logger.info(
                            "step %d | loss %.4f", global_step, loss
                        )
                    examples += tc.train_batch_size * spd
            else:
                for dev_batch in device_feed(batches, mesh=mesh):
                    state, metrics = step_fn(state, dev_batch)
                    global_step += 1
                    profiler.on_step(global_step)
                    if global_step % 100 == 0:
                        loss = float(metrics["loss"])
                        writer.add_scalar(
                            "train/loss", loss, global_step
                        )
                        logger.info(
                            "step %d | loss %.4f", global_step, loss
                        )
                    examples += tc.train_batch_size
            jax.block_until_ready(state.params)
            t_train += time.time() - t0

            ckpt.save(global_step, state)
            export_params = state.params
            if sharded_feats:
                # exports keep the unsharded contract: tables sliced
                # back to their true vocab row counts
                from hm_retrieval_tpu.parallel.sharded_sparse_training import (  # noqa: E501
                    unpad_params,
                )

                export_params = unpad_params(state.params, model)
            if _is_coordinator():
                export_model(
                    export_params, settings.model_dirpath
                )
            # weight histograms per epoch (ref: histogram_freq=1)
            writer.add_params_histograms(export_params, epoch + 1)

        profiler.close()
        if t_train > 0:
            logger.info(
                "Training throughput: %.0f examples/s",
                examples / t_train,
            )

        # --- final eval after training (fixes ref: runner.py:107
        # quirk) ---
        index = build_index(
            model,
            state.params,
            cand_ds,
            tc.candidate_batch_size,
            min(index_k, cand_ds.num_rows),
            index_type=mc.index_type,
            mesh=mesh,
            distributed=distributed_index,
        )
        results["final"] = evaluate(
            model,
            state.params,
            index,
            test_ds,
            tc.test_batch_size,
            mc.ks,
            epoch=tc.epochs,
            writer=writer,
            mesh=mesh,
        )
        if getattr(index, "collective_save", False) or _is_coordinator():
            index.save(settings.index_dirpath)
        if settings.savedmodel_dirpath:
            final_params = state.params
            if sharded_feats:
                from hm_retrieval_tpu.parallel.sharded_sparse_training import (  # noqa: E501
                    unpad_params,
                )

                final_params = unpad_params(state.params, model)
            export_index = index
            if distributed_index:
                # the SavedModel deployment artifact is single-device
                # by contract (TF-Serving); collapse the sharded
                # catalog back to the replicated layout for export.
                # COLLECTIVE for streamed sharded builds (per-shard
                # process_allgather) — must run on every process, only
                # the coordinator writes the SavedModel below
                export_index = index.to_local()
            if _is_coordinator():
                from hm_retrieval_tpu.serving.savedmodel_export import (
                    export_index_savedmodel,
                )

                export_index_savedmodel(
                    schema,
                    final_params["query_tower"],
                    export_index,
                    settings.savedmodel_dirpath,
                )
        return results
    finally:
        # close on every exit path so a mid-run failure (e.g. a late
        # export error) cannot lose buffered metrics or wedge orbax
        profiler.close()
        ckpt.close()
        writer.close()
