"""Multi-process jax.distributed bring-up driver (launched by
tests/test_multihost.py, one subprocess per rank; 2- and 4-rank modes).

Each rank joins the process group, builds the global mesh over 8 fake
CPU devices total (8/nprocs per rank), evaluates the checkpointed model
with its OWN test-shard subset (lockstep global batches, per-row
validity masks, global metric), runs multi-host DP train steps AND
cross-host sharded-sparse train steps (model axis spanning processes),
and writes its results as JSON. The parent test asserts every rank
reports the IDENTICAL global recall/losses, equal to the
single-process oracle.

Usage: python multihost_driver.py <rank> <nprocs> <port> <settings.json>
       <outfile>
"""

import json
import os
import sys

rank, nprocs, port = (
    int(sys.argv[1]),
    int(sys.argv[2]),
    int(sys.argv[3]),
)
settings_path, outfile = sys.argv[4], sys.argv[5]

DEV_PER_PROC = 8 // nprocs

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
)
sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)

import jax  # noqa: E402

# the build machine's sitecustomize pins a TPU platform in every python
# process; force CPU before ANY backend use (CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=rank,
)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
print("DRIVER_INIT_OK", flush=True)  # parent's skip-guard sentinel

import numpy as np  # noqa: E402

from hm_retrieval_tpu.data.dataset import ShardDataset  # noqa: E402
from hm_retrieval_tpu.metrics.index_recall import (  # noqa: E402
    IndexRecall,
)
from hm_retrieval_tpu.parallel import make_mesh  # noqa: E402
from hm_retrieval_tpu.runners import (  # noqa: E402
    evaluation_runner,
)
from hm_retrieval_tpu.utils.settings import Settings  # noqa: E402

with open(settings_path) as f:
    cfg = json.load(f)
settings = Settings(**cfg)

mesh = make_mesh()  # ("data"=8,) over both processes' devices
# index artifact is written by the coordinator only (runner gates
# host-side writes to process 0); barrier before anyone reads it back
recalls = evaluation_runner(settings, mesh=mesh)
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("index_artifact_written")

# --- same eval with the catalog ROW-SHARDED over a 2-D data x model
# mesh spanning both processes (distributed index + multi-host
# lockstep eval composed) ---
import dataclasses  # noqa: E402

# data axis MUST partition processes (each rank feeds a disjoint shard
# subset): one data row per rank, model axis over its own devices
mesh_dm = make_mesh(data=nprocs, model=len(jax.devices()) // nprocs)
dist_recalls = evaluation_runner(
    dataclasses.replace(
        settings, index_dirpath=settings.index_dirpath + "_dist"
    ),
    mesh=mesh_dm,
    distributed_index=True,
)
multihost_utils.sync_global_devices("dist_index_written")

# --- streamed sharded build -> replicated local export (the
# SavedModel deployment path, advisor r4 medium): to_local() is
# COLLECTIVE (per-shard process_allgather) and must assemble the
# identical full catalog on every rank even though no rank holds a
# host copy ---
from hm_retrieval_tpu.indices.distributed import (  # noqa: E402
    DistributedBruteForceIndex,
)

dist_index = DistributedBruteForceIndex.load(
    settings.index_dirpath + "_dist", mesh=mesh_dm
)
assert dist_index._host_embeddings is None  # streamed sharded layout
local_index = dist_index.to_local()
local_export_digest = float(
    np.float64(
        np.asarray(local_index.embeddings, np.float64).sum()
    )
    + np.float64(
        np.asarray(local_index.identifiers, np.float64).sum()
    )
)

# --- per-host-independent eval path: each rank streams its shard
# subset against the saved index with NO mesh, then IndexRecall
# cross_process sums {hits, seen} over the group ---
from hm_retrieval_tpu.indices import load_index  # noqa: E402
from hm_retrieval_tpu.schema.schema import Schema  # noqa: E402
from hm_retrieval_tpu.models.two_tower import (  # noqa: E402
    TwoTowerModel,
)
from hm_retrieval_tpu.utils.pytree_io import (  # noqa: E402
    load_pytree_npz,
)

schema = Schema.load(settings.schema_dirpath)
model = TwoTowerModel.create_from_schema(schema)
params = load_pytree_npz(
    f"{settings.model_dirpath}/two_tower/params.npz"
)
index = load_index(settings.index_dirpath)
test_ds = ShardDataset(
    settings.test_shards_dirpath,
    process_index=rank,
    process_count=nprocs,
)
metric = IndexRecall(
    [k for k in schema.model_config.ks if k <= index.num_candidates],
    cross_process=True,
)
qf = jax.jit(model.query_forward)
for batch in test_ds.iter_batches(64):
    jb = {k: jax.numpy.asarray(np.asarray(v)) for k, v in batch.items()}
    _, ids = index.topk_from_embeddings(qf(params, jb))
    metric.update(ids, jb[schema.candidate_id_col])
local_recalls = metric.results()

# --- a couple of multi-host DP train steps (global batches assembled
# from per-host rows, gradient psum over the group) ---
from hm_retrieval_tpu.data.device_feed import device_feed  # noqa: E402
from hm_retrieval_tpu.models import (  # noqa: E402
    OptimizerFactory,
    create_train_state,
)
from hm_retrieval_tpu.parallel import (  # noqa: E402
    make_dp_train_step,
    replicate_state,
)

tc = schema.training_config
opt = OptimizerFactory.get_optimizer(
    tc.optimizer_name, tc.optimizer_kwargs
)
state = replicate_state(
    create_train_state(model, opt, seed=0), mesh
)
step = make_dp_train_step(model, opt, mesh)
train_ds = ShardDataset(
    settings.train_shards_dirpath,
    process_index=rank,
    process_count=nprocs,
)
import itertools

batches = itertools.islice(
    train_ds.iter_batches(32, drop_remainder=True), 3
)
losses = []
for dev_batch in device_feed(batches, mesh=mesh):
    state, m = step(state, dev_batch)
    losses.append(float(m["loss"]))

# --- chunked dispatch across the REAL process group: stacked
# (K, B_local) super-batches assembled per process via
# make_array_from_process_local_data with P(None, "data") ---
from hm_retrieval_tpu.data.device_feed import (  # noqa: E402
    device_feed_chunked,
    make_chunked_train_step,
)

chunk_fn = make_chunked_train_step(step)
ck_batches = itertools.islice(
    train_ds.iter_batches(32, drop_remainder=True), 4
)
chunked_losses = []
for chunk in device_feed_chunked(ck_batches, 2, mesh=mesh):
    state, ck_m = chunk_fn(state, chunk)
    chunked_losses.extend(
        float(x) for x in list(ck_m["losses"])
    )

# --- cross-host sharded-sparse training: a data x model mesh whose
# MODEL axis SPANS processes (row-sharded tables + Adagrad accumulators
# live across hosts; the lookup psum and update all_gather ride the
# cross-process interconnect). Data groups are pairs of processes; both
# members of a group feed the SAME rows (replicated within the group,
# disjoint across groups), so the model axis can span them. ---
from jax.sharding import Mesh  # noqa: E402

from hm_retrieval_tpu.parallel import (  # noqa: E402
    create_sharded_sparse_state,
    make_sharded_sparse_train_step,
)
from hm_retrieval_tpu.models.sparse_optimizer import (  # noqa: E402
    create_sparse_train_state,
)

n_groups = max(1, nprocs // 2)
dev_by_proc = np.asarray(jax.devices(), dtype=object).reshape(
    nprocs, DEV_PER_PROC
)
arr = np.stack(
    [
        np.concatenate(
            [dev_by_proc[p] for p in range(2 * g, 2 * g + 2)]
        )
        if nprocs >= 2
        else dev_by_proc.reshape(-1)
        for g in range(n_groups)
    ]
)  # (n_groups, 8 / n_groups): each model row spans 2 processes
mesh_tp = Mesh(arr, ("data", "model"))
for row in arr:
    assert len({d.process_index for d in row}) >= min(2, nprocs)
data_group = min(rank // 2, n_groups - 1)

tp_feats = ["customer_id", "article_id"]
tc2 = schema.training_config
lr = tc2.optimizer_kwargs.get("learning_rate", 0.05)
sp_state = create_sharded_sparse_state(
    model, opt, mesh_tp, tp_feats, seed=0
)
sp_step = make_sharded_sparse_train_step(
    model, opt, lr, mesh_tp, tp_feats
)
tp_ds = ShardDataset(
    settings.train_shards_dirpath,
    process_index=data_group,
    process_count=n_groups,
)
tp_batches = itertools.islice(
    tp_ds.iter_batches(16, drop_remainder=True), 3
)
tp_losses = []
for dev_batch in device_feed(tp_batches, mesh=mesh_tp):
    sp_state, m = sp_step(sp_state, dev_batch)
    tp_losses.append(float(m["loss"]))
# updated sharded tables must be identical across the whole group:
# hash the unpadded params on every rank and compare in the parent
from hm_retrieval_tpu.parallel import unpad_params  # noqa: E402

rep = jax.device_get(
    jax.jit(
        lambda p: jax.tree.map(lambda x: x, p),
        out_shardings=jax.sharding.NamedSharding(
            mesh_tp, jax.sharding.PartitionSpec()
        ),
    )(sp_state.params)
)
sp_params = unpad_params(rep, model)
param_digest = float(
    sum(
        np.float64(np.asarray(leaf, np.float64).sum())
        for leaf in jax.tree.leaves(sp_params)
    )
)

with open(outfile, "w") as f:
    json.dump(
        {
            "rank": rank,
            "recalls": {str(k): v for k, v in recalls.items()},
            "dist_recalls": {
                str(k): v for k, v in dist_recalls.items()
            },
            "local_recalls": {
                str(k): v for k, v in local_recalls.items()
            },
            "train_losses": losses,
            "chunked_losses": chunked_losses,
            "tp_losses": tp_losses,
            "tp_param_digest": param_digest,
            "local_export_digest": local_export_digest,
            "tp_mesh": [int(x) for x in arr.shape],
            "local_test_rows": test_ds.local_num_rows,
        },
        f,
    )
print(f"rank {rank} OK", flush=True)
