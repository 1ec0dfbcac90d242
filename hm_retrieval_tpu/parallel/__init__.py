from hm_retrieval_tpu.parallel.data_parallel import (
    make_dp_train_step,
    replicate_state,
)
from hm_retrieval_tpu.parallel.distributed_topk import (
    make_distributed_topk,
    shard_candidates,
)
from hm_retrieval_tpu.parallel.global_negatives import (
    make_global_negatives_loss,
)
from hm_retrieval_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
    row_sharded,
    shard_batch,
)
from hm_retrieval_tpu.parallel.sharded_embedding import (
    make_sharded_lookup,
    shard_table,
)
from hm_retrieval_tpu.parallel.sparse_data_parallel import (
    make_dp_sparse_train_step,
    replicate_sparse_state,
)
from hm_retrieval_tpu.parallel.sharded_training import (
    create_sharded_train_state,
    make_sharded_train_step,
    param_shardings,
)
from hm_retrieval_tpu.parallel.sharded_sparse_training import (
    create_sharded_sparse_state,
    make_sharded_sparse_train_step,
    sharded_sparse_specs,
    unpad_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "initialize_multihost",
    "batch_sharding",
    "replicated",
    "row_sharded",
    "shard_batch",
    "make_dp_train_step",
    "replicate_state",
    "make_dp_sparse_train_step",
    "replicate_sparse_state",
    "make_global_negatives_loss",
    "make_sharded_lookup",
    "shard_table",
    "create_sharded_train_state",
    "make_sharded_train_step",
    "param_shardings",
    "make_distributed_topk",
    "shard_candidates",
    "create_sharded_sparse_state",
    "make_sharded_sparse_train_step",
    "sharded_sparse_specs",
    "unpad_params",
]
