from hm_retrieval_tpu.models.embedding import (
    apply_embeddings,
    embedding_output_dim,
    init_embedding_params,
)
from hm_retrieval_tpu.models.logq_correction import apply_logq_correction
from hm_retrieval_tpu.models.optimizer_factory import OptimizerFactory
from hm_retrieval_tpu.models.tower import init_tower_params, tower_forward
from hm_retrieval_tpu.models.two_tower import (
    TrainState,
    TwoTowerModel,
    create_train_state,
    make_train_step,
)

__all__ = [
    "apply_embeddings",
    "embedding_output_dim",
    "init_embedding_params",
    "apply_logq_correction",
    "OptimizerFactory",
    "init_tower_params",
    "tower_forward",
    "TrainState",
    "TwoTowerModel",
    "create_train_state",
    "make_train_step",
]
