from hm_retrieval_tpu.schema.features import (
    Feature,
    FeatureFamily,
    FeatureKind,
)
from hm_retrieval_tpu.schema.model_config import ModelConfig
from hm_retrieval_tpu.schema.schema import Schema
from hm_retrieval_tpu.schema.training_config import TrainingConfig

__all__ = [
    "Feature",
    "FeatureFamily",
    "FeatureKind",
    "ModelConfig",
    "Schema",
    "TrainingConfig",
]
