from hm_retrieval_tpu.data.runner import shard_writer_runner
from hm_retrieval_tpu.etl.runner import build_schema_runner, etl_runner
from hm_retrieval_tpu.runners.baseline import baseline_modelling_runner
from hm_retrieval_tpu.runners.checkpoint import (
    CheckpointManager,
    export_model,
)
from hm_retrieval_tpu.runners.modelling import (
    build_index,
    evaluate,
    evaluation_runner,
    modelling_runner,
)

__all__ = [
    "evaluation_runner",
    "etl_runner",
    "build_schema_runner",
    "shard_writer_runner",
    "modelling_runner",
    "baseline_modelling_runner",
    "build_index",
    "evaluate",
    "CheckpointManager",
    "export_model",
]
