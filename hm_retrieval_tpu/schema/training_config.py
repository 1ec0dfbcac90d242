"""Training config (ref: pkg/schema/training_config.py:5-39).

Differences from the reference:
- the logQ candidate->probability mapping is NOT a python dict here; it is a
  dense float32 array indexed by candidate id, owned by the Schema (see
  schema.py), because JAX replaces the reference's StaticHashTable lookup
  (ref: pkg/modelling/layers/logq_correction.py:32-42) with a table gather.
- adds mesh/global-batch knobs that have no reference analog (the reference
  is single-device, SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class TrainingConfig:
    train_batch_size: int = 512
    test_batch_size: int = 2048
    # Batch size used when embedding the full candidate catalog for the
    # index (ref default 10000, training_config.py:36).
    candidate_batch_size: int = 10_000
    shuffle_buffer_size: int = 100_000
    epochs: int = 1
    optimizer_name: str = "adagrad"
    optimizer_kwargs: dict = field(
        default_factory=lambda: {"learning_rate": 0.05}
    )
    # Whether to apply the logQ sampled-softmax correction
    # (ref: README.md:87-99). The prob table itself lives in the Schema.
    use_logq_correction: bool = True
    # Extra uniformly-sampled negatives per step appended to the in-batch
    # candidates (BASELINE config[4] "mixed-negative training"; 0 = off,
    # reference behavior).
    num_uniform_negatives: int = 0
    # Sparse embedding Adagrad: update only the table rows each batch
    # touches (exact dense parity; ~7x step speedup at H&M scale on v5e).
    # Auto-falls-back to the dense step when the optimizer is not adagrad
    # or mixed negatives are on. Under a mesh the data-parallel sparse
    # step (parallel/sparse_data_parallel.py) is used.
    use_sparse_embedding_optimizer: bool = True
    # Train steps executed per device dispatch: K host batches are
    # stacked, transferred once, and run through a lax.scan of K steps
    # (data/device_feed.py::chunk_batches + runners/modelling.py).
    # 1 = one dispatch per step (reference-equivalent). Raise when the
    # host->device dispatch path is slow relative to the step — e.g.
    # remote/proxied accelerators, where per-step dispatch measured 10x
    # the on-device step cost (BASELINE.md pipeline-fed section).
    # Numerics are exactly the per-step loop's FOR THE STEPS THAT RUN
    # (same batches, same order), but each epoch's ragged tail of
    # fewer than K batches is DROPPED like drop_remainder (a warning
    # is logged; an epoch with < K batches trains zero steps) — keep K
    # well below the per-epoch step count.
    steps_per_dispatch: int = 1
    seed: int = 0

    # --- distributed knobs (new; no reference analog) ---
    # Number of mesh data-parallel shards the global batch is split over.
    # train_batch_size is the GLOBAL batch size.
    mesh_data_axis: str = "data"
    # If True, the in-batch softmax denominator spans the global batch via
    # all-gather of candidate embeddings (BASELINE.json north star).
    global_batch_negatives: bool = True
    # Names of embedding-table features to row-shard P("model", None)
    # over the mesh's model axis (big id tables whose table + optimizer
    # state exceed one chip's HBM — BASELINE config[2]). Requires a mesh
    # with model axis > 1; combines with the sparse optimizer
    # (parallel/sharded_sparse_training.py) or the dense step
    # (parallel/sharded_training.py). Empty = fully replicated params.
    sharded_embedding_features: list = field(default_factory=list)

    def __post_init__(self):
        if self.train_batch_size <= 0 or self.test_batch_size <= 0:
            raise ValueError("batch sizes must be positive")
        if self.steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if "learning_rate" not in self.optimizer_kwargs:
            raise ValueError(
                "optimizer_kwargs must include learning_rate "
                "(ref: pkg/modelling/optimizer_factory.py:49-53)"
            )

    def to_dict(self) -> dict:
        return {
            "train_batch_size": self.train_batch_size,
            "test_batch_size": self.test_batch_size,
            "candidate_batch_size": self.candidate_batch_size,
            "shuffle_buffer_size": self.shuffle_buffer_size,
            "epochs": self.epochs,
            "optimizer_name": self.optimizer_name,
            "optimizer_kwargs": dict(self.optimizer_kwargs),
            "use_logq_correction": self.use_logq_correction,
            "num_uniform_negatives": self.num_uniform_negatives,
            "use_sparse_embedding_optimizer": (
                self.use_sparse_embedding_optimizer
            ),
            "steps_per_dispatch": self.steps_per_dispatch,
            "seed": self.seed,
            "mesh_data_axis": self.mesh_data_axis,
            "global_batch_negatives": self.global_batch_negatives,
            "sharded_embedding_features": list(
                self.sharded_embedding_features
            ),
        }

    @classmethod
    def from_dict(cls, payload: dict) -> "TrainingConfig":
        return cls(**payload)
