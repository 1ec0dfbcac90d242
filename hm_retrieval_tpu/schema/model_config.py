"""Model architecture config (ref: pkg/schema/model_config.py:5-26)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ModelConfig:
    """Two-tower architecture knobs.

    - ``joint_embedding_size``: output dim of both towers; scores are the
      dot product in this space (ref: model_config.py:5-26).
    - ``ks``: Recall@K cut-offs to evaluate (ref default [10, 100, 1000],
      main.py:107).
    - ``query_tower_units`` / ``candidate_tower_units``: optional hidden
      Dense+ReLU widths per tower (ref: pkg/modelling/models/tower.py:36-49).
    - ``index_type``: retrieval index family built per epoch —
      "brute_force" (exact, the reference's only option) or "quantized"
      (int8 scan + fp32 rescore, beyond parity; see indices/quantized.py).
    """

    joint_embedding_size: int
    ks: List[int] = field(default_factory=lambda: [10, 100, 1000])
    query_tower_units: Optional[List[int]] = None
    candidate_tower_units: Optional[List[int]] = None
    index_type: str = "brute_force"

    def __post_init__(self):
        if self.joint_embedding_size <= 0:
            raise ValueError("joint_embedding_size must be positive")
        if not self.ks or any(k <= 0 for k in self.ks):
            raise ValueError("ks must be a non-empty list of positive ints")
        self.ks = sorted(int(k) for k in self.ks)
        if self.index_type not in ("brute_force", "quantized"):
            raise ValueError(
                f"unknown index_type {self.index_type!r} "
                "(expected 'brute_force' or 'quantized')"
            )

    def to_dict(self) -> dict:
        return {
            "joint_embedding_size": self.joint_embedding_size,
            "ks": list(self.ks),
            "query_tower_units": self.query_tower_units,
            "candidate_tower_units": self.candidate_tower_units,
            "index_type": self.index_type,
        }

    @classmethod
    def from_dict(cls, payload: dict) -> "ModelConfig":
        return cls(**payload)
