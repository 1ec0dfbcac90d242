"""Static (popularity) index: the rules-based baseline to beat.

Re-design of ref: pkg/modelling/indices/static_index.py:9-96. Returns a
fixed ordered id list tiled to the batch size, ignoring every query feature
(ref: static_index.py:37-55). Built from transaction popularity
``value_counts()`` order (ref: static_index.py:67-95); identifiers here are
int candidate ids (schema-encoded), not strings.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict

import numpy as np
import pandas as pd

from hm_retrieval_tpu.schema.schema import Schema

logger = logging.getLogger(__name__)


class StaticIndex:
    def __init__(self, identifiers: np.ndarray):
        identifiers = np.asarray(identifiers)
        if identifiers.ndim != 1 or len(identifiers) == 0:
            raise ValueError("identifiers must be a non-empty 1D array")
        self.identifiers = identifiers

    @property
    def k(self) -> int:
        return len(self.identifiers)

    def query(self, batch_size: int, k: int = None) -> np.ndarray:
        """(B, k) — the same ordered ids for every row
        (ref: static_index.py:37-55)."""
        k = self.k if k is None else k
        if k > self.k:
            raise ValueError(f"k={k} exceeds index size {self.k}")
        return np.tile(self.identifiers[:k], (batch_size, 1))

    @classmethod
    def build_popularity_index_from_series(
        cls, series: pd.Series, schema: Schema, k: int
    ) -> "StaticIndex":
        """Top-k most popular candidate ids by transaction frequency
        (ref: static_index.py:67-95). ``series`` holds raw string
        candidate ids; they are schema-encoded to ints."""
        order = series.astype(str).value_counts().index.to_numpy()[:k]
        ids = schema.candidate_id_feature.encode(order)
        # Drop ids that fell out of the vocab (would decode to OOV).
        ids = ids[ids != 0]
        if len(ids) < k:
            logger.warning(
                "Popularity index has %d < k=%d in-vocab ids",
                len(ids),
                k,
            )
        return cls(ids)

    # ------------------------------------------------------------------
    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        np.save(
            os.path.join(dirpath, "identifiers.npy"), self.identifiers
        )
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump({"type": "static", "k": self.k}, f)
        logger.info("Saved static index to %s", dirpath)

    @classmethod
    def load(cls, dirpath: str) -> "StaticIndex":
        return cls(
            np.load(os.path.join(dirpath, "identifiers.npy"))
        )
