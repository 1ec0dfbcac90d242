"""Schema aggregate: features + model config + training config + logQ table.

TPU-native analog of the reference Schema (ref: pkg/schema/schema.py:13-99),
redesigned per SURVEY §7:

- **Framework-neutral, versioned JSON** artifact instead of a pickle holding
  TF dtypes (ref pickles itself at schema.py:57-84).
- The logQ candidate-probability mapping is a dense ``float32`` array indexed
  by candidate id (0 = OOV -> log-prob 0.0, matching the reference hash
  table's ``default_value=1.0`` => log(1)=0 semantics,
  ref: pkg/modelling/layers/logq_correction.py:38-42).

On-disk layout (a directory):
    schema.json   -- configs + feature metadata
    vocabs.npz    -- per-feature string vocab arrays
    logq.npy      -- dense logQ array aligned to the candidate-id vocab
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from hm_retrieval_tpu.schema.features import Feature, FeatureFamily
from hm_retrieval_tpu.schema.model_config import ModelConfig
from hm_retrieval_tpu.schema.training_config import TrainingConfig

logger = logging.getLogger(__name__)

SCHEMA_VERSION = 1


@dataclass
class Schema:
    """Bundles features + configs; the single cross-stage contract
    (ref: pkg/schema/schema.py:13-41)."""

    features: List[Feature]
    model_config: ModelConfig
    training_config: TrainingConfig
    # Column holding the candidate identifier (ref: TwoTowerModel's
    # candidate_id_col, two_tower_model.py:47-50).
    candidate_id_col: str = "article_id"
    # Dense logQ array: logq[id] = log(P(candidate id sampled)); logq[0]=0.
    logq: Optional[np.ndarray] = field(default=None, repr=False)

    def __post_init__(self):
        names = [f.name for f in self.features]
        self._wire_shared_vocabs()
        if len(set(names)) != len(names):
            # The reference silently overwrites duplicate feature names in a
            # dict (SURVEY C12 quirk, ref: input_layer.py:31); we reject.
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate feature names: {dupes}")
        if self.candidate_id_col not in [
            f.name for f in self.candidate_features
        ]:
            raise ValueError(
                f"candidate_id_col {self.candidate_id_col!r} is not a "
                "candidate feature"
            )

    def _wire_shared_vocabs(self) -> None:
        """Point sequence features at their source feature's vocab (e.g.
        purchase history shares the article_id vocab). Safe to call
        repeatedly; no-op while the source vocab is unbuilt."""
        by_name = {f.name: f for f in self.features}
        for f in self.features:
            if f.shared_vocab_with:
                src = by_name.get(f.shared_vocab_with)
                if src is None:
                    raise ValueError(
                        f"{f.name!r} shares vocab with unknown "
                        f"feature {f.shared_vocab_with!r}"
                    )
                if src.has_vocab:
                    f.vocab = src.vocab
                    f._token_to_id = None

    # ------------------------------------------------------------------
    # Partitions (ref: schema.py:34-39)
    # ------------------------------------------------------------------
    @property
    def query_features(self) -> List[Feature]:
        return [
            f for f in self.features if f.family == FeatureFamily.QUERY
        ]

    @property
    def candidate_features(self) -> List[Feature]:
        return [
            f for f in self.features if f.family == FeatureFamily.CANDIDATE
        ]

    @property
    def candidate_id_feature(self) -> Feature:
        return next(
            f for f in self.features if f.name == self.candidate_id_col
        )

    def feature(self, name: str) -> Feature:
        for f in self.features:
            if f.name == name:
                return f
        raise KeyError(name)

    # ------------------------------------------------------------------
    # Vocab + logQ building (ref: schema.py:43-55, etl/runner.py:75-78)
    # ------------------------------------------------------------------
    def build_features_from_dataframe(self, df: pd.DataFrame) -> None:
        """Build every missing categorical vocab from the (train) frame
        (ref: pkg/schema/schema.py:43-55)."""
        for f in self.features:
            if (
                f.kind.value == "categorical"
                and not f.has_vocab
            ):
                logger.info("Building vocab for feature %s", f.name)
                f.build_vocab_from_dataframe(df)
                logger.info(
                    "Feature %s vocab size %d", f.name, len(f.vocab)
                )
            elif (
                f.kind.value == "sequence"
                and not f.has_vocab
                and not f.shared_vocab_with
            ):
                # standalone sequence vocab from exploded token lists
                logger.info(
                    "Building sequence vocab for feature %s", f.name
                )
                exploded = df[f.name].explode().dropna()
                f.vocab = (
                    exploded.astype(str)
                    .value_counts()
                    .index.to_numpy(dtype=str)
                )
                if f.max_vocab_size is not None:
                    f.vocab = f.vocab[: f.max_vocab_size]
            elif f.kind.value == "numeric" and f.standardize:
                f.build_stats_from_dataframe(df)
                logger.info(
                    "Feature %s stats mean=%.4f std=%.4f",
                    f.name,
                    f.mean,
                    f.std,
                )
        self._wire_shared_vocabs()

    def build_logq_from_dataframe(self, train_df: pd.DataFrame) -> None:
        """Candidate sampling probs = value_counts/len(train) over the TRAIN
        split only (ref: pkg/etl/runner.py:75-78), stored as a dense log
        table aligned to the candidate-id vocab. Ids absent from train get
        log(1)=0, matching the hash table default
        (ref: logq_correction.py:38-42)."""
        cid = self.candidate_id_feature
        if not cid.has_vocab:
            raise ValueError("candidate id vocab must be built before logQ")
        self.build_logq_from_value_counts(
            train_df[self.candidate_id_col].astype(str).value_counts(),
            len(train_df),
        )

    def build_logq_from_value_counts(
        self, counts: "pd.Series", total_rows: int
    ) -> None:
        """Same dense-table construction from precomputed candidate-id
        value counts (the streaming schema stage accumulates these one
        parquet batch at a time)."""
        cid = self.candidate_id_feature
        if not cid.has_vocab:
            raise ValueError("candidate id vocab must be built before logQ")
        probs = counts / total_rows
        table = np.zeros(cid.num_embeddings, dtype=np.float32)
        # vocab token i -> id i+1
        tok_probs = probs.reindex(cid.vocab).to_numpy(dtype=np.float64)
        present = ~np.isnan(tok_probs)
        table[1:][present] = np.log(tok_probs[present]).astype(np.float32)
        self.logq = table

    def set_candidate_probs(self, probs: Dict[str, float]) -> None:
        """Explicit candidate-id -> prob mapping (the reference's
        ``candidate_prob_lookup`` dict, training_config.py:39)."""
        cid = self.candidate_id_feature
        table = np.zeros(cid.num_embeddings, dtype=np.float32)
        for tok, p in probs.items():
            ids = cid.encode(np.array([tok]))
            if ids[0] != 0:
                table[ids[0]] = np.log(p)
        self.logq = table

    # ------------------------------------------------------------------
    # Serialization (JSON + npz; replaces the reference pickle,
    # ref: schema.py:57-84)
    # ------------------------------------------------------------------
    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        payload = {
            "version": SCHEMA_VERSION,
            "candidate_id_col": self.candidate_id_col,
            "model_config": self.model_config.to_dict(),
            "training_config": self.training_config.to_dict(),
            "features": [f.to_dict() for f in self.features],
            "has_logq": self.logq is not None,
        }
        with open(os.path.join(dirpath, "schema.json"), "w") as f:
            json.dump(payload, f, indent=2)
        vocabs = {
            f.name: f.vocab
            for f in self.features
            if f.has_vocab and not f.shared_vocab_with
        }
        np.savez_compressed(
            os.path.join(dirpath, "vocabs.npz"), **vocabs
        )
        if self.logq is not None:
            np.save(os.path.join(dirpath, "logq.npy"), self.logq)
        logger.info("Saved schema to %s", dirpath)

    @classmethod
    def load(cls, dirpath: str) -> "Schema":
        with open(os.path.join(dirpath, "schema.json")) as f:
            payload = json.load(f)
        if payload["version"] != SCHEMA_VERSION:
            raise ValueError(
                f"schema version {payload['version']} != {SCHEMA_VERSION}"
            )
        vocab_path = os.path.join(dirpath, "vocabs.npz")
        vocabs = {}
        if os.path.exists(vocab_path):
            with np.load(vocab_path, allow_pickle=False) as z:
                vocabs = {k: z[k].astype(str) for k in z.files}
        features = [
            Feature.from_dict(fd, vocab=vocabs.get(fd["name"]))
            for fd in payload["features"]
        ]
        logq = None
        if payload.get("has_logq"):
            logq = np.load(os.path.join(dirpath, "logq.npy"))
        return cls(
            features=features,
            model_config=ModelConfig.from_dict(payload["model_config"]),
            training_config=TrainingConfig.from_dict(
                payload["training_config"]
            ),
            candidate_id_col=payload["candidate_id_col"],
            logq=logq,
        )
