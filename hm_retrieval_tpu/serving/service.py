"""Serving: load exported artifacts and answer retrieval queries.

The reference deploys its index as a TF-Serving SavedModel whose concrete
function takes string feature tensors and returns string ids
(ref: pkg/modelling/indices/brute_force.py:108-114, README.md:101-105).
JAX has no string tensors, so the TPU-native serving contract splits the
edge from the device (SURVEY §7): the service encodes raw string features
to int ids host-side with the schema vocabs, runs the query tower + exact
top-k on device, and decodes int ids back to strings at the boundary.

Artifacts consumed (written by the modelling runner):
    <schema_dir>/                 schema.json + vocabs.npz (+ logq.npy)
    <model_dir>/query_tower/params.npz
    <index_dir>/                  index.npz + meta.json
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Union

import jax
import numpy as np

from hm_retrieval_tpu.indices.brute_force import BruteForceIndex
from hm_retrieval_tpu.models.tower import tower_forward
from hm_retrieval_tpu.schema.features import FeatureKind
from hm_retrieval_tpu.schema.schema import Schema
from hm_retrieval_tpu.utils.pytree_io import load_pytree_npz

logger = logging.getLogger(__name__)

RawQuery = Dict[str, Sequence[Union[str, float]]]


class RetrievalService:
    def __init__(
        self,
        schema: Schema,
        query_tower_params,
        index: BruteForceIndex,
    ):
        self.schema = schema
        self.params = jax.device_put(query_tower_params)
        self.index = index
        self._query_features = schema.query_features
        self._candidate_id_feature = schema.candidate_id_feature
        self._embed = jax.jit(
            lambda params, batch: tower_forward(
                params, self._query_features, batch
            )
        )

    @classmethod
    def load(
        cls,
        schema_dirpath: str,
        model_dirpath: str,
        index_dirpath: str,
        mesh=None,
        distributed_index: bool = False,
    ) -> "RetrievalService":
        """``distributed_index=True`` re-shards the saved catalog over
        ``mesh``'s model axis and serves through the collective top-k
        merge (indices/distributed.py) — the serving layout for
        catalogs bigger than one chip's HBM. Index artifacts are
        interchangeable between the two layouts."""
        schema = Schema.load(schema_dirpath)
        params = load_pytree_npz(
            f"{model_dirpath}/query_tower/params.npz"
        )
        if distributed_index:
            if mesh is None:
                raise ValueError(
                    "distributed_index=True requires a mesh"
                )
            from hm_retrieval_tpu.indices import load_distributed_index

            index = load_distributed_index(index_dirpath, mesh)
        else:
            from hm_retrieval_tpu.indices import load_index

            index = load_index(index_dirpath)
        logger.info(
            "Loaded retrieval service: %d candidates, k=%d%s",
            index.num_candidates,
            index.k,
            " (mesh-sharded catalog)" if distributed_index else "",
        )
        return cls(schema, params, index)

    # ------------------------------------------------------------------
    def encode_query(self, raw: RawQuery) -> Dict[str, np.ndarray]:
        """Raw string/float features -> int32/float32 device-ready batch
        (the host-side replacement for on-graph StringLookup)."""
        batch = {}
        n = None
        for f in self._query_features:
            if f.name not in raw:
                raise KeyError(
                    f"missing query feature {f.name!r}"
                )
            vals = raw[f.name]
            if n is None:
                n = len(vals)
            elif len(vals) != n:
                raise ValueError(
                    "query features have inconsistent lengths"
                )
            if f.kind == FeatureKind.CATEGORICAL:
                batch[f.name] = f.encode(np.asarray(vals))
            elif f.kind == FeatureKind.SEQUENCE:
                # vals is a list of per-row token lists (ragged ok)
                batch[f.name] = f.encode_sequence(list(vals))
            else:
                batch[f.name] = f.transform_numeric(
                    np.asarray(vals, dtype=np.float32)
                )
        return batch

    def retrieve(
        self, raw: RawQuery, k: int = None
    ) -> List[List[str]]:
        """Full serving path: encode -> embed -> exact top-k -> decode.
        Returns per-row lists of candidate id strings, best first."""
        batch = self.encode_query(raw)
        q = self._embed(self.params, batch)
        _, int_ids = self.index.topk_from_embeddings(q)
        int_ids = np.asarray(int_ids)
        if k is not None:
            if k > self.index.k:
                raise ValueError(
                    f"k={k} exceeds index k={self.index.k}"
                )
            int_ids = int_ids[:, :k]
        decoded = self._candidate_id_feature.decode(int_ids)
        return [list(row) for row in decoded]
