"""Columnar shard serialization: encoded int32/float32 npz shards.

TPU-native replacement for the reference's TFRecord writer
(ref: pkg/tfrecord_writer/tfrecord_writer.py:44-126). Redesign rationale
(SURVEY §7): JAX has no string tensors, so the string->id vocabulary lookup
happens HERE, once, at write time — categorical columns are stored as dense
``int32`` ids (0 = OOV) and numeric columns as ``float32``. Rows are written
as columnar numpy arrays in ``shard_{n:05d}.npz`` files capped at
``max_rows`` rows each (the ``max_tfrecord_rows`` analog,
ref: tfrecord_writer.py:105-126), plus a ``manifest.json``.

Unlike the reference's per-row Python proto loop (flagged as the
serialization hot loop, SURVEY §3.4), encoding is fully vectorized.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import numpy as np
import pandas as pd

from hm_retrieval_tpu.schema.features import Feature, FeatureKind

logger = logging.getLogger(__name__)

MANIFEST_NAME = "manifest.json"


def _arrow_list_parts(col: pd.Series):
    """(unique_tokens, flat_dict_indices, offsets) of an arrow-backed
    list column, or None when the column isn't one (object columns fall
    back to the list path). Token strings are dictionary-encoded in
    arrow C++ first, so the vocab lookup runs once per UNIQUE token and
    the per-row work is pure int32 indexing — the write-side analog of
    the reader's no-strings-on-device rule."""
    try:
        import pyarrow as pa
    except Exception:  # pragma: no cover - pyarrow ships with pandas 3
        return None
    conv = getattr(col.array, "__arrow_array__", None)
    if conv is None:
        return None
    arr = conv()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (
        pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
    ):
        return None
    if arr.null_count:
        return None  # null rows: the list path's None handling applies
    values = arr.values
    if pa.types.is_dictionary(values.type):
        if values.null_count:
            return None
        idx = np.asarray(values.indices)
        toks = values.dictionary
    else:
        d = values.dictionary_encode()
        if d.null_count:
            return None
        idx = np.asarray(d.indices)
        toks = d.dictionary
    tokens = np.asarray(toks.cast(pa.string()))
    return tokens, idx.astype(np.int64), np.asarray(
        arr.offsets, np.int64
    )


class ShardWriter:
    """Writes a DataFrame as encoded columnar shards
    (ref: TFRecordWriter, pkg/tfrecord_writer/tfrecord_writer.py:80-126).
    """

    def __init__(self, features: List[Feature], max_rows: int = 100_000):
        if max_rows <= 0:
            raise ValueError("max_rows must be positive")
        self.features = features
        self.max_rows = max_rows

    def encode_dataframe(
        self, df: pd.DataFrame
    ) -> Dict[str, np.ndarray]:
        """Vectorized encode of every schema feature column."""
        out: Dict[str, np.ndarray] = {}
        for f in self.features:
            if f.kind == FeatureKind.CATEGORICAL:
                out[f.name] = f.encode(df[f.name].to_numpy())
            elif f.kind == FeatureKind.SEQUENCE:
                parts = _arrow_list_parts(df[f.name])
                if parts is not None:
                    tokens, idx, offsets = parts
                    # one vocab lookup per UNIQUE token, then pure
                    # int windowing — no python lists materialized
                    flat_ids = f.encode(tokens)[idx]
                    out[f.name] = f.encode_sequence_ids(
                        flat_ids, offsets
                    )
                else:
                    out[f.name] = f.encode_sequence(
                        df[f.name].tolist()
                    )
            else:
                out[f.name] = f.transform_numeric(
                    df[f.name].to_numpy()
                )
        return out

    def write_shards(self, df: pd.DataFrame, dirpath: str) -> int:
        """Encode + write; returns the number of shards written."""
        return self.write_shards_streaming([df], dirpath)

    def write_shards_streaming(self, frames, dirpath: str) -> int:
        """Encode + write from an iterable of DataFrames, holding at
        most one input frame plus ~max_rows encoded rows in memory —
        the streaming shards stage (pairs with the chunked ETL: the
        whole pipeline is then O(chunk) in the row count). Shard
        boundaries and file contents are IDENTICAL to a single
        write_shards over the concatenated frame (full shards flush as
        soon as max_rows accumulate)."""
        os.makedirs(dirpath, exist_ok=True)
        pending: Dict[str, List[np.ndarray]] = {
            f.name: [] for f in self.features
        }
        pend_rows = 0
        n = 0
        s = 0

        def flush(final: bool) -> None:
            nonlocal pend_rows, s, pending
            while pend_rows >= self.max_rows or (
                final and pend_rows > 0
            ):
                take = min(self.max_rows, pend_rows)
                shard = {}
                for key, parts in pending.items():
                    col = (
                        parts[0]
                        if len(parts) == 1
                        else np.concatenate(parts)
                    )
                    shard[key] = col[:take]
                    pending[key] = [col[take:]] if take < len(
                        col
                    ) else []
                pend_rows -= take
                np.savez(
                    os.path.join(dirpath, f"shard_{s:05d}.npz"),
                    **shard,
                )
                s += 1

        empty_template = None
        for df in frames:
            if not len(df):
                empty_template = df
                continue
            columns = self.encode_dataframe(df)
            for key, arr in columns.items():
                pending[key].append(arr)
            pend_rows += len(df)
            n += len(df)
            flush(final=False)
        flush(final=True)
        if s == 0:
            # zero rows total: keep the one-empty-shard layout the
            # monolithic writer produced (readers expect >= 1 file)
            if empty_template is None:
                empty_template = pd.DataFrame(
                    {
                        f.name: pd.Series([], dtype=object)
                        for f in self.features
                    }
                )
            shard = self.encode_dataframe(empty_template)
            np.savez(
                os.path.join(dirpath, "shard_00000.npz"), **shard
            )
            s = 1
        manifest = {
            "num_rows": n,
            "num_shards": s,
            # rows per shard (last shard may be short): lets multi-host
            # readers compute their local row count without opening files
            "max_rows": self.max_rows,
            "features": {
                f.name: (
                    "float32"
                    if f.kind == FeatureKind.NUMERIC
                    else "int32"
                )
                for f in self.features
            },
        }
        with open(os.path.join(dirpath, MANIFEST_NAME), "w") as fp:
            json.dump(manifest, fp, indent=2)
        logger.info(
            "Wrote %d rows as %d shard(s) to %s", n, s, dirpath
        )
        return s
