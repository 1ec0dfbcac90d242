"""Feature specs with frequency-ordered vocabularies and int-id encoding.

TPU-native analog of the reference feature spec (ref: pkg/schema/features.py).
Key redesign: the reference keeps TF dtypes and does string lookup on-graph
with `StringLookup(num_oov_indices=1)` (ref: pkg/modelling/layers/
input_layer.py:33-36); JAX has no string tensors, so vocab lookup moves into
the host data pipeline. Encoding contract:

    id 0                -> OOV  (mirrors num_oov_indices=1)
    id i+1 (1..V)       -> vocab[i], vocab frequency-ordered (most frequent
                           first), truncated to max_vocab_size
                           (ref: pkg/schema/features.py:106-127)

so an embedding table has ``len(vocab) + 1`` rows, exactly like the
reference's ``Embedding(len(vocab)+1, emb_size)`` (ref: input_layer.py:37-41).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import pandas as pd


class FeatureFamily(str, enum.Enum):
    """Which tower a feature feeds (ref: pkg/schema/features.py:11-18)."""

    QUERY = "query"
    CANDIDATE = "candidate"


class FeatureKind(str, enum.Enum):
    """Value type. The reference supports tf.string / tf.float32
    (ref: pkg/schema/features.py:43); here: categorical (string tokens,
    id-encoded), numeric (float32 passthrough), and sequence (a fixed-
    length window of categorical tokens, e.g. last-N purchase history —
    BASELINE config[3]; no reference analog, every reference input is a
    single scalar token, SURVEY §5.7)."""

    CATEGORICAL = "categorical"
    NUMERIC = "numeric"
    SEQUENCE = "sequence"


@dataclass
class Feature:
    """One model input feature.

    Parameters mirror the reference's Feature
    (ref: pkg/schema/features.py:21-73): name, dtype/kind, family, an
    embedding size for categorical features, and either a fixed vocab or a
    ``max_vocab_size`` cap for vocab building.
    """

    name: str
    kind: FeatureKind
    family: FeatureFamily
    embedding_size: Optional[int] = None
    vocab: Optional[np.ndarray] = None  # frequency-ordered string tokens
    max_vocab_size: Optional[int] = None
    # Numeric-only: standardize to zero mean / unit variance using train
    # statistics (computed by Schema.build_features_from_dataframe).
    # The reference passes numerics through raw (ref: input_layer.py:61-69)
    # which can saturate the all-ReLU towers — see models/tower.py note.
    standardize: bool = False
    mean: Optional[float] = None
    std: Optional[float] = None
    # Sequence-only: window length (tokens beyond the last max_len are
    # dropped; shorter histories right-pad with 0, which doubles as the
    # OOV/pad id and is masked out in pooling).
    max_len: Optional[int] = None
    # Sequence-only: name of the feature whose vocab this one shares
    # (e.g. purchase history shares the article_id vocab). Wired by the
    # Schema after construction/load.
    shared_vocab_with: Optional[str] = None
    # Sequence-only: how the (B, L, E) token embeddings pool to (B, E).
    # "mean" = masked mean (BASELINE config[3] default); "attention" =
    # learned-query dot-product attention over valid positions (the
    # config[3] "mean-pool/attention" alternative; zero-initialized, so
    # training starts exactly at the mean-pool solution).
    pooling: str = "mean"
    # token -> id cache (built lazily; not serialized)
    _token_to_id: Optional[Dict[str, int]] = field(
        default=None, repr=False, compare=False
    )
    # native (C++) vocab handle + the vocab object it was built from
    _native: object = field(default=None, repr=False, compare=False)
    _native_for: object = field(
        default=None, repr=False, compare=False
    )
    # CPython-extension encoder (zero-copy token reads; sequences)
    _seq_native: object = field(
        default=None, repr=False, compare=False
    )
    _seq_native_for: object = field(
        default=None, repr=False, compare=False
    )
    # id -> token decode table (OOV-padded copy of vocab; built lazily)
    _decode_table: object = field(
        default=None, repr=False, compare=False
    )
    _decode_table_for: object = field(
        default=None, repr=False, compare=False
    )

    def __post_init__(self):
        self.kind = FeatureKind(self.kind)
        self.family = FeatureFamily(self.family)
        if self.kind in (
            FeatureKind.CATEGORICAL,
            FeatureKind.SEQUENCE,
        ):
            if self.embedding_size is None or self.embedding_size <= 0:
                raise ValueError(
                    f"feature {self.name!r} requires a positive "
                    "embedding_size"
                )
        else:
            if self.embedding_size is not None:
                raise ValueError(
                    f"numeric feature {self.name!r} cannot have an "
                    "embedding_size"
                )
            if self.vocab is not None or self.max_vocab_size is not None:
                raise ValueError(
                    f"numeric feature {self.name!r} cannot have a vocab"
                )
        if self.standardize and self.kind != FeatureKind.NUMERIC:
            raise ValueError(
                f"standardize only applies to numeric features "
                f"({self.name!r})"
            )
        if self.kind == FeatureKind.SEQUENCE:
            if self.max_len is None or self.max_len <= 0:
                raise ValueError(
                    f"sequence feature {self.name!r} requires a "
                    "positive max_len"
                )
        elif self.max_len is not None:
            raise ValueError(
                f"max_len only applies to sequence features "
                f"({self.name!r})"
            )
        if self.pooling not in ("mean", "attention"):
            raise ValueError(
                f"unknown pooling {self.pooling!r} for {self.name!r} "
                "(expected 'mean' or 'attention')"
            )
        if (
            self.pooling != "mean"
            and self.kind != FeatureKind.SEQUENCE
        ):
            raise ValueError(
                f"pooling only applies to sequence features "
                f"({self.name!r})"
            )
        if self.vocab is not None:
            self.vocab = np.asarray(self.vocab, dtype=str)

    # ------------------------------------------------------------------
    # Vocab building / encoding
    # ------------------------------------------------------------------
    @property
    def has_vocab(self) -> bool:
        return self.vocab is not None

    @property
    def num_embeddings(self) -> int:
        """Table rows: vocab size + 1 OOV row (ref: input_layer.py:37-41)."""
        if self.vocab is None:
            raise ValueError(f"feature {self.name!r} has no vocab yet")
        return len(self.vocab) + 1

    def build_vocab_from_dataframe(self, df: pd.DataFrame) -> None:
        """Frequency-ordered vocab, truncated to ``max_vocab_size`` most
        frequent tokens (ref: pkg/schema/features.py:106-127)."""
        if self.kind != FeatureKind.CATEGORICAL:
            raise ValueError(f"cannot build vocab for numeric {self.name!r}")
        counts = df[self.name].astype(str).value_counts()
        if self.max_vocab_size is not None:
            counts = counts.iloc[: self.max_vocab_size]
        self.vocab = counts.index.to_numpy(dtype=str)
        self._token_to_id = None

    def build_stats_from_dataframe(self, df: pd.DataFrame) -> None:
        """Train-split mean/std for numeric standardization."""
        if self.kind != FeatureKind.NUMERIC:
            raise ValueError(f"{self.name!r} is not numeric")
        col = df[self.name].to_numpy(dtype=np.float64)
        self.mean = float(np.nanmean(col))
        self.std = float(np.nanstd(col)) or 1.0

    def transform_numeric(self, values: np.ndarray) -> np.ndarray:
        """float32 passthrough, standardized when configured. NaNs (e.g.
        H&M's FN/Active columns) map to 0.0 — post-standardization, so a
        missing value reads as 'at the mean'."""
        out = np.asarray(values, dtype=np.float32)
        if self.standardize:
            if self.mean is None or self.std is None:
                raise ValueError(
                    f"numeric stats for {self.name!r} not built"
                )
            out = (out - np.float32(self.mean)) / np.float32(self.std)
        return np.nan_to_num(out, nan=0.0)

    def _lookup(self) -> Dict[str, int]:
        if self._token_to_id is None:
            if self.vocab is None:
                raise ValueError(f"feature {self.name!r} has no vocab")
            self._token_to_id = {
                tok: i + 1 for i, tok in enumerate(self.vocab)
            }
        return self._token_to_id

    def encode(self, values) -> np.ndarray:
        """String tokens -> int32 ids (0 = OOV). Host-side replacement for
        the reference's on-graph StringLookup (ref: input_layer.py:33-36).
        Object-dtype inputs (the pandas common case) go through the
        CPython-extension encoder (native/seqencode.cpp), which reads
        tokens in place; otherwise the thread-parallel C++ fixed-width
        encoder (native/shardio.cpp); the pandas path is the exact
        fallback."""
        raw = np.asarray(values)
        if raw.dtype.kind == "O":
            seq_native = self._seq_native_encoder()
            if seq_native is not None:
                return seq_native.encode_tokens(raw.ravel())
        arr = np.asarray(values, dtype=str).ravel()
        native = self._native_encoder()
        if native is not None:
            return native.encode(arr)
        table = self._lookup()
        ser = pd.Series(arr)
        ids = ser.map(table).fillna(0).to_numpy(dtype=np.int32)
        return ids

    def _native_encoder(self):
        if self.vocab is None:
            raise ValueError(f"feature {self.name!r} has no vocab")
        try:
            from hm_retrieval_tpu import native_ext
        except Exception:
            return None
        if not native_ext.available():
            return None
        if self._native is None or self._native_for is not self.vocab:
            self._native = native_ext.NativeVocab(self.vocab)
            self._native_for = self.vocab
        return self._native

    def _seq_native_encoder(self):
        """The CPython-extension encoder (native/seqencode.cpp): reads
        Python str tokens in place, no numpy string materialization —
        the hot path for object-dtype columns and history cells."""
        if self.vocab is None:
            raise ValueError(f"feature {self.name!r} has no vocab")
        try:
            from hm_retrieval_tpu import native_ext
        except Exception:
            return None
        if not native_ext.seq_available():
            return None
        if (
            self._seq_native is None
            or self._seq_native_for is not self.vocab
        ):
            self._seq_native = native_ext.NativeSeqVocab(self.vocab)
            self._seq_native_for = self.vocab
        return self._seq_native

    def encode_sequence(self, values) -> np.ndarray:
        """Iterable of token lists -> (B, max_len) int32, keeping the LAST
        ``max_len`` tokens, right-padded with 0 (pad == OOV; pooling masks
        id 0).

        Vectorized: rows are flattened into ONE token vector, encoded in
        a single ``encode`` call (thread-parallel C++ when available),
        and scattered back — the serialization hot path must not starve
        chips (SURVEY §7 hard part #6; the reference's per-row proto
        loop is its known bottleneck,
        ref: pkg/tfrecord_writer/tfrecord_writer.py:105-126)."""
        if self.kind != FeatureKind.SEQUENCE:
            raise ValueError(f"{self.name!r} is not a sequence feature")
        n = len(values)
        out = np.zeros((n, self.max_len), np.int32)
        if n == 0:
            return out
        seq_native = self._seq_native_encoder()
        if seq_native is not None:
            # single C pass: truncate + read tokens in place + parallel
            # hash lookups with the GIL released
            return seq_native.encode_sequences(values, self.max_len)
        # Vectorized numpy fallback — one O(B) pass truncates to the
        # last max_len tokens per row and flattens (missing cells arrive
        # as None or float NaN from pandas), then ONE encode call
        trunc = []
        for toks in values:
            if toks is None or (
                isinstance(toks, float) and np.isnan(toks)
            ):
                trunc.append(())
            else:
                trunc.append(tuple(toks)[-self.max_len:])
        lens = np.fromiter(
            (len(t) for t in trunc), np.int64, count=n
        )
        total = int(lens.sum())
        if total == 0:
            return out
        import itertools

        flat = np.fromiter(
            itertools.chain.from_iterable(trunc),
            dtype=object,
            count=total,
        )
        ids = self.encode(flat)
        row_idx = np.repeat(np.arange(n), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        col_idx = np.arange(total) - np.repeat(starts, lens)
        out[row_idx, col_idx] = ids
        return out

    def encode_sequence_ids(
        self, flat_ids: np.ndarray, offsets: np.ndarray
    ) -> np.ndarray:
        """Pre-encoded flat token ids + (B+1,) row offsets ->
        (B, max_len) int32 windows: the last ``max_len`` tokens per row,
        right-padded with 0 — identical to ``encode_sequence`` after a
        flat ``encode``. This is the zero-object-churn half of the
        arrow-backed fast path (data/shard_writer.py): 31M histories
        window in a handful of O(total) numpy gathers."""
        if self.kind != FeatureKind.SEQUENCE:
            raise ValueError(f"{self.name!r} is not a sequence feature")
        offsets = np.asarray(offsets, np.int64)
        n = len(offsets) - 1
        out = np.zeros((n, self.max_len), np.int32)
        lens = np.minimum(offsets[1:] - offsets[:-1], self.max_len)
        total = int(lens.sum())
        if total == 0:
            return out
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts = np.cumsum(lens) - lens
        j = np.arange(total, dtype=np.int64) - starts[row]
        src = offsets[1:][row] - lens[row] + j
        out[row, j] = np.asarray(flat_ids, np.int32)[src]
        return out

    def _encode_sequence_loop(self, values) -> np.ndarray:
        """Reference implementation of ``encode_sequence`` (per-row,
        per-token dict lookups). Kept as the parity oracle for tests and
        the benchmark in benchmarks/bench_sequence_encode.py."""
        if self.kind != FeatureKind.SEQUENCE:
            raise ValueError(f"{self.name!r} is not a sequence feature")
        table = self._lookup()
        out = np.zeros((len(values), self.max_len), np.int32)
        for r, toks in enumerate(values):
            if toks is None or (
                isinstance(toks, float) and np.isnan(toks)
            ):
                continue
            toks = list(toks)[-self.max_len:]
            for j, tok in enumerate(toks):
                out[r, j] = table.get(str(tok), 0)
        return out

    def decode(self, ids: np.ndarray) -> np.ndarray:
        """Int ids -> string tokens; id 0 (and out-of-range) -> '<OOV>'."""
        if self.vocab is None:
            raise ValueError(f"feature {self.name!r} has no vocab")
        ids = np.asarray(ids)
        # cache the OOV-padded table (identity-keyed like _native_for):
        # rebuilding it copies the whole vocab — measured 21 ms per
        # call on a 1M-entry vocab, dwarfing the actual (B, k) gather
        if (
            self._decode_table is None
            or self._decode_table_for is not self.vocab
        ):
            self._decode_table = np.concatenate(
                [np.array(["<OOV>"]), self.vocab]
            )
            self._decode_table_for = self.vocab
        padded = self._decode_table
        safe = np.where((ids >= 0) & (ids < len(padded)), ids, 0)
        return padded[safe]

    # ------------------------------------------------------------------
    # Serialization (vocab stored separately in an npz, see schema.py)
    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "kind": self.kind.value,
            "family": self.family.value,
            "embedding_size": self.embedding_size,
            "max_vocab_size": self.max_vocab_size,
            "has_vocab": self.has_vocab,
            "standardize": self.standardize,
            "mean": self.mean,
            "std": self.std,
            "max_len": self.max_len,
            "shared_vocab_with": self.shared_vocab_with,
            "pooling": self.pooling,
        }

    @classmethod
    def from_dict(
        cls, payload: dict, vocab: Optional[np.ndarray] = None
    ) -> "Feature":
        return cls(
            name=payload["name"],
            kind=FeatureKind(payload["kind"]),
            family=FeatureFamily(payload["family"]),
            embedding_size=payload.get("embedding_size"),
            vocab=vocab,
            max_vocab_size=payload.get("max_vocab_size"),
            standardize=payload.get("standardize", False),
            mean=payload.get("mean"),
            std=payload.get("std"),
            max_len=payload.get("max_len"),
            shared_vocab_with=payload.get("shared_vocab_with"),
            pooling=payload.get("pooling", "mean"),
        )
