"""TFRecord / tf.train.Example interop — the reference's on-disk format.

The reference serializes datasets as TFRecord shards of ``tf.train.Example``
protos (ref: pkg/tfrecord_writer/tfrecord_writer.py:44-126, string features
as single-value BytesList, floats as single-value FloatList) and reads them
back with ``tf.data.TFRecordDataset`` + ``FixedLenFeature([1])`` parsing
(ref: pkg/modelling/tfrecord_dataset.py:24-37, 83-88).

This framework's native format is encoded columnar npz shards
(data/shard_writer.py) — strings never reach the device. This module is the
migration bridge so a reference user can switch frameworks without
re-running their ETL:

* ``iter_tfrecords`` / ``parse_example``: read the reference's files with
  ZERO TensorFlow dependency (hand-rolled record framing + proto wire-format
  decode; CRC32C + framing scan have a C++ fast path in native/shardio.cpp).
* ``write_tfrecords``: produce files byte-compatible with
  ``tf.io.TFRecordWriter`` output, sharded ``{prefix}_{n}.tfrecord`` like
  the reference (ref: tfrecord_writer.py:105-126).
* ``import_tfrecords``: TFRecord shards -> this framework's encoded npz
  shards (vocab lookup applied once, at import).
* ``export_shards_to_tfrecords``: npz shards -> TFRecord (ids decoded back
  to string tokens) for consumers still on the reference stack.

Wire format notes (tensorflow/core/example/{example,feature}.proto):
    Example.features = field 1; Features.feature map entries = field 1
    (key = entry field 1, value = entry field 2);
    Feature.bytes_list/float_list/int64_list = fields 1/2/3;
    BytesList.value = repeated field 1 (len-delimited);
    FloatList.value = repeated field 1 (packed fixed32 by default);
    Int64List.value = repeated field 1 (packed varint by default).
Record framing: uint64 length | masked crc32c(length) | data |
masked crc32c(data), with masked(c) = rotr15(c) + 0xa282ead8.
"""

from __future__ import annotations

import glob
import logging
import os
import struct
from typing import Dict, Iterator, List, Sequence, Union

import numpy as np
import pandas as pd

from hm_retrieval_tpu import native_ext
from hm_retrieval_tpu.data.shard_writer import ShardWriter
from hm_retrieval_tpu.schema.features import Feature, FeatureKind

logger = logging.getLogger(__name__)

FeatureValue = Union[List[bytes], List[float], List[int]]

# ---------------------------------------------------------------------------
# CRC32C (pure-Python fallback; native fast path in shardio.cpp)
# ---------------------------------------------------------------------------

_CRC_TABLE: List[int] = []


def _crc_table() -> List[int]:
    if not _CRC_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (0x82F63B78 ^ (c >> 1)) if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def masked_crc32c(data: bytes) -> int:
    """Masked CRC32C as used by the TFRecord container."""
    native = native_ext.tfrecord_masked_crc(data)
    if native is not None:
        return native
    table = _crc_table()
    c = 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    c ^= 0xFFFFFFFF
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Record framing (read/write)
# ---------------------------------------------------------------------------


def iter_tfrecords(
    path: str, verify_crc: bool = True
) -> Iterator[bytes]:
    """Yield raw record payloads from one TFRecord file."""
    with open(path, "rb") as f:
        buf = f.read()
    scanned = native_ext.tfrecord_scan(buf, verify=verify_crc)
    if scanned is not None:
        offsets, lengths = scanned
        for off, ln in zip(offsets.tolist(), lengths.tolist()):
            yield buf[off : off + ln]
        return
    pos, n = 0, len(buf)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"{path}: truncated record header @ {pos}")
        (length,) = struct.unpack_from("<Q", buf, pos)
        (len_crc,) = struct.unpack_from("<I", buf, pos + 8)
        if verify_crc and masked_crc32c(buf[pos : pos + 8]) != len_crc:
            raise ValueError(f"{path}: bad length CRC @ {pos}")
        start = pos + 12
        end = start + length
        if end + 4 > n:
            raise ValueError(f"{path}: truncated record body @ {pos}")
        data = buf[start:end]
        (data_crc,) = struct.unpack_from("<I", buf, end)
        if verify_crc and masked_crc32c(data) != data_crc:
            raise ValueError(f"{path}: bad data CRC @ {pos}")
        yield data
        pos = end + 4


def write_tfrecords(path: str, payloads: Sequence[bytes]) -> None:
    """Write raw payloads as one TFRecord file (tf.io-compatible)."""
    offsets = np.zeros(len(payloads) + 1, np.uint64)
    np.cumsum([len(p) for p in payloads], out=offsets[1:])
    blob = b"".join(payloads)
    framed = native_ext.tfrecord_frame(blob, offsets)
    if framed is None:
        parts = []
        for p in payloads:
            header = struct.pack("<Q", len(p))
            parts.append(header)
            parts.append(struct.pack("<I", masked_crc32c(header)))
            parts.append(p)
            parts.append(struct.pack("<I", masked_crc32c(p)))
        framed = b"".join(parts)
    with open(path, "wb") as f:
        f.write(framed)


# ---------------------------------------------------------------------------
# tf.train.Example wire-format decode / encode (no TF dependency)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:  # varint
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:  # fixed64
        return pos + 8
    if wire == 2:  # len-delimited
        ln, pos = _read_varint(buf, pos)
        return pos + ln
    if wire == 5:  # fixed32
        return pos + 4
    raise ValueError(f"unsupported wire type {wire}")


def _parse_bytes_list(buf: bytes) -> List[bytes]:
    out: List[bytes] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag >> 3 == 1 and tag & 7 == 2:
            ln, pos = _read_varint(buf, pos)
            out.append(buf[pos : pos + ln])
            pos += ln
        else:
            pos = _skip_field(buf, pos, tag & 7)
    return out


def _parse_float_list(buf: bytes) -> List[float]:
    out: List[float] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag >> 3 == 1 and tag & 7 == 2:  # packed
            ln, pos = _read_varint(buf, pos)
            out.extend(
                np.frombuffer(
                    buf, np.dtype("<f4"), ln // 4, pos
                ).tolist()
            )
            pos += ln
        elif tag >> 3 == 1 and tag & 7 == 5:  # unpacked fixed32
            out.append(struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        else:
            pos = _skip_field(buf, pos, tag & 7)
    return out


def _parse_int64_list(buf: bytes) -> List[int]:
    out: List[int] = []
    pos = 0

    def _signed(v: int) -> int:
        return v - (1 << 64) if v >= 1 << 63 else v

    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag >> 3 == 1 and tag & 7 == 2:  # packed
            ln, pos = _read_varint(buf, pos)
            end = pos + ln
            while pos < end:
                v, pos = _read_varint(buf, pos)
                out.append(_signed(v))
        elif tag >> 3 == 1 and tag & 7 == 0:  # unpacked varint
            v, pos = _read_varint(buf, pos)
            out.append(_signed(v))
        else:
            pos = _skip_field(buf, pos, tag & 7)
    return out


def _parse_feature(buf: bytes) -> FeatureValue:
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2 and field in (1, 2, 3):
            ln, pos = _read_varint(buf, pos)
            sub = buf[pos : pos + ln]
            if field == 1:
                return _parse_bytes_list(sub)
            if field == 2:
                return _parse_float_list(sub)
            return _parse_int64_list(sub)
        pos = _skip_field(buf, pos, wire)
    return []  # empty Feature (no kind set)


def parse_example(payload: bytes) -> Dict[str, FeatureValue]:
    """Decode one tf.train.Example proto to {name: list-of-values}."""
    out: Dict[str, FeatureValue] = {}
    pos = 0
    while pos < len(payload):
        tag, pos = _read_varint(payload, pos)
        if tag >> 3 == 1 and tag & 7 == 2:  # Example.features
            ln, pos = _read_varint(payload, pos)
            fbuf = payload[pos : pos + ln]
            pos += ln
            fpos = 0
            while fpos < len(fbuf):
                ftag, fpos = _read_varint(fbuf, fpos)
                if ftag >> 3 == 1 and ftag & 7 == 2:  # map entry
                    eln, fpos = _read_varint(fbuf, fpos)
                    ebuf = fbuf[fpos : fpos + eln]
                    fpos += eln
                    key, value = "", []
                    epos = 0
                    while epos < len(ebuf):
                        etag, epos = _read_varint(ebuf, epos)
                        if etag >> 3 == 1 and etag & 7 == 2:
                            kln, epos = _read_varint(ebuf, epos)
                            key = ebuf[epos : epos + kln].decode(
                                "utf-8"
                            )
                            epos += kln
                        elif etag >> 3 == 2 and etag & 7 == 2:
                            vln, epos = _read_varint(ebuf, epos)
                            value = _parse_feature(
                                ebuf[epos : epos + vln]
                            )
                            epos += vln
                        else:
                            epos = _skip_field(
                                ebuf, epos, etag & 7
                            )
                    out[key] = value
                else:
                    fpos = _skip_field(fbuf, fpos, ftag & 7)
        else:
            pos = _skip_field(payload, pos, tag & 7)
    return out


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _encode_feature(values: FeatureValue) -> bytes:
    """Encode one Feature message. Value type decides the list kind the
    same way tf.train does: bytes/str -> BytesList, float -> FloatList,
    int -> Int64List."""
    if not values:
        return b""
    v0 = values[0]
    if isinstance(v0, (bytes, str)):
        inner = b"".join(
            _len_delimited(
                1, v if isinstance(v, bytes) else v.encode("utf-8")
            )
            for v in values
        )
        return _len_delimited(1, inner)
    if isinstance(v0, (float, np.floating)):
        packed = np.asarray(values, "<f4").tobytes()
        return _len_delimited(2, _len_delimited(1, packed))
    if isinstance(v0, (int, np.integer)):
        packed = b"".join(
            _varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in values
        )
        return _len_delimited(3, _len_delimited(1, packed))
    raise TypeError(f"unsupported feature value type {type(v0)}")


def build_example(features: Dict[str, FeatureValue]) -> bytes:
    """Encode {name: values} as a tf.train.Example payload."""
    entries = b"".join(
        _len_delimited(
            1,
            _len_delimited(1, name.encode("utf-8"))
            + _len_delimited(2, _encode_feature(vals)),
        )
        for name, vals in features.items()
    )
    return _len_delimited(1, entries)


# ---------------------------------------------------------------------------
# DataFrame <-> TFRecord (the reference's writer/reader contract)
# ---------------------------------------------------------------------------


def _tfrecord_paths(path_or_dir: str) -> List[str]:
    if os.path.isdir(path_or_dir):
        paths = sorted(
            glob.glob(os.path.join(path_or_dir, "*.tfrecord"))
        )
    else:
        paths = sorted(glob.glob(path_or_dir)) or [path_or_dir]
    if not any(os.path.exists(p) for p in paths):
        raise FileNotFoundError(f"no TFRecord files at {path_or_dir}")
    return paths


def tfrecords_to_dataframe(
    path_or_dir: str,
    features: Sequence[Feature],
    verify_crc: bool = True,
) -> pd.DataFrame:
    """Read reference-written TFRecord shards into a string/float/list
    DataFrame (the inverse of the reference's per-row serializer,
    ref: tfrecord_writer.py:44-53)."""
    cols: Dict[str, list] = {f.name: [] for f in features}
    for path in _tfrecord_paths(path_or_dir):
        for payload in iter_tfrecords(path, verify_crc=verify_crc):
            row = parse_example(payload)
            for f in features:
                vals = row.get(f.name, [])
                if f.kind == FeatureKind.NUMERIC:
                    cols[f.name].append(
                        float(vals[0]) if vals else np.nan
                    )
                elif f.kind == FeatureKind.SEQUENCE:
                    cols[f.name].append(
                        [
                            v.decode("utf-8")
                            if isinstance(v, bytes)
                            else str(v)
                            for v in vals
                        ]
                    )
                else:
                    v = vals[0] if vals else b""
                    cols[f.name].append(
                        v.decode("utf-8")
                        if isinstance(v, bytes)
                        else str(v)
                    )
    return pd.DataFrame(cols)


def dataframe_to_tfrecords(
    df: pd.DataFrame,
    features: Sequence[Feature],
    path_prefix: str,
    max_rows: int = 100_000,
) -> List[str]:
    """Write a DataFrame as ``{prefix}_{n}.tfrecord`` shards with the
    reference's per-feature encoding: CATEGORICAL -> single-value
    BytesList, NUMERIC -> single-value FloatList (ref:
    tfrecord_writer.py:44-53, 105-126); SEQUENCE (no reference analog)
    -> multi-value BytesList."""
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    columns = {}
    for f in features:
        if f.kind == FeatureKind.NUMERIC:
            columns[f.name] = df[f.name].to_numpy(np.float32)
        elif f.kind == FeatureKind.SEQUENCE:
            columns[f.name] = df[f.name].tolist()
        else:
            columns[f.name] = df[f.name].astype(str).to_numpy()
    paths: List[str] = []
    n = len(df)
    num_shards = max(1, -(-n // max_rows))
    for s in range(num_shards):
        lo, hi = s * max_rows, min((s + 1) * max_rows, n)
        payloads = []
        for i in range(lo, hi):
            row: Dict[str, FeatureValue] = {}
            for f in features:
                col = columns[f.name]
                if f.kind == FeatureKind.NUMERIC:
                    row[f.name] = [float(col[i])]
                elif f.kind == FeatureKind.SEQUENCE:
                    toks = col[i]
                    if toks is None or (
                        isinstance(toks, float) and np.isnan(toks)
                    ):
                        toks = []
                    row[f.name] = [str(t) for t in toks]
                else:
                    row[f.name] = [col[i]]
            payloads.append(build_example(row))
        path = f"{path_prefix}_{s}.tfrecord"
        write_tfrecords(path, payloads)
        paths.append(path)
    logger.info(
        "Wrote %d rows as %d TFRecord shard(s) at %s_*.tfrecord",
        n,
        num_shards,
        path_prefix,
    )
    return paths


# ---------------------------------------------------------------------------
# Migration: TFRecord <-> this framework's encoded npz shards
# ---------------------------------------------------------------------------


def import_tfrecords(
    path_or_dir: str,
    features: Sequence[Feature],
    out_dir: str,
    max_rows: int = 100_000,
    verify_crc: bool = True,
) -> int:
    """Migrate reference TFRecord shards into this framework's encoded
    columnar npz shards (vocab lookup applied once, here — strings never
    reach the device afterwards). Returns the shard count written."""
    df = tfrecords_to_dataframe(
        path_or_dir, features, verify_crc=verify_crc
    )
    writer = ShardWriter(list(features), max_rows=max_rows)
    return writer.write_shards(df, out_dir)


def export_shards_to_tfrecords(
    shard_dir: str,
    features: Sequence[Feature],
    path_prefix: str,
    max_rows: int = 100_000,
) -> List[str]:
    """Decode this framework's npz shards back to string tokens and
    write reference-compatible TFRecord shards (ids -> tokens via each
    feature's vocab; id 0 decodes to '<OOV>')."""
    from hm_retrieval_tpu.data.dataset import ShardDataset

    data = ShardDataset(shard_dir).load_all()
    cols = {}
    for f in features:
        arr = data[f.name]
        if f.kind == FeatureKind.NUMERIC:
            cols[f.name] = arr.astype(np.float32)
        elif f.kind == FeatureKind.SEQUENCE:
            decoded = f.decode(arr)  # (B, L) token matrix
            cols[f.name] = [
                [t for t, i in zip(row, ids) if i != 0]
                for row, ids in zip(decoded.tolist(), arr.tolist())
            ]
        else:
            cols[f.name] = f.decode(arr)
    df = pd.DataFrame(cols)
    return dataframe_to_tfrecords(
        df, features, path_prefix, max_rows=max_rows
    )
