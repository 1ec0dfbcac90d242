"""ctypes bindings for the native host-pipeline kernels (native/shardio.cpp).

Builds the shared library on first import (cached next to this file) and
degrades gracefully: when no C++ toolchain is available every entry point
reports unavailable and callers fall back to the pure-numpy/pandas path —
results are identical either way (tests/test_native_ext.py asserts it).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "native",
    "shardio.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libshardio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile(src: str, out_path: str, extra_flags=()) -> bool:
    """g++ -shared with an ATOMIC publish: compile to a temp file in
    the destination directory, then os.replace into place — concurrent
    builders (multi-host ranks, parallel pytest sessions) each produce
    a complete file and the last rename wins; a loader can never dlopen
    a half-written library."""
    import tempfile

    fd, tmp = tempfile.mkstemp(
        suffix=".so", dir=os.path.dirname(out_path)
    )
    os.close(fd)
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-std=c++17",
                "-fPIC",
                "-pthread",
                *extra_flags,
                "-shared",
                "-o",
                tmp,
                src,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, out_path)
        return True
    except Exception as e:  # toolchain missing / compile error
        logger.warning("native build of %s failed: %s", src, e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _build() -> bool:
    return _compile(_SRC, _LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native shardio load failed: %s", e)
            return None
        lib.vocab_create.restype = ctypes.c_void_p
        lib.vocab_create.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32,
        ]
        lib.vocab_destroy.argtypes = [ctypes.c_void_p]
        lib.vocab_size.restype = ctypes.c_uint32
        lib.vocab_size.argtypes = [ctypes.c_void_p]
        lib.vocab_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.vocab_create_fixed.restype = ctypes.c_void_p
        lib.vocab_create_fixed.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint32,
        ]
        lib.vocab_encode_fixed.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
        ]
        lib.gather_rows.argtypes = [
            ctypes.c_void_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.tfrecord_masked_crc.restype = ctypes.c_uint32
        lib.tfrecord_masked_crc.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
        ]
        lib.tfrecord_scan.restype = ctypes.c_int64
        lib.tfrecord_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
        ]
        lib.tfrecord_frame.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        _lib = lib
        logger.info("native shardio kernels loaded (%s)", _LIB_PATH)
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------
# _seqencode: CPython extension for the token/sequence encode hot path
# (native/seqencode.cpp). Reads Python str tokens IN PLACE (no numpy
# U/S-dtype materialization) and looks them up in a flat hash table with
# the GIL released across threads.
# ---------------------------------------------------------------------
_SEQ_SRC = os.path.join(os.path.dirname(_SRC), "seqencode.cpp")
_SEQ_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "_seqencode.so"
)
_seq_mod = None
_seq_tried = False


def _build_seq() -> bool:
    import sysconfig

    return _compile(
        _SEQ_SRC,
        _SEQ_LIB_PATH,
        extra_flags=(f"-I{sysconfig.get_paths()['include']}",),
    )


def _load_seq():
    global _seq_mod, _seq_tried
    with _lock:
        if _seq_mod is not None or _seq_tried:
            return _seq_mod
        _seq_tried = True
        if not os.path.exists(_SEQ_LIB_PATH) or (
            os.path.exists(_SEQ_SRC)
            and os.path.getmtime(_SEQ_SRC)
            > os.path.getmtime(_SEQ_LIB_PATH)
        ):
            if not os.path.exists(_SEQ_SRC) or not _build_seq():
                return None
        try:
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader(
                "_seqencode", _SEQ_LIB_PATH
            )
            spec = importlib.util.spec_from_file_location(
                "_seqencode", _SEQ_LIB_PATH, loader=loader
            )
            mod = importlib.util.module_from_spec(spec)
            loader.exec_module(mod)
        except Exception as e:
            logger.warning("native seqencode load failed: %s", e)
            return None
        _seq_mod = mod
        logger.info(
            "native seqencode extension loaded (%s)", _SEQ_LIB_PATH
        )
        return _seq_mod


def seq_available() -> bool:
    return _load_seq() is not None


class NativeSeqVocab:
    """token -> id map for the C-extension encoder; id 0 = OOV.

    Unlike NativeVocab (ctypes + fixed-width byte matrices), lookups
    read Python str objects in place — the fast path for object-dtype
    pandas columns and list-of-list history cells."""

    def __init__(self, vocab: np.ndarray):
        mod = _load_seq()
        if mod is None:
            raise RuntimeError("native seqencode unavailable")
        self._mod = mod
        fixed = _to_fixed_bytes(np.asarray(vocab, dtype=str))
        self._capsule = mod.vocab_create(
            fixed.tobytes(), fixed.dtype.itemsize, len(fixed)
        )

    def encode_sequences(
        self, rows, max_len: int
    ) -> np.ndarray:
        """Sequence of per-row token sequences -> (B, max_len) int32,
        keeping the LAST max_len tokens, right-padded 0."""
        out = np.zeros((len(rows), max_len), np.int32)
        if len(rows):
            self._mod.encode_sequences(
                self._capsule, rows, max_len, out
            )
        return out

    def encode_tokens(self, tokens) -> np.ndarray:
        """Flat sequence of tokens -> (N,) int32 ids."""
        out = np.zeros(len(tokens), np.int32)
        if len(tokens):
            self._mod.encode_tokens(self._capsule, tokens, out)
        return out


def _to_fixed_bytes(tokens: np.ndarray) -> np.ndarray:
    """str array -> contiguous fixed-width byte matrix (S dtype).
    Fast ASCII path via astype; utf-8 fallback for non-ASCII tokens."""
    try:
        fixed = tokens.astype(np.bytes_)
    except UnicodeEncodeError:
        fixed = np.char.encode(tokens, "utf-8")
    if fixed.dtype.itemsize == 0:  # all-empty edge case
        fixed = fixed.astype("S1")
    return np.ascontiguousarray(fixed)


class NativeVocab:
    """token -> id map backed by the C++ flat hash table; id 0 = OOV.

    Tokens cross the boundary as numpy fixed-width byte matrices
    (S-dtype) — conversion is vectorized C inside numpy, and the C++
    side strips the NUL padding. Tokens containing embedded NULs are
    therefore not supported (ids never do)."""

    def __init__(self, vocab: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native shardio unavailable")
        self._lib = lib
        fixed = _to_fixed_bytes(np.asarray(vocab, dtype=str))
        width = fixed.dtype.itemsize
        self._handle = lib.vocab_create_fixed(
            fixed.ctypes.data_as(ctypes.c_char_p),
            width,
            len(fixed),
        )

    def encode(
        self, tokens: np.ndarray, n_threads: int = 0
    ) -> np.ndarray:
        tokens = np.asarray(tokens, dtype=str).ravel()
        fixed = _to_fixed_bytes(tokens)
        out = np.empty(len(tokens), np.int32)
        if len(tokens):
            self._lib.vocab_encode_fixed(
                self._handle,
                fixed.ctypes.data_as(ctypes.c_char_p),
                fixed.dtype.itemsize,
                len(tokens),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n_threads,
            )
        return out

    def __len__(self):
        return int(self._lib.vocab_size(self._handle))

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.vocab_destroy(self._handle)
        except Exception:
            pass


def tfrecord_masked_crc(data: bytes) -> Optional[int]:
    """Masked CRC32C of ``data`` (TFRecord framing checksum); None when
    the native lib is unavailable (callers fall back to pure Python)."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.tfrecord_masked_crc(data, len(data)))


def tfrecord_scan(buf: bytes, verify: bool = True):
    """Scan a whole TFRecord file image: returns (offsets, lengths)
    uint64 arrays of the record payloads, or None when the native lib is
    unavailable. Raises ValueError on framing/CRC corruption."""
    lib = _load()
    if lib is None:
        return None
    # Upper bound: every record needs >= 16 framing bytes + 1 payload.
    cap = max(1, len(buf) // 16)
    offsets = np.empty(cap, np.uint64)
    lengths = np.empty(cap, np.uint64)
    n = lib.tfrecord_scan(
        buf,
        len(buf),
        1 if verify else 0,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        cap,
    )
    if n < 0:
        raise ValueError(
            f"corrupt TFRecord data at byte {-n - 1}"
        )
    return offsets[:n], lengths[:n]


def tfrecord_frame(
    payloads_blob: bytes, offsets: np.ndarray, n_threads: int = 0
) -> Optional[bytes]:
    """Frame concatenated record payloads (boundaries in ``offsets``,
    an (m+1,) uint64 array) into a full TFRecord file image; None when
    the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.uint64)
    m = len(offsets) - 1
    out = ctypes.create_string_buffer(len(payloads_blob) + 16 * m)
    lib.tfrecord_frame(
        payloads_blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        m,
        out,
        n_threads,
    )
    return out.raw


def gather_rows(
    src: np.ndarray, idx: np.ndarray, n_threads: int = 0
) -> np.ndarray:
    """Thread-parallel ``src[idx]`` for 1D/2D contiguous arrays; falls
    back to numpy fancy indexing when the native lib is unavailable."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int32)
    if lib is None:
        return src[idx]
    src = np.ascontiguousarray(src)
    row_shape = src.shape[1:]
    out = np.empty((len(idx),) + row_shape, src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(row_shape or (1,)))
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        row_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(idx),
        out.ctypes.data_as(ctypes.c_void_p),
        n_threads,
    )
    return out
