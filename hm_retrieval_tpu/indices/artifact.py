"""Index artifact IO: single-file and sharded layouts.

The reference persists its index as one SavedModel
(ref: pkg/modelling/indices/brute_force.py:85-106 via runner.py:100).
Here the single-device layout is one ``index.npz``; catalogs built by the
streaming sharded builder (indices/builder.py::place_catalog_rows) are
written as per-model-shard ``index_shard_{s:05d}.npz`` files instead, so
no process ever holds the full fp32 catalog. Both layouts carry the same
keys and concatenate to identical arrays, and every loader accepts
either — single-device loads concatenate; distributed loads stream the
shard files straight back into mesh placement.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, Iterator, List

import numpy as np

INDEX_FILE = "index.npz"
SHARD_PATTERN = "index_shard_*.npz"
_SHARD_RE = re.compile(r"index_shard_(\d+)\.npz$")


def shard_paths(dirpath: str) -> List[str]:
    """Sharded-artifact files in shard order (empty if none). Files
    matching the glob but not the numeric naming (stray backups like
    ``index_shard_old.npz``) are skipped with a warning instead of
    crashing every loader."""
    import logging

    matched, skipped = [], []
    for p in glob.glob(os.path.join(dirpath, SHARD_PATTERN)):
        m = _SHARD_RE.search(p)
        (matched if m else skipped).append((p, m))
    if skipped:
        logging.getLogger(__name__).warning(
            "ignoring non-shard files in %s: %s",
            dirpath,
            [os.path.basename(p) for p, _ in skipped],
        )
    return [
        p
        for p, _ in sorted(
            matched, key=lambda pm: int(pm[1].group(1))
        )
    ]


def shard_file(dirpath: str, s: int) -> str:
    return os.path.join(dirpath, f"index_shard_{s:05d}.npz")


def iter_shard_arrays(dirpath: str) -> Iterator[Dict[str, np.ndarray]]:
    """Yield each shard file's arrays in catalog row order. One shard is
    resident at a time — O(N/S) host memory."""
    for p in shard_paths(dirpath):
        with np.load(p) as z:
            yield {k: z[k] for k in z.files}


def clear_stale(dirpath: str, keep_shards: int = None) -> None:
    """Remove artifact files a new save will NOT overwrite, so mixed
    leftovers from a previous layout can never be read back alongside
    the new one (a sharded save after a single-file save would leave a
    stale ``index.npz`` that single-device loaders prefer; a narrower
    re-shard would leave high-numbered shard files that concatenation
    would silently append).

    ``keep_shards=None``: a single-file save follows — delete every
    shard file. ``keep_shards=S``: a sharded save of S files follows —
    delete ``index.npz`` and shards numbered >= S. Safe to call from
    the coordinator while other processes write shards < S (disjoint
    names)."""
    if not os.path.isdir(dirpath):
        return
    doomed = []
    single = os.path.join(dirpath, INDEX_FILE)
    if keep_shards is None:
        doomed = shard_paths(dirpath)
    else:
        if os.path.exists(single):
            doomed.append(single)
        doomed += [
            p
            for p in shard_paths(dirpath)
            if int(_SHARD_RE.search(p).group(1)) >= keep_shards
        ]
    for p in doomed:
        try:
            os.unlink(p)
        except OSError:
            pass


def load_index_arrays(dirpath: str) -> Dict[str, np.ndarray]:
    """The artifact's full arrays, whichever layout is on disk. The
    sharded layout is concatenated here (single-device loads need the
    whole catalog anyway)."""
    single = os.path.join(dirpath, INDEX_FILE)
    if os.path.exists(single):
        with np.load(single) as z:
            return {k: z[k] for k in z.files}
    parts: Dict[str, List[np.ndarray]] = {}
    for arrays in iter_shard_arrays(dirpath):
        for k, v in arrays.items():
            parts.setdefault(k, []).append(v)
    if not parts:
        raise FileNotFoundError(
            f"no {INDEX_FILE} or {SHARD_PATTERN} in {dirpath}"
        )
    return {k: np.concatenate(v) for k, v in parts.items()}
