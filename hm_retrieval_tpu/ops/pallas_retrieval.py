"""Pallas fused retrieval kernel: matmul + strided bin-max reduction.

The speed-of-light design for exact full-corpus top-k (SURVEY §7 hard part
#3: streaming top-k without materializing (B, N) in HBM). Per round the
kernel streams the candidate matrix once (HBM-bandwidth bound), computing
on the fly:

    for each chunk c of L candidate columns:          # grid over N/L
        scores = Q @ C_chunk^T            (MXU)       # (B, L) in VMEM
        bin b <- column c*L + b                        # strided binning
        m[b], a[b] <- running (max score, argmax) per bin, per row

so HBM traffic is just C (plus the (B, L) accumulators once), never the
(B, N) score matrix. Inside each bin, elements are totally ordered
lexicographically by (score desc, index asc); each refinement round
excludes everything >=_lex the per-bin threshold revealed by the previous
round, so round r yields every bin's exact r-th element — the total order
guarantees progress even through duplicated scores. The same leaderboard-
merge / stop-rule argument as ops/exact_topk.py applies (round max <
current k-th => every hidden element is dominated), giving EXACT top-k
VALUES in 1 + max-collision-depth rounds (3-5 in practice). Ties at the
k-th value resolve positionally (like lax.top_k), so the returned index
set is one valid exact top-k set.

Layout choices (v5e, 16MB VMEM): the whole query block (B<=1024, E<=256)
stays resident; L=512 bins keep scores + accumulators + thresholds ~12MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hm_retrieval_tpu.ops.topk import topk_pair

NEG_INF = float("-inf")  # plain python scalars: jnp constants would be
BIG_IDX = 2**31 - 1      # captured tracers inside the pallas kernel

VMEM_BUDGET = 15_000_000  # conservative v5e per-core budget (of 16MiB)

# Per-core VMEM bytes by TPU generation (device_kind substring match,
# first hit wins — "v5 lite" must precede "v5"). The 16MiB class is
# VALIDATED on real v5e hardware (every BASELINE.md kernel number); the
# 32MiB class for v5p/v6 follows the published 2x VMEM spec but is NOT
# measured here — revalidate q_block/L defaults when such hardware is
# available (the guard below still refuses infeasible configs either
# way).
_VMEM_BYTES_BY_KIND = (
    ("v5 lite", 16 * 2**20),
    ("v5e", 16 * 2**20),
    ("v5p", 32 * 2**20),
    ("v5", 32 * 2**20),
    ("v6", 32 * 2**20),
    ("v4", 16 * 2**20),
)


def vmem_budget(device=None) -> int:
    """Usable per-core VMEM budget (bytes) for kernel configs, derived
    from the queried device (~90% of capacity, leaving headroom for
    Mosaic's own buffers). Unknown kinds — including the CPU interpret
    backend — fall back to the measured v5e budget so configs stay
    portable to the validated hardware."""
    if device is None:
        try:
            device = jax.devices()[0]
        except Exception:
            return VMEM_BUDGET
    kind = (getattr(device, "device_kind", "") or "").lower()
    for key, size in _VMEM_BYTES_BY_KIND:
        if key in kind:
            return int(size * 0.9)
    return VMEM_BUDGET

# Measured optimum at N=131k/E=128/k=100 on v5e (BASELINE.md): blocks of
# 128 query rows with L=512-1024 bins beat one monolithic (1024, L=256)
# launch 2.5x — more bins per row AND per-block round early-exit.
DEFAULT_Q_BLOCK = 128


def vmem_estimate(B: int, E: int, L: int, keep_per_bin: int) -> int:
    """Rough per-core VMEM bytes: scores + thresholds(2) +
    accumulators(2 or 4) + query block + double-buffered chunk."""
    acc_bufs = 2 * keep_per_bin
    return 4 * B * L * (1 + 2 + acc_bufs) + 4 * B * E + 8 * L * E


def vmem_estimate_first(
    B: int, E: int, L: int, fold: int = 1
) -> int:
    """VMEM bytes for the threshold-FREE single-pass kernels (scores +
    4 accumulators, no threshold buffers): ~29% less than the
    refinement-round layout, which is what lets a whole B=1024 batch
    stay resident and the catalog stream ONCE. ``fold`` widens the
    score tile (and the double-buffered int8 chunk) by the tournament
    pre-reduction factor."""
    return (
        4 * B * L * (fold + 4)
        + 4 * B * E
        + 2 * 2 * fold * L * E  # int8 chunk, double-buffered
    )


def pick_bins(
    B: int,
    E: int,
    k: int,
    keep_per_bin: int = 2,
    target: int = None,
    budget: int = None,
    first_pass: bool = False,
    fold: int = 1,
) -> "int | None":
    """Lane-aligned bin count for the kernel: the smallest feasible L
    at least ``target`` (default ``4 * keep_per_bin * k``; else the
    largest feasible), or None if nothing satisfies k <= L and the
    VMEM budget (caller should fall back to the XLA exact path).
    ``budget`` defaults to the queried device's VMEM budget
    (``vmem_budget()``: 16MiB-class v5e/v4, 32MiB-class v5p/v6).
    ``first_pass`` sizes against the threshold-free single-pass layout
    (``vmem_estimate_first``).

    Rationale: per-pass cost is independent of L (the VPU work is B*N
    elements either way), while more bins mean shallower per-bin
    collisions among the true top-k and fewer refinement rounds — but
    the benefit saturates once expected collisions fit a round or two,
    and oversizing L wastes VMEM/padding: measured at
    q_block=128/N=131k/k=100, L=1024 runs 5.0ms vs 5.9ms for L=2048 and
    11.2ms for the monolithic (B=1024, L=256) launch (BASELINE.md)."""
    if budget is None:
        budget = vmem_budget()
    est = (
        (lambda b, e, l: vmem_estimate_first(b, e, l, fold))
        if first_pass
        else (lambda b, e, l: vmem_estimate(b, e, l, keep_per_bin))
    )
    feasible = [
        L
        for L in (256, 384, 512, 768, 1024, 1536, 2048)
        if L >= k and est(B, E, L) <= budget
    ]
    if not feasible:
        return None
    if target is None:
        target = 4 * keep_per_bin * k
    for L in feasible:
        if L >= target:
            return L
    return feasible[-1]


def _bin_max_kernel(
    q_ref,      # (B, E) VMEM, resident
    c_ref,      # (L, E) VMEM, current chunk
    thr_s_ref,  # (B, L) VMEM: previous round's bin score (+inf round 1)
    thr_i_ref,  # (B, L) VMEM: previous round's bin argmax (-1 round 1)
    m_ref,      # out (B, L): this round's bin maxima
    a_ref,      # out (B, L): this round's bin argmaxima
    *,
    L: int,
    n_valid: int,
):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full(m_ref.shape, NEG_INF, m_ref.dtype)
        a_ref[:] = jnp.full(a_ref.shape, BIG_IDX, a_ref.dtype)

    scores = jnp.dot(
        q_ref[:], c_ref[:].T, preferred_element_type=jnp.float32
    )  # (B, L)
    B = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    flat = col + c * L  # global candidate index per column

    # Eligible under the lexicographic order (score desc, index asc):
    # strictly below threshold, i.e. score < thr_s OR equal score with a
    # LARGER index. Round 1: thr_s=+inf accepts everything.
    thr_s = thr_s_ref[:]
    thr_i = thr_i_ref[:]
    elig = (scores < thr_s) | (
        (scores == thr_s) & (flat > thr_i)
    )
    valid = flat < n_valid
    masked = jnp.where(elig & valid, scores, NEG_INF)

    # Running lexicographic max per bin. A strict > suffices for the
    # (score desc, index asc) order: grid steps run sequentially in
    # increasing chunk order and each (row, bin) cell sees exactly one
    # candidate per chunk, so an equal-score incumbent always has the
    # smaller index and must win — which is exactly what > does. The
    # explicit (masked == m) & (flat < a) tiebreak would be dead weight
    # on the VPU (this kernel is compare/select-bound, BASELINE.md).
    m = m_ref[:]
    take = masked > m
    m_ref[:] = jnp.where(take, masked, m)
    a_ref[:] = jnp.where(take, flat, a_ref[:])


def _bin_max2_kernel(
    q_ref,      # (B, E) VMEM, resident
    c_ref,      # (L, E) VMEM, current chunk
    thr_s_ref,  # (B, L): exclusion threshold score (prev round's m2)
    thr_i_ref,  # (B, L): exclusion threshold index
    m1_ref,     # out (B, L): bin max
    a1_ref,     # out (B, L): bin argmax
    m2_ref,     # out (B, L): bin second max
    a2_ref,     # out (B, L): bin second argmax
    *,
    L: int,
    n_valid: int,
):
    """Top-2-per-bin variant: each streaming pass reveals two elements
    per bin, halving the refinement round count at ~1.3x the per-pass
    VPU cost (see BASELINE.md analysis)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    scores = jnp.dot(
        q_ref[:], c_ref[:].T, preferred_element_type=jnp.float32
    )
    B = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    flat = col + c * L

    thr_s = thr_s_ref[:]
    thr_i = thr_i_ref[:]
    elig = (scores < thr_s) | (
        (scores == thr_s) & (flat > thr_i)
    )
    valid = flat < n_valid
    s = jnp.where(elig & valid, scores, NEG_INF)

    # Strict > implements the (score desc, index asc) order here for the
    # same streaming-order reason as _bin_max_kernel: equal-score
    # incumbents always carry smaller indices. An element tying m2 is
    # dropped this pass and revealed by the next round's eligibility
    # test, preserving exactness.
    m1, a1 = m1_ref[:], a1_ref[:]
    m2, a2 = m2_ref[:], a2_ref[:]
    gt1 = s > m1
    gt2 = s > m2
    m1_ref[:] = jnp.where(gt1, s, m1)
    a1_ref[:] = jnp.where(gt1, flat, a1)
    m2_ref[:] = jnp.where(gt1, m1, jnp.where(gt2, s, m2))
    a2_ref[:] = jnp.where(gt1, a1, jnp.where(gt2, flat, a2))


def _update_top2(s, flat, m1_ref, a1_ref, m2_ref, a2_ref):
    """Running lexicographic top-2 per (row, bin) cell; strict >
    implements the (score desc, index asc) order because streaming is
    in increasing chunk order (see _bin_max_kernel's comment)."""
    m1, a1 = m1_ref[:], a1_ref[:]
    m2, a2 = m2_ref[:], a2_ref[:]
    gt1 = s > m1
    gt2 = s > m2
    m1_ref[:] = jnp.where(gt1, s, m1)
    a1_ref[:] = jnp.where(gt1, flat, a1)
    m2_ref[:] = jnp.where(gt1, m1, jnp.where(gt2, s, m2))
    a2_ref[:] = jnp.where(gt1, a1, jnp.where(gt2, flat, a2))


def _bin_max2_first_kernel(
    q_ref,      # (B, E) VMEM, resident
    c_ref,      # (L, E) VMEM, current chunk
    m1_ref,
    a1_ref,
    m2_ref,
    a2_ref,
    *,
    L: int,
    n_valid: int,
):
    """First-pass specialization of _bin_max2_kernel: round 1's
    thresholds are +inf/-1 (everything eligible), so the eligibility
    compare/or chain — ~1/3 of the per-element VPU ops in this
    compare/select-bound kernel — and the two (B, L) threshold inputs
    are dropped entirely."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    scores = jnp.dot(
        q_ref[:], c_ref[:].T, preferred_element_type=jnp.float32
    )
    B = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    flat = col + c * L
    s = jnp.where(flat < n_valid, scores, NEG_INF)
    _update_top2(s, flat, m1_ref, a1_ref, m2_ref, a2_ref)


def _bin_max2_scaled_first_kernel(
    q_ref,      # (B, E) VMEM, resident (compute dtype)
    c_ref,      # (L, E) VMEM, current chunk — int8 codes
    s_ref,      # (1, L) VMEM: per-row dequantization scales
    b_ref,      # (1, L) VMEM: per-row additive score bias (0 / -inf)
    m1_ref,
    a1_ref,
    m2_ref,
    a2_ref,
    *,
    L: int,
    n_valid: int,
):
    """First-pass specialization of _bin_max2_scaled_kernel (no
    threshold eligibility test — round 1 accepts everything valid).
    This is the ENTIRE kernel cost of the production quantized path
    (pallas_rounds=1)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    codes = c_ref[:].astype(q_ref.dtype)
    scores = (
        jnp.dot(
            q_ref[:], codes.T, preferred_element_type=jnp.float32
        )
        * s_ref[0, :][None, :]
        + b_ref[0, :][None, :]
    )
    B = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    flat = col + c * L
    s = jnp.where(flat < n_valid, scores, NEG_INF)
    _update_top2(s, flat, m1_ref, a1_ref, m2_ref, a2_ref)


def _bin_max2_scaled_nomask_kernel(
    q_ref,      # (B, E) VMEM, resident (compute dtype)
    c_ref,      # (L, E) VMEM, current chunk — int8 codes
    s_ref,      # (1, L) VMEM: per-row dequantization scales
    b_ref,      # (1, L) VMEM: bias, -inf on EVERY invalid/pad row
    m1_ref,
    a1_ref,
    m2_ref,
    a2_ref,
    *,
    L: int,
):
    """Leanest form of the single-pass survivor kernel: validity and
    padding are encoded as -inf in the bias row by the DRIVER, so the
    per-element eligibility chain (iota compare + where) disappears and
    the bias rides the dequantization FMA. This kernel is
    compare/select-bound (BASELINE.md), so every dropped per-element op
    is throughput."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    codes = c_ref[:].astype(q_ref.dtype)
    scores = (
        jnp.dot(
            q_ref[:], codes.T, preferred_element_type=jnp.float32
        )
        * s_ref[0, :][None, :]
        + b_ref[0, :][None, :]
    )
    # Track the CHUNK id (a scalar splat) instead of the per-element
    # global index: each (row, bin) cell sees exactly one candidate per
    # chunk, so global index = chunk * L + bin is reconstructible from
    # the output position — this deletes the per-element iota + add
    # from a compare/select-bound inner loop, and the argmax selects
    # take a splat operand.
    m1, a1 = m1_ref[:], a1_ref[:]
    m2, a2 = m2_ref[:], a2_ref[:]
    gt1 = scores > m1
    gt2 = scores > m2
    m1_ref[:] = jnp.where(gt1, scores, m1)
    a1_ref[:] = jnp.where(gt1, c, a1)
    m2_ref[:] = jnp.where(gt1, m1, jnp.where(gt2, scores, m2))
    a2_ref[:] = jnp.where(gt1, a1, jnp.where(gt2, c, a2))


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def bin_max2_scaled_single_pass(
    q: jax.Array,           # (B, E) compute dtype
    codes_padded: jax.Array,  # (N_pad, E) int8
    scales_row: jax.Array,  # (1, N_pad)
    bias_row: jax.Array,    # (1, N_pad), -inf on every invalid row
    L: int,
    interpret: bool = False,
):
    """One streaming pass over the int8 catalog with NO per-element
    validity mask (driver encodes it in ``bias_row``) and no threshold
    buffers — the minimal-VMEM layout (vmem_estimate_first) that lets a
    full B=1024 batch stay resident so the catalog streams ONCE. The
    kernel records chunk ids; global indices are reconstructed here
    (``chunk * L + bin``)."""
    B, E = q.shape
    n_pad = codes_padded.shape[0]
    assert n_pad % L == 0
    grid = (n_pad // L,)
    bl = lambda c: (0, 0)  # noqa: E731
    m1, a1c, m2, a2c = pl.pallas_call(
        functools.partial(_bin_max2_scaled_nomask_kernel, L=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, E), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * E,
            bytes_accessed=n_pad * E + 4 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, codes_padded, scales_row, bias_row)
    col = jnp.arange(L, dtype=jnp.int32)[None, :]

    def globalize(ac):
        # never-filled slots keep the BIG_IDX sentinel
        return jnp.where(ac == BIG_IDX, BIG_IDX, ac * L + col)

    return m1, globalize(a1c), m2, globalize(a2c)


def _bin_max2_scaled_fold_kernel(
    q_ref,      # (B, E) VMEM, resident (compute dtype)
    c_ref,      # (F*L, E) VMEM, current chunk — int8 codes
    s_ref,      # (1, F*L) VMEM: per-row dequantization scales
    b_ref,      # (1, F*L) VMEM: bias, -inf on EVERY invalid/pad row
    m1_ref,
    a1_ref,
    m2_ref,
    a2_ref,
    *,
    L: int,
    F: int,
):
    """Fold-by-F tournament variant of the single-pass kernel: the
    (B, F*L) score tile is max-reduced F->1 per bin BEFORE the top-2
    cascade, so the expensive per-element cascade (2 compares + 6
    selects) runs on 1/F of the elements at the cost of one
    compare+max+select per fold step. This kernel is VPU-bound
    (BASELINE.md roofline), so ops/element IS the wall clock.

    Semantics: survivors become "top-2 per bin of the per-(chunk, bin)
    fold maxima" — two true top-k items are only both lost if they land
    in the SAME (chunk, bin) cell of F columns, probability
    ~k^2 * F / (2N) (~0.2% of queries at k=100, F=4, N=10M), an order
    below the bin-collision loss the rescore already absorbs.

    Tile column j holds catalog row chunk*F*L + j; bin = j % L, fold
    slot = j // L; a stores (chunk*F + slot), globalized by the caller
    as a*L + bin."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    codes = c_ref[:].astype(q_ref.dtype)
    scores = (
        jnp.dot(
            q_ref[:], codes.T, preferred_element_type=jnp.float32
        )
        * s_ref[0, :][None, :]
        + b_ref[0, :][None, :]
    )  # (B, F*L)
    s = scores[:, :L]
    slot = jnp.zeros(s.shape, jnp.int32)
    for t in range(1, F):
        st = scores[:, t * L: (t + 1) * L]
        take = st > s
        s = jnp.where(take, st, s)
        slot = jnp.where(take, t, slot)

    base = c * F
    m1, a1 = m1_ref[:], a1_ref[:]
    m2, a2 = m2_ref[:], a2_ref[:]
    gt1 = s > m1
    gt2 = s > m2
    sid = base + slot
    m1_ref[:] = jnp.where(gt1, s, m1)
    a1_ref[:] = jnp.where(gt1, sid, a1)
    m2_ref[:] = jnp.where(gt1, m1, jnp.where(gt2, s, m2))
    a2_ref[:] = jnp.where(gt1, a1, jnp.where(gt2, sid, a2))


@functools.partial(
    jax.jit, static_argnames=("L", "F", "interpret")
)
def bin_max2_scaled_fold_pass(
    q: jax.Array,           # (B, E) compute dtype
    codes_padded: jax.Array,  # (N_pad, E) int8, N_pad % (F*L) == 0
    scales_row: jax.Array,  # (1, N_pad)
    bias_row: jax.Array,    # (1, N_pad), -inf on every invalid row
    L: int,
    F: int,
    interpret: bool = False,
):
    """Single streaming pass with fold-by-F tournament pre-reduction
    (see _bin_max2_scaled_fold_kernel). Returns globalized indices."""
    B, E = q.shape
    n_pad = codes_padded.shape[0]
    assert n_pad % (F * L) == 0
    grid = (n_pad // (F * L),)
    bl = lambda c: (0, 0)  # noqa: E731
    m1, a1c, m2, a2c = pl.pallas_call(
        functools.partial(
            _bin_max2_scaled_fold_kernel, L=L, F=F
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (F * L, E),
                lambda c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, F * L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, F * L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * E,
            bytes_accessed=n_pad * E + 4 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, codes_padded, scales_row, bias_row)
    col = jnp.arange(L, dtype=jnp.int32)[None, :]

    def globalize(ac):
        return jnp.where(ac == BIG_IDX, BIG_IDX, ac * L + col)

    return m1, globalize(a1c), m2, globalize(a2c)


def _bin_max2_raw_fold_kernel(
    q_ref,      # (B, E) VMEM, resident (compute dtype)
    c_ref,      # (F*L, E) VMEM, current chunk — int8 codes
    m1_ref,
    a1_ref,
    m2_ref,
    a2_ref,
    *,
    L: int,
    F: int,
):
    """GLOBAL-quantization-scale variant of the fold kernel: with one
    scale for the whole catalog, raw bf16xint8 dot products are already
    order-comparable across columns, so the per-column dequantization
    FMA — 2 VPU ops on EVERY element of the (B, F*L) score tile of this
    VPU-bound kernel (BASELINE.md roofline) — is deleted outright. The
    caller multiplies the k surviving values by the scalar scale once
    (O(B*k) work) and handles validity by streaming only full chunks of
    real rows (no per-element mask either). F=1 degenerates to the
    no-fold single pass."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    codes = c_ref[:].astype(q_ref.dtype)
    scores = jnp.dot(
        q_ref[:], codes.T, preferred_element_type=jnp.float32
    )  # (B, F*L) raw — no scale, no bias
    s = scores[:, :L]
    slot = jnp.zeros(s.shape, jnp.int32)
    for t in range(1, F):
        st = scores[:, t * L : (t + 1) * L]
        take = st > s
        s = jnp.where(take, st, s)
        slot = jnp.where(take, t, slot)

    base = c * F
    m1, a1 = m1_ref[:], a1_ref[:]
    m2, a2 = m2_ref[:], a2_ref[:]
    gt1 = s > m1
    gt2 = s > m2
    sid = base + slot
    m1_ref[:] = jnp.where(gt1, s, m1)
    a1_ref[:] = jnp.where(gt1, sid, a1)
    m2_ref[:] = jnp.where(gt1, m1, jnp.where(gt2, s, m2))
    a2_ref[:] = jnp.where(gt1, a1, jnp.where(gt2, sid, a2))


@functools.partial(
    jax.jit, static_argnames=("L", "F", "interpret")
)
def bin_max2_raw_fold_pass(
    q: jax.Array,       # (B, E) compute dtype
    codes: jax.Array,   # (n_full, E) int8, n_full % (F*L) == 0,
                        # ALL rows real (caller streams full chunks only)
    L: int,
    F: int,
    interpret: bool = False,
):
    """Single streaming pass over a full-chunks-only int8 catalog with
    NO dequantization and NO masking (see _bin_max2_raw_fold_kernel).
    Returns raw-score maxima and globalized indices."""
    B, E = q.shape
    n_full = codes.shape[0]
    assert n_full % (F * L) == 0 and n_full > 0
    grid = (n_full // (F * L),)
    bl = lambda c: (0, 0)  # noqa: E731
    m1, a1c, m2, a2c = pl.pallas_call(
        functools.partial(_bin_max2_raw_fold_kernel, L=L, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (F * L, E),
                lambda c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_full * E,
            bytes_accessed=n_full * E + 4 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, codes)
    col = jnp.arange(L, dtype=jnp.int32)[None, :]

    def globalize(ac):
        return jnp.where(ac == BIG_IDX, BIG_IDX, ac * L + col)

    return m1, globalize(a1c), m2, globalize(a2c)


def _bin_max2_scaled_kernel(
    q_ref,      # (B, E) VMEM, resident (compute dtype)
    c_ref,      # (L, E) VMEM, current chunk — int8 codes
    s_ref,      # (1, L) VMEM: per-row dequantization scales
    b_ref,      # (1, L) VMEM: per-row additive score bias (0 / -inf)
    thr_s_ref,  # (B, L)
    thr_i_ref,  # (B, L)
    m1_ref,
    a1_ref,
    m2_ref,
    a2_ref,
    *,
    L: int,
    n_valid: int,
):
    """Int8-catalog variant of _bin_max2_kernel: the chunk streams from
    HBM as int8 (4x less traffic than fp32, 2x less than bf16) and is
    dequantized to the query's compute dtype in VMEM; scores are the
    dequantized-catalog dot products (score = (codes*scale) . q + bias,
    applied as a column rescale after the MXU). The bias row carries
    -inf for rows a caller must exclude when a static n_valid cannot
    express the mask (per-shard pad rows under SPMD)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        m1_ref[:] = jnp.full(m1_ref.shape, NEG_INF, m1_ref.dtype)
        a1_ref[:] = jnp.full(a1_ref.shape, BIG_IDX, a1_ref.dtype)
        m2_ref[:] = jnp.full(m2_ref.shape, NEG_INF, m2_ref.dtype)
        a2_ref[:] = jnp.full(a2_ref.shape, BIG_IDX, a2_ref.dtype)

    codes = c_ref[:].astype(q_ref.dtype)  # VMEM dequant, VPU convert
    scores = (
        jnp.dot(
            q_ref[:], codes.T, preferred_element_type=jnp.float32
        )
        * s_ref[0, :][None, :]
        + b_ref[0, :][None, :]
    )
    B = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    flat = col + c * L

    thr_s = thr_s_ref[:]
    thr_i = thr_i_ref[:]
    elig = (scores < thr_s) | (
        (scores == thr_s) & (flat > thr_i)
    )
    valid = flat < n_valid
    s = jnp.where(elig & valid, scores, NEG_INF)

    m1, a1 = m1_ref[:], a1_ref[:]
    m2, a2 = m2_ref[:], a2_ref[:]
    gt1 = s > m1
    gt2 = s > m2
    m1_ref[:] = jnp.where(gt1, s, m1)
    a1_ref[:] = jnp.where(gt1, flat, a1)
    m2_ref[:] = jnp.where(gt1, m1, jnp.where(gt2, s, m2))
    a2_ref[:] = jnp.where(gt1, a1, jnp.where(gt2, flat, a2))


@functools.partial(
    jax.jit, static_argnames=("L", "n_valid", "interpret")
)
def bin_max2_scaled_round(
    q: jax.Array,        # (B, E) compute dtype
    codes_padded: jax.Array,  # (N_pad, E) int8, N_pad % L == 0
    scales_row: jax.Array,    # (1, N_pad) fp32
    bias_row: jax.Array,      # (1, N_pad) fp32 (0 / -inf)
    thr_s: jax.Array,
    thr_i: jax.Array,
    L: int,
    n_valid: int,
    interpret: bool = False,
):
    """One streaming pass over the int8 catalog (top-2 per bin).

    Scales/bias are (1, N_pad) row vectors blocked along the LAST axis:
    Mosaic requires a block's second-to-last dim to equal the array's
    (a (1, L) block of an (n_chunks, L) array is rejected)."""
    B, E = q.shape
    n_pad = codes_padded.shape[0]
    assert n_pad % L == 0
    grid = (n_pad // L,)
    bl = lambda c: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _bin_max2_scaled_kernel, L=L, n_valid=n_valid
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, E), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * E,
            bytes_accessed=n_pad * E + 6 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, codes_padded, scales_row, bias_row, thr_s, thr_i)


@functools.partial(
    jax.jit, static_argnames=("L", "n_valid", "interpret")
)
def bin_max2_first_round(
    q: jax.Array,
    c_padded: jax.Array,
    L: int,
    n_valid: int,
    interpret: bool = False,
):
    """Round-1 streaming pass (no thresholds): top-2 per bin of
    everything valid."""
    B, E = q.shape
    n_pad = c_padded.shape[0]
    assert n_pad % L == 0
    grid = (n_pad // L,)
    bl = lambda c: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _bin_max2_first_kernel, L=L, n_valid=n_valid
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, E), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * E,
            bytes_accessed=n_pad * E * 4 + 4 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, c_padded)


@functools.partial(
    jax.jit, static_argnames=("L", "n_valid", "interpret")
)
def bin_max2_scaled_first_round(
    q: jax.Array,
    codes_padded: jax.Array,
    scales_row: jax.Array,  # (1, N_pad)
    bias_row: jax.Array,    # (1, N_pad)
    L: int,
    n_valid: int,
    interpret: bool = False,
):
    """Round-1 streaming pass over the int8 catalog (no thresholds)."""
    B, E = q.shape
    n_pad = codes_padded.shape[0]
    assert n_pad % L == 0
    grid = (n_pad // L,)
    bl = lambda c: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _bin_max2_scaled_first_kernel, L=L, n_valid=n_valid
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, E), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, L), lambda c: (0, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * E,
            bytes_accessed=n_pad * E + 4 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, codes_padded, scales_row, bias_row)


@functools.partial(
    jax.jit, static_argnames=("L", "n_valid", "interpret")
)
def bin_max2_round(
    q: jax.Array,
    c_padded: jax.Array,
    thr_s: jax.Array,
    thr_i: jax.Array,
    L: int,
    n_valid: int,
    interpret: bool = False,
):
    """One streaming pass keeping the top-2 per bin below threshold."""
    B, E = q.shape
    n_pad = c_padded.shape[0]
    assert n_pad % L == 0
    grid = (n_pad // L,)
    bl = lambda c: (0, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(
            _bin_max2_kernel, L=L, n_valid=n_valid
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, E), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((B, L), bl, memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * E,
            bytes_accessed=n_pad * E * 4 + 6 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, c_padded, thr_s, thr_i)


@functools.partial(
    jax.jit, static_argnames=("L", "n_valid", "interpret")
)
def bin_max_round(
    q: jax.Array,       # (B, E)
    c_padded: jax.Array,  # (N_pad, E), N_pad % L == 0
    thr_s: jax.Array,   # (B, L)
    thr_i: jax.Array,   # (B, L)
    L: int,
    n_valid: int,
    interpret: bool = False,
):
    """One streaming pass: per-bin lexicographic maxima below threshold."""
    B, E = q.shape
    n_pad = c_padded.shape[0]
    assert n_pad % L == 0
    grid = (n_pad // L,)
    flops = 2 * B * n_pad * E
    return pl.pallas_call(
        functools.partial(
            _bin_max_kernel, L=L, n_valid=n_valid
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (B, E), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (L, E), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B, L), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B, L), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (B, L), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (B, L), lambda c: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_pad * E * 4 + 4 * B * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, c_padded, thr_s, thr_i)


def _topk_rounds(
    queries: jax.Array,   # (B_blk, E), already compute_dtype
    c_padded: jax.Array,  # (N_pad, E) compute_dtype, or int8 codes
    k: int,
    L: int,
    n_valid: int,
    max_rounds: int,
    interpret: bool,
    keep_per_bin: int,
    scales_row: jax.Array = None,  # (1, N_pad) fp32 for int8 catalogs
    bias_row: jax.Array = None,    # (1, N_pad) fp32, with scales_row
):
    """Refinement loop for ONE query block: streaming bin-max passes
    until every hidden element is provably below the k-th value.

    With ``scales_row`` the catalog is int8 codes dequantized in VMEM
    (``_bin_max2_scaled_kernel``); the exactness argument is unchanged
    because every pass recomputes identical fp32 scores for a given
    (row, column), so the lexicographic order the rounds refine over is
    exactly the dequantized-score order."""
    N = n_valid
    B = queries.shape[0]

    def run_round(thr_s, thr_i):
        """One streaming pass; returns (revealed values (B, RL),
        revealed indices (B, RL), next thresholds)."""
        if scales_row is not None:
            m1, a1, m2, a2 = bin_max2_scaled_round(
                queries, c_padded, scales_row, bias_row, thr_s, thr_i,
                L, N, interpret,
            )
            return (
                jnp.concatenate([m1, m2], axis=1),
                jnp.concatenate([a1, a2], axis=1),
                m2,
                a2,
            )
        if keep_per_bin == 1:
            m, a = bin_max_round(
                queries, c_padded, thr_s, thr_i, L, N, interpret
            )
            return m, a, m, a
        m1, a1, m2, a2 = bin_max2_round(
            queries, c_padded, thr_s, thr_i, L, N, interpret
        )
        vals = jnp.concatenate([m1, m2], axis=1)
        idxs = jnp.concatenate([a1, a2], axis=1)
        # next threshold = the weaker revealed element per bin
        return vals, idxs, m2, a2

    def run_first():
        """Round 1 through the threshold-free kernels (everything is
        eligible when thresholds are +inf/-1, so the eligibility chain
        — ~1/3 of the VPU ops — is compiled out; this pass is the
        ENTIRE kernel cost of the single-pass quantized path)."""
        if scales_row is not None:
            m1, a1, m2, a2 = bin_max2_scaled_first_round(
                queries, c_padded, scales_row, bias_row, L, N,
                interpret,
            )
        elif keep_per_bin == 1:
            thr_s0 = jnp.full((B, L), jnp.inf, jnp.float32)
            thr_i0 = jnp.full((B, L), -1, jnp.int32)
            return run_round(thr_s0, thr_i0)
        else:
            m1, a1, m2, a2 = bin_max2_first_round(
                queries, c_padded, L, N, interpret
            )
        return (
            jnp.concatenate([m1, m2], axis=1),
            jnp.concatenate([a1, a2], axis=1),
            m2,
            a2,
        )

    vals, idxs, thr_s, thr_i = run_first()
    lead_v, lead_i = topk_pair(vals, idxs, k)

    def hidden_dominated(nthr_s, tau_hat):
        """True iff no unrevealed element can beat the current k-th
        value: every hidden element of bin b is <=_lex that bin's next
        threshold (the weakest element the pass revealed), so its score
        is <= nthr_s[b]; max_b nthr_s[b] < tau_hat makes every hidden
        score strictly below tau (an exact-value stop — ties at tau
        cannot change the top-k VALUES). Checking thresholds instead of
        the round's revealed max makes the bound one pass tighter: the
        old rule needed an extra streaming pass purely to observe a
        round whose maximum fell below tau."""
        return jnp.all(jnp.max(nthr_s, axis=1) < tau_hat)

    done0 = hidden_dominated(thr_s, lead_v[:, k - 1])

    def cond(state):
        _, _, _, _, done, r = state
        return jnp.logical_and(~done, r < max_rounds)

    def body(state):
        lead_v, lead_i, thr_s, thr_i, _, r = state
        vals, idxs, nthr_s, nthr_i = run_round(thr_s, thr_i)

        # ONE width-(k + 2L) sort merges leaderboard + revealed
        # directly. The two-stage form (top_k(vals, k) then
        # top_k(concat(lead, cand), k)) sorted 2L + 2k elements in two
        # ops; at k=1000 the merges dominate the whole kernel
        # (width-sort-bound, k-independent — BASELINE.md), so the
        # single-sort merge is strictly less work and one fewer
        # fixed-cost sort per round.
        def merged(_):
            all_v = jnp.concatenate([lead_v, vals], axis=1)
            all_i = jnp.concatenate([lead_i, idxs], axis=1)
            return topk_pair(all_v, all_i, k)

        # Late refinement rounds often reveal nothing that beats the
        # current k-th value; a revealed element <= tau cannot change
        # the top-k VALUES (same tie semantics as the stop rule), so
        # the width sort is skipped entirely for such rounds — one
        # cheap reduction guards a ~ms-class sort.
        improved = jnp.any(vals > lead_v[:, k - 1][:, None])
        new_v, new_i = lax.cond(
            improved, merged, lambda _: (lead_v, lead_i), None
        )
        done = hidden_dominated(nthr_s, new_v[:, k - 1])
        return new_v, new_i, nthr_s, nthr_i, done, r + 1

    lead_v, lead_i, _, _, _, rounds = lax.while_loop(
        cond,
        body,
        (
            lead_v,
            lead_i,
            thr_s,
            thr_i,
            done0,
            jnp.int32(1),
        ),
    )
    return lead_v, lead_i, rounds


def _topk_rounds_lockstep(
    queries: jax.Array,   # (B, E) compute dtype, B % B_blk == 0
    c_padded: jax.Array,  # (N_pad, E) compute dtype
    k: int,
    L: int,
    n_valid: int,
    max_rounds: int,
    interpret: bool,
    B_blk: int,
):
    """Refinement loop running every query block IN LOCKSTEP so the
    per-round merges happen at FULL batch width. At large k the merge
    `lax.top_k` is width-sort-bound with a row-count-insensitive fixed
    cost (measured 0.94ms at (128, 4096) vs 1.96ms at (1024, 4096) for
    k=1000 — 4x worse per row at 128), so eight per-block merge chains
    dominate the k=1000 kernel; batching them ~4xes the merge
    throughput. The trade is per-block early exit: a deep-collision
    block forces a full-batch pass, so this variant wins only in the
    merge-bound large-k regime — IN ISOLATION. Measured end-to-end on
    v5e (k=1000: 84.9 vs 79.6ms at N=131k, 105.3 vs 103.5 at 1M) the
    variant is ~3-7% SLOWER: inside the compiled kernel the per-block
    merges do not pay the isolated-op fixed cost the microbenchmark
    showed (op costs do not compose additively under XLA scheduling —
    same lesson as the dequant-FMA epilogue, BASELINE.md), and
    lockstep forfeits per-block early exit. Kept opt-in
    (``lockstep=True``) for revalidation on other hardware; never
    auto-selected. Exactness argument identical to _topk_rounds — the
    done-test is simply AND-ed across blocks."""
    B = queries.shape[0]
    assert B % B_blk == 0
    blocks = range(0, B, B_blk)

    def run_all(thr_s, thr_i):
        outs = [
            bin_max2_round(
                queries[s : s + B_blk],
                c_padded,
                thr_s[s : s + B_blk],
                thr_i[s : s + B_blk],
                L,
                n_valid,
                interpret,
            )
            for s in blocks
        ]
        m1 = jnp.concatenate([o[0] for o in outs])
        a1 = jnp.concatenate([o[1] for o in outs])
        m2 = jnp.concatenate([o[2] for o in outs])
        a2 = jnp.concatenate([o[3] for o in outs])
        return (
            jnp.concatenate([m1, m2], axis=1),
            jnp.concatenate([a1, a2], axis=1),
            m2,
            a2,
        )

    def run_first():
        outs = [
            bin_max2_first_round(
                queries[s : s + B_blk],
                c_padded,
                L,
                n_valid,
                interpret,
            )
            for s in blocks
        ]
        m1 = jnp.concatenate([o[0] for o in outs])
        a1 = jnp.concatenate([o[1] for o in outs])
        m2 = jnp.concatenate([o[2] for o in outs])
        a2 = jnp.concatenate([o[3] for o in outs])
        return (
            jnp.concatenate([m1, m2], axis=1),
            jnp.concatenate([a1, a2], axis=1),
            m2,
            a2,
        )

    vals, idxs, thr_s, thr_i = run_first()
    lead_v, lead_i = topk_pair(vals, idxs, k)  # ONE full-width merge

    def hidden_dominated(nthr_s, tau_hat):
        return jnp.all(jnp.max(nthr_s, axis=1) < tau_hat)

    done0 = hidden_dominated(thr_s, lead_v[:, k - 1])

    def cond(state):
        _, _, _, _, done, r = state
        return jnp.logical_and(~done, r < max_rounds)

    def body(state):
        lead_v, lead_i, thr_s, thr_i, _, r = state
        vals, idxs, nthr_s, nthr_i = run_all(thr_s, thr_i)
        # single-sort merge (see _topk_rounds.body)
        all_v = jnp.concatenate([lead_v, vals], axis=1)
        all_i = jnp.concatenate([lead_i, idxs], axis=1)
        new_v, new_i = topk_pair(all_v, all_i, k)
        done = hidden_dominated(nthr_s, new_v[:, k - 1])
        return new_v, new_i, nthr_s, nthr_i, done, r + 1

    lead_v, lead_i, _, _, _, rounds = lax.while_loop(
        cond,
        body,
        (lead_v, lead_i, thr_s, thr_i, done0, jnp.int32(1)),
    )
    return lead_v, lead_i, rounds


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "L",
        "max_rounds",
        "interpret",
        "compute_dtype",
        "keep_per_bin",
        "q_block",
        "lockstep",
    ),
)
def pallas_exact_topk(
    queries: jax.Array,     # (B, E)
    candidates: jax.Array,  # (N, E)
    k: int,
    L: int = None,
    max_rounds: int = 8,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    keep_per_bin: int = 2,
    q_block: int = DEFAULT_Q_BLOCK,
    lockstep: bool = None,
):
    """Exact top-k of Q @ C^T via streaming bin-max rounds.

    ``lockstep``: run every query block's refinement in lockstep so the
    per-round merges happen at full batch width (_topk_rounds_lockstep).
    Measured SLOWER on v5e at every point tried (see its docstring) —
    default False; kept opt-in for other-hardware revalidation.

    Returns (values (B, k), indices (B, k), rounds = max over query
    blocks). Indices of padded / never-filled slots are valid candidate
    indices of lower rank (exact set semantics hold for the true top-k
    prefix).

    Large batches are processed in blocks of ``q_block`` rows, each with
    its own refinement loop. Small blocks win twice (measured 2.5x at
    B=1024/N=131k/E=128/k=100, BASELINE.md): the VMEM freed by fewer
    resident rows buys more bins L (shallower per-bin collisions among
    the true top-k), and the done-test is all-rows-done PER BLOCK, so
    one deep-collision straggler row no longer forces an extra full
    pass over every other row in the batch.
    """
    B, E = queries.shape
    N = candidates.shape[0]
    if keep_per_bin not in (1, 2):
        raise ValueError("keep_per_bin must be 1 or 2")
    B_blk = min(B, q_block) if q_block else B
    if L is None:
        L = pick_bins(B_blk, E, k, keep_per_bin)
        if L is None:
            raise ValueError(
                f"no feasible bin count for B={B_blk}, E={E}, k={k} "
                "within the VMEM budget; use the XLA exact path instead"
            )
    if k > L:
        raise ValueError(f"k={k} must be <= L={L}")
    if k > N:
        raise ValueError(f"k={k} > N={N}")
    if (
        vmem_estimate(B_blk, E, L, keep_per_bin) > vmem_budget()
        and not interpret
    ):
        # Exceeding the per-core VMEM wedges the remote Mosaic compiler
        # rather than failing cleanly — refuse up front.
        raise ValueError(
            "estimated VMEM "
            f"{vmem_estimate(B_blk, E, L, keep_per_bin)/1e6:.1f}"
            f"MB exceeds this device's budget; reduce L (got {L}) or "
            f"q_block {B_blk}"
        )
    n_pad = ((N + L - 1) // L) * L
    # bf16 operands with fp32 accumulation = XLA's default TPU matmul
    # precision for f32 inputs, at single-pass MXU speed and half the
    # HBM traffic; pass compute_dtype=jnp.float32 for full precision.
    queries = queries.astype(compute_dtype)
    c_padded = jnp.pad(
        candidates.astype(compute_dtype), ((0, n_pad - N), (0, 0))
    )

    if lockstep is None:
        lockstep = False  # measured slower at every point on v5e
    if lockstep and B > B_blk:
        if keep_per_bin != 2 or B % B_blk:
            raise ValueError(
                "lockstep needs keep_per_bin=2 and B divisible by "
                f"q_block (B={B}, q_block={B_blk})"
            )
        return _topk_rounds_lockstep(
            queries, c_padded, k, L, N, max_rounds, interpret, B_blk
        )

    vs, idxs, rounds = [], [], jnp.int32(0)
    for s in range(0, B, B_blk):
        v, i, r = _topk_rounds(
            queries[s : s + B_blk],
            c_padded,
            k,
            L,
            N,
            max_rounds,
            interpret,
            keep_per_bin,
        )
        vs.append(v)
        idxs.append(i)
        rounds = jnp.maximum(rounds, r)
    if len(vs) == 1:
        return vs[0], idxs[0], rounds
    return (
        jnp.concatenate(vs, axis=0),
        jnp.concatenate(idxs, axis=0),
        rounds,
    )


def _single_pass_policy(B, E, k, N, q_block=None, fold=None):
    """Joint (q_block, fold) auto policy for the single-pass quantized
    kernels, in measured preference order at the 10M point (BASELINE.md
    fold sweep, 2026-08-21: (256, f16) 23.5ms < (512, f8) 24.9 <
    (1024, f2) 30.7 < (1024, f1) 37.9 rescored, identical recall at
    iso-L=512). The kernel is VPU-cascade-bound, so deeper folds win as
    long as the wider score tile fits VMEM; folds are skipped for small
    catalogs where the F*L-wide chunk would be mostly padding."""
    chosen = None
    for qb_c, f_c in (
        (256, 16),
        (512, 8),
        (1024, 2),
        (1024, 1),
        (512, 1),
        (256, 1),
        (128, 1),
    ):
        if q_block is not None and q_block != qb_c:
            continue
        if fold is not None and fold != f_c:
            continue
        if f_c > 1 and f_c * max(k, 512) * 2 > N:
            continue  # fold chunk would be mostly padding
        # feasibility = the ACTUAL L pick_bins would choose for this
        # (q_block, fold) — probing a fixed L underestimates the
        # footprint when k forces a larger bin count
        if pick_bins(
            min(B, qb_c),
            E,
            k,
            keep_per_bin=2,
            target=max(k, 512),
            first_pass=True,
            fold=f_c,
        ) is not None:
            chosen = (qb_c, f_c)
            break
    if chosen is not None:
        return (
            chosen[0] if q_block is None else q_block,
            chosen[1] if fold is None else fold,
        )
    return (
        DEFAULT_Q_BLOCK if q_block is None else q_block,
        1 if fold is None else fold,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "n_valid",
        "L",
        "interpret",
        "compute_dtype",
        "q_block",
        "fold",
    ),
)
def pallas_quantized_topk_global(
    queries: jax.Array,       # (B, E) float
    codes: jax.Array,         # (N, E) int8 rows, ONE shared scale
    global_scale,             # scalar fp32 dequantization scale
    k: int,
    n_valid: int = None,
    L: int = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    q_block: int = None,
    fold: int = None,
):
    """Single-pass top-k over a GLOBALLY-quantized int8 catalog: with
    one scale for every row, raw bf16 x int8 dot products are already
    order-comparable, so the streaming kernel carries no per-column
    dequantization FMA, no bias add, and no validity mask at all
    (_bin_max2_raw_fold_kernel) — the leanest possible inner loop of
    this VPU-bound family (BASELINE.md "Remaining levers"). Full chunks
    of real rows stream through the kernel; the sub-chunk tail (fewer
    than fold*L rows) is scored by one small XLA matmul and merged into
    the leaderboard, and the k winners are scaled once at the end.

    Trade-off vs per-row scales: one scale quantizes small-norm rows
    more coarsely, so survivor recall can dip on catalogs with heavy
    row-norm spread — measure with indices/quantized.py's
    ``scale_mode="global"`` + rescore (tests/test_quantized_index.py).
    Returns (values (B, k), indices (B, k), rounds=1)."""
    B, E = queries.shape
    N = codes.shape[0]
    if n_valid is None:
        n_valid = N
    if n_valid > N:
        raise ValueError(f"n_valid={n_valid} > catalog rows {N}")
    if k > n_valid:
        raise ValueError(f"k={k} > n_valid={n_valid}")
    q_block, fold = _single_pass_policy(
        B, E, k, n_valid, q_block, fold
    )
    B_blk = min(B, q_block) if q_block else B
    if L is None:
        L = pick_bins(
            B_blk,
            E,
            k,
            keep_per_bin=2,
            target=max(k, 512),
            first_pass=True,
            fold=fold,
        )
        if L is None:
            raise ValueError(
                f"no feasible bin count for B={B_blk}, E={E}, k={k} "
                "within the VMEM budget; use the XLA scan path instead"
            )
    if k > L:
        raise ValueError(f"k={k} must be <= L={L}")
    est = vmem_estimate_first(B_blk, E, L, fold)
    if est > vmem_budget() and not interpret:
        raise ValueError(
            f"estimated VMEM {est/1e6:.1f}MB exceeds this device's "
            f"budget; reduce L (got {L}), fold ({fold}) or q_block "
            f"{B_blk}"
        )
    chunk_cols = fold * L
    n_full = (n_valid // chunk_cols) * chunk_cols
    queries = queries.astype(compute_dtype)
    codes_full = codes[:n_full]
    tail = codes[n_full:n_valid]  # (T, E), T < chunk_cols
    T = tail.shape[0]
    g = jnp.asarray(global_scale, jnp.float32)

    vs, idxs = [], []
    for s in range(0, B, B_blk):
        qb = queries[s : s + B_blk]
        vals_parts, idx_parts = [], []
        if n_full:
            m1, a1, m2, a2 = bin_max2_raw_fold_pass(
                qb, codes_full, L, fold, interpret
            )
            vals_parts += [m1, m2]
            idx_parts += [a1, a2]
        if T:
            ts = jnp.dot(
                qb,
                tail.astype(compute_dtype).T,
                preferred_element_type=jnp.float32,
            )  # (B_blk, T) raw, same scale as the kernel maxima
            ti = jnp.broadcast_to(
                n_full + jnp.arange(T, dtype=jnp.int32)[None, :],
                ts.shape,
            )
            if T > k:
                # pre-reduce the tail to its exact top-k so the final
                # merge stays O(2L + k) wide, not O(2L + chunk_cols)
                ts, ti = topk_pair(ts, ti, k)
            vals_parts.append(ts)
            idx_parts.append(ti)
        vals = jnp.concatenate(vals_parts, axis=1)
        ids = jnp.concatenate(idx_parts, axis=1)
        v, i = topk_pair(vals, ids, k)
        vs.append(v * g)  # one O(B*k) dequantization at the end
        idxs.append(i)
    if len(vs) == 1:
        return vs[0], idxs[0], jnp.int32(1)
    return (
        jnp.concatenate(vs, axis=0),
        jnp.concatenate(idxs, axis=0),
        jnp.int32(1),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k",
        "n_valid",
        "L",
        "max_rounds",
        "interpret",
        "compute_dtype",
        "q_block",
        "fold",
    ),
)
def pallas_quantized_topk(
    queries: jax.Array,  # (B, E) float
    codes: jax.Array,    # (N, E) int8 rows
    scales: jax.Array,   # (N,) fp32 per-row dequantization scales
    k: int,
    n_valid: int = None,
    bias: jax.Array = None,  # (N,) fp32 additive score bias (0 / -inf)
    L: int = None,
    max_rounds: int = 8,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    q_block: int = None,
    fold: int = None,
):
    """Exact top-k of Q @ (codes * scales)^T streaming the catalog as
    int8 — 4x less HBM traffic than fp32, 2x less than the bf16 exact
    path, with the same bin-max refinement machinery (top-2 per bin).

    "Exact" here means exact over the DEQUANTIZED scores: quantization
    error is a property of the catalog, not of this kernel. Queries stay
    in ``compute_dtype`` (bf16 by default) rather than being quantized
    to int8, so scores are strictly more accurate than an int8 x int8
    scan at identical catalog bytes.

    ``n_valid`` marks the real catalog length when ``codes`` arrives
    pre-padded (rows >= n_valid are never selected). ``bias`` is an
    additive per-row score term; -inf entries exclude rows when a
    static n_valid cannot express the mask (per-shard pads under SPMD).
    Beware: if fewer than k rows have finite bias, the unfillable tail
    slots return value -inf with index BIG_IDX — callers using a -inf
    bias must guard gathers on ``isneginf(values)``. Returns
    (values (B, k), indices (B, k), rounds).
    """
    B, E = queries.shape
    N = codes.shape[0]
    if n_valid is None:
        n_valid = N
    if n_valid > N:
        raise ValueError(f"n_valid={n_valid} > catalog rows {N}")
    if k > n_valid:
        raise ValueError(f"k={k} > n_valid={n_valid}")
    single_pass = max_rounds == 1
    if fold is not None and fold > 1 and not single_pass:
        raise ValueError(
            "fold > 1 applies to single-pass mode (max_rounds=1) only"
        )
    if single_pass:
        q_block, fold = _single_pass_policy(
            B, E, k, N, q_block, fold
        )
    if fold is None:
        fold = 1
    if q_block is None:
        q_block = DEFAULT_Q_BLOCK
    B_blk = min(B, q_block) if q_block else B
    if L is None:
        # Single-pass mode: collisions only trim the survivor margin
        # (no refinement rounds to shorten), so a moderate L suffices.
        target = max(k, 512) if single_pass else None
        L = pick_bins(
            B_blk,
            E,
            k,
            keep_per_bin=2,
            target=target,
            first_pass=single_pass,
            fold=fold,
        )
        if L is None:
            raise ValueError(
                f"no feasible bin count for B={B_blk}, E={E}, k={k} "
                "within the VMEM budget; use the XLA scan path instead"
            )
    if k > L:
        raise ValueError(f"k={k} must be <= L={L}")
    est = (
        vmem_estimate_first(B_blk, E, L, fold)
        if single_pass
        else vmem_estimate(B_blk, E, L, 2)
    )
    if est > vmem_budget() and not interpret:
        raise ValueError(
            f"estimated VMEM {est/1e6:.1f}MB exceeds this "
            f"device's budget; reduce L (got {L}), fold ({fold}) or "
            f"q_block {B_blk}"
        )
    chunk_cols = fold * L
    n_pad = ((N + chunk_cols - 1) // chunk_cols) * chunk_cols
    queries = queries.astype(compute_dtype)
    codes_p = jnp.pad(codes, ((0, n_pad - N), (0, 0)))
    scales_row = (
        jnp.pad(scales.astype(jnp.float32), (0, n_pad - N))
        .reshape(1, n_pad)
    )
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    bias_row = (
        jnp.pad(bias.astype(jnp.float32), (0, n_pad - N))
        .reshape(1, n_pad)
    )

    if single_pass:
        # validity + padding ride the bias row as -inf so the kernel
        # carries NO per-element eligibility mask (the bias add fuses
        # into the dequantization FMA)
        bias_inf = jnp.where(
            jnp.arange(n_pad)[None, :] < n_valid,
            bias_row,
            -jnp.inf,
        )
        vs, idxs = [], []
        for s in range(0, B, B_blk):
            if fold > 1:
                m1, a1, m2, a2 = bin_max2_scaled_fold_pass(
                    queries[s : s + B_blk],
                    codes_p,
                    scales_row,
                    bias_inf,
                    L,
                    fold,
                    interpret,
                )
            else:
                m1, a1, m2, a2 = bin_max2_scaled_single_pass(
                    queries[s : s + B_blk],
                    codes_p,
                    scales_row,
                    bias_inf,
                    L,
                    interpret,
                )
            v, i = topk_pair(
                jnp.concatenate([m1, m2], axis=1),
                jnp.concatenate([a1, a2], axis=1),
                k,
            )
            vs.append(v)
            idxs.append(i)
        if len(vs) == 1:
            return vs[0], idxs[0], jnp.int32(1)
        return (
            jnp.concatenate(vs, axis=0),
            jnp.concatenate(idxs, axis=0),
            jnp.int32(1),
        )

    vs, idxs, rounds = [], [], jnp.int32(0)
    for s in range(0, B, B_blk):
        v, i, r = _topk_rounds(
            queries[s : s + B_blk],
            codes_p,
            k,
            L,
            n_valid,
            max_rounds,
            interpret,
            keep_per_bin=2,
            scales_row=scales_row,
            bias_row=bias_row,
        )
        vs.append(v)
        idxs.append(i)
        rounds = jnp.maximum(rounds, r)
    if len(vs) == 1:
        return vs[0], idxs[0], rounds
    return (
        jnp.concatenate(vs, axis=0),
        jnp.concatenate(idxs, axis=0),
        rounds,
    )
