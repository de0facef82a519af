"""Device Pippenger MSM over BLS12-381 G1 — the commitment workhorse.

TPU-native redesign of the reference's MSM kernels
(/root/reference/src/msm_nonaffine.rs, windowed variant :165-272): scatter
is the enemy on TPU, so the bucket accumulation is reformulated as
  1. host (numpy, integer ops): per-window digit extraction + stable
     bucket sort -> a rectangular (n_buckets, capacity) index grid
     (the sort-by-digit / segmented-reduction formulation, SURVEY.md §7.6);
  2. device: one gather + log2(capacity) rounds of batched complete
     projective additions (the VPU-shaped tree reduction);
  3. device: weighted bucket combination sum_j j*B_j via the bit-masked
     parallel identity  sum_j j*B_j = sum_b 2^b * (sum_{j: bit b set} B_j)
     — c independent masked tree sums, replacing the reference's inherently
     sequential running-sum reduction (msm_nonaffine.rs:137-144), which as
     a 255-step scan of single-point adds dominated the round-2 MSM
     wall-time (~30 s of the 36 s at 2^20);
  4. device: Horner window ladder S = 2^c * S + S_w.

On TPU the whole pipeline runs in **stacked-coordinate-row transposed
layout** ``uint32[3*n_limbs, M]`` with every point addition a single fused
Pallas kernel (ops/pallas/curve_kernels.py) — zero relayouts between tree
levels.  The natural-layout jnp path remains as the CPU/fallback twin and
the bit-exactness reference.

Works for arbitrary projective bases (the reference's msm_nonaffine
generalization comes for free from complete formulas).
"""
from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import bls12381 as g1
from ..field import limbs as fl
from ..field.spec import FQ, FR

DEFAULT_C = 8  # window bits; 16-bit limbs split evenly


def auto_c(n: int) -> int:
    """Size-adaptive window, the reference's `c = ln n + 2` policy
    (msm_nonaffine.rs:110-114) quantized to {2, 4, 8}: unsigned digit
    extraction needs c | 16, and every distinct c compiles its own
    bucket-combine program — the c=8 combine graph is ~200 s of XLA:CPU
    compile, ruinous when a tiny commit only has dozens of points."""
    if n >= (1 << 12):
        return 8
    if n >= (1 << 6):
        return 4
    return 2


def _curve_ops(curve: str):
    """(add, double, neutral) for a curve tag: 'g1' (BLS12-381 G1, the
    commitment curve) or 'te' (Bandersnatch twisted Edwards, the MSM-under-
    proof curve — used for the at-scale expected-MSM cross-check)."""
    if curve == "g1":
        return g1.g1_add, g1.g1_double, g1.g1_neutral
    from ..curve import bandersnatch as bs

    return bs.te_add, bs.te_double, bs.te_neutral


def _curve_spec(curve: str):
    return FQ if curve == "g1" else FR


def scalars_to_digit_matrix(scalars_std_limbs: np.ndarray, c: int, n_bits: int) -> np.ndarray:
    """uint32[N, n_limbs16] standard-form limbs -> uint32[n_windows, N] digits."""
    assert 16 % c == 0, "window size must divide 16"
    per = 16 // c
    n_windows = (n_bits + c - 1) // c
    limbs = np.asarray(scalars_std_limbs, dtype=np.uint32)
    digs = []
    for w in range(n_windows):
        limb = limbs[:, w // per]
        digs.append((limb >> (c * (w % per))) & ((1 << c) - 1))
    return np.stack(digs)


def scalars_to_signed_digits(
    scalars_std_limbs: np.ndarray, c: int, n_bits: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Signed (wNAF-style) base-2^c recoding (msm_nonaffine.rs:275-314
    make_digits, vectorized).

    Returns (abs uint32[W, N], neg bool[W, N]) with signed digits
    d_w = (-1)^neg * abs in [-2^(c-1), 2^(c-1)-1] and
    sum_w d_w 2^(c*w) == scalar.  W = ceil((n_bits+1)/c), so the top
    window absorbs the final carry (digits beyond n_bits are 0, carry <= 1).
    """
    limbs = np.asarray(scalars_std_limbs, dtype=np.uint32)
    n = limbs.shape[0]
    w_count = (n_bits + 1 + c - 1) // c
    total_bits = w_count * c
    # 16-bit limbs -> little-endian bit plane (N, total_bits)
    bytes_le = limbs.astype("<u2").view(np.uint8).reshape(n, -1)
    bits = np.unpackbits(bytes_le, axis=1, bitorder="little")
    if bits.shape[1] < total_bits:
        bits = np.pad(bits, ((0, 0), (0, total_bits - bits.shape[1])))
    bits = bits[:, :total_bits].reshape(n, w_count, c)
    weights = (1 << np.arange(c, dtype=np.int64))
    digs = (bits.astype(np.int64) * weights).sum(axis=2).T  # (W, N) unsigned
    half = 1 << (c - 1)
    out = np.empty((w_count, n), dtype=np.int64)
    carry = np.zeros(n, dtype=np.int64)
    for w in range(w_count):
        d = digs[w] + carry
        carry = (d >= half).astype(np.int64)
        out[w] = d - (carry << c)
    assert not carry.any(), "top window must absorb the carry"
    return np.abs(out).astype(np.uint32), out < 0


def signed_window_grids(
    dig_abs: np.ndarray,
    dig_neg: np.ndarray,
    c: int,
    n: int,
    capacity: int | None = None,
    quantum: int = 8,
    sentinel: int | None = None,
    neg_offset: int | None = None,
):
    """Per-window signed bucket grids over a DOUBLED point table.

    Points are gathered from a doubled table: slot i is point i, slot
    neg_offset+i its negation, slot `sentinel` the neutral pad (defaults:
    sentinel=n, neg_offset=n+1 — a (N+1 | N+1) layout).  Digit 0 and the
    asymmetric digit -2^(c-1) are excluded from the main grids; the latter
    become per-window "extras" rows (their weight is the single global bit
    c*w + c-1, which the bit-masked combine leaves free — see
    _combine_windows_t).

    The TOP window is special-cased when its digits are carry-only ({0, 1},
    always the case when c divides n_bits): its bucket-1 load is ~n/2, so
    including it in the shared grids would blow the capacity (and hence the
    fold work of EVERY window) up to n/2 — the round-4 root cause of the
    2^20 signed-path compile failure.  Instead its point indices come back
    as `carry_idx`; the caller adds their plain sum with weight
    2^(c*(W-1)) (one extra ladder lane).

    Returns (grids: List[int64[n_buckets, capacity]], capacity,
             extras: int64[W_main, cap_e] | None, carry_idx: int64[] | None)
    with n_buckets = 2^(c-1); W_main = W-1 when the carry window was
    separated (carry_idx is not None), else W.
    """
    w_count = dig_abs.shape[0]
    half = 1 << (c - 1)
    n_buckets = half
    sentinel = n if sentinel is None else sentinel
    neg_offset = n + 1 if neg_offset is None else neg_offset
    carry_idx = None
    w_main = w_count
    if (
        w_count > 1
        and int(dig_abs[w_count - 1].max(initial=0)) <= 1
        and not dig_neg[w_count - 1].any()
    ):
        carry_idx = np.nonzero(dig_abs[w_count - 1] == 1)[0].astype(np.int64)
        w_main = w_count - 1
    main_max = 1
    extra_max = 0
    for w in range(w_main):
        counts = np.bincount(dig_abs[w], minlength=half + 1)
        main_max = max(main_max, int(counts[1:half].max()) if half > 1 else 0)
        extra_max = max(extra_max, int(counts[half]))
    if capacity is None:
        capacity = grid_capacity(main_max, quantum)
    assert capacity >= main_max
    grids = []
    extras = None
    if extra_max:
        cap_e = grid_capacity(extra_max, quantum)
        extras = np.full((w_main, cap_e), sentinel, dtype=np.int64)
    for w in range(w_main):
        ab, ng = dig_abs[w], dig_neg[w]
        mapped = np.arange(n, dtype=np.int64) + np.int64(neg_offset) * ng
        main = (ab > 0) & (ab < half)
        order = _stable_argsort(np.where(main, ab, 0))
        sorted_d = np.where(main, ab, 0)[order]
        starts = np.searchsorted(sorted_d, np.arange(n_buckets))
        rank = np.arange(n) - starts[sorted_d]
        grid = np.full((n_buckets, capacity), sentinel, dtype=np.int64)
        sel = sorted_d > 0
        grid[sorted_d[sel], rank[sel]] = mapped[order][sel]
        grids.append(grid)
        if extras is not None:
            hm = np.nonzero(ab == half)[0]
            extras[w, : hm.size] = mapped[hm]
    return grids, capacity, extras, carry_idx


@functools.partial(jax.jit, static_argnums=(1,))
def _negate_points_dev(pts: jnp.ndarray, curve: str = "g1") -> jnp.ndarray:
    """-(P) for (N, 3, L) projective points: negate Y (short Weierstrass
    G1) or X (twisted Edwards)."""
    spec = _curve_spec(curve)
    coord = 1 if curve == "g1" else 0
    neg = fl.neg(spec, pts[:, coord])
    return pts.at[:, coord].set(neg)


def grid_capacity(max_c: int, quantum: int = 8) -> int:
    """Physical bucket capacity for a worst-case load: next multiple of
    `quantum`, not the next power of two — bucket loads are multinomial, so
    the worst bucket sits only ~3 sigma above N/2^c and a pow2 roundup
    wastes up to 2x of the dominant fold work (msm_nonaffine.rs sizes
    buckets exactly per window; this is the vectorized equivalent).

    The fused TPU path passes quantum=256: capacity feeds the fold kernel's
    grid size, and each distinct grid is a fresh ~60 s Mosaic compile —
    coarse quantization keeps the compiled-program cache stable across runs
    (max-load jitter between seeds is well under 256) for <=6% extra fold
    work at 2^20 and a bounded ~30 ms absolute overhead at small N."""
    return max(2, ((max_c + quantum - 1) // quantum) * quantum)


def _stable_argsort(digits: np.ndarray) -> np.ndarray:
    """Stable argsort of small-int keys (np radix path: ~0.07 s at 2^20 —
    measured faster than torch's multithreaded sort for uint8-range keys)."""
    return np.argsort(digits, kind="stable")


def bucket_index_grid(
    digits: np.ndarray, n_buckets: int, sentinel: int, capacity: int | None = None
) -> Tuple[np.ndarray, int]:
    """Stable-sort points by digit -> (n_buckets, capacity) index grid;
    empty slots hold `sentinel` (index of a neutral pad point)."""
    n = digits.shape[0]
    order = _stable_argsort(digits)
    sorted_d = digits[order]
    starts = np.searchsorted(sorted_d, np.arange(n_buckets))
    rank = np.arange(n) - starts[sorted_d]
    counts = np.bincount(digits, minlength=n_buckets)
    max_c = max(1, int(counts.max()))
    if capacity is None:
        capacity = grid_capacity(max_c)
    assert capacity >= max_c
    grid = np.full((n_buckets, capacity), sentinel, dtype=np.int64)
    grid[sorted_d, rank] = order
    return grid, capacity


def _bit_masks(c: int, n_buckets: int) -> np.ndarray:
    """bool[c, n_buckets]: mask[b, j] = bit b of bucket index j."""
    j = np.arange(n_buckets)
    return ((j[None, :] >> np.arange(c)[:, None]) & 1).astype(bool)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _bucket_combine_weighted(buckets: jnp.ndarray, c: int, curve: str = "g1") -> jnp.ndarray:
    """(n_buckets, 3, L) bucket sums -> sum_j j * B_j via the bit-masked
    parallel identity: c masked copies, one log-depth batched tree sum per
    bit, then a c-step doubling ladder.  Replaces the 2*(2^c-1)-step
    sequential running-sum scan (msm_nonaffine.rs:137-144) with O(c + log
    n_buckets) batched steps."""
    add, dbl, neutral = _curve_ops(curve)
    n_buckets = buckets.shape[0]
    mask = jnp.asarray(_bit_masks(c, n_buckets))  # (c, n_buckets)
    neut = neutral((1, 1))
    # (c, n_buckets, 3, L) masked copies
    x = jnp.where(mask[..., None, None], buckets[None], neut)
    # tree over the bucket axis (contiguous halves)
    m = n_buckets
    while m > 1:
        if m % 2:
            x = jnp.concatenate([x, neutral((c, 1))], axis=1)
            m += 1
        h = m // 2
        x = add(x[:, :h], x[:, h:m])
        m = h
    t = x[:, 0]  # (c, 3, L): per-bit sums
    acc = t[c - 1]
    for b in range(c - 2, -1, -1):
        acc = dbl(acc)
        acc = add(acc, t[b])
    return acc


@functools.partial(jax.jit, static_argnums=(1, 2))
def _bucket_reduce_and_combine(grid_points: jnp.ndarray, c: int, curve: str = "g1") -> jnp.ndarray:
    """(n_buckets, capacity, 3, L) points -> window sum  sum_j j * B_j.

    Capacity tree-reduction is ~log2(capacity) batched adds (odd levels pad
    one neutral column), then the weighted bit-masked combination."""
    add, _dbl, neutral = _curve_ops(curve)
    pts = grid_points
    while pts.shape[1] > 1:
        if pts.shape[1] % 2:
            pts = jnp.concatenate(
                [pts, neutral((pts.shape[0], 1))], axis=1
            )
        pts = add(pts[:, 0::2], pts[:, 1::2])
    return _bucket_combine_weighted(pts[:, 0], c, curve)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _window_ladder(window_sums: jnp.ndarray, c: int, curve: str = "g1") -> jnp.ndarray:
    """Horner combine: S = sum_w 2^(c*w) * S_w; window_sums (n_windows, 3, L)."""
    add, dbl, _neutral = _curve_ops(curve)

    def step(acc, sw):
        for _ in range(c):
            acc = dbl(acc)
        return add(acc, sw), None

    acc = window_sums[-1]
    rest = window_sums[:-1][::-1]
    acc, _ = jax.lax.scan(step, acc, rest)
    return acc


# -----------------------------------------------------------------------------
# fused-kernel transposed pipeline (TPU fast path)
# -----------------------------------------------------------------------------

def _msm_rows_t(
    pts_ext: jnp.ndarray,
    digits: np.ndarray,
    c: int,
    capacity: int,
    curve: str,
) -> jnp.ndarray:
    """MSM with every point op a fused Pallas kernel on stacked-row points.

    pts_ext: (N+1, 3, L) device points, slot N = neutral pad.
    Layouts: tree phase is capacity-major ``(ci, bucket)`` on lanes so each
    halving level is a contiguous-slice add; combine phase is bucket-major
    ``(bucket, bit, window)`` so the bucket tree is again contiguous.
    """
    from ...ops.pallas import curve_kernels as ck

    spec = _curve_spec(curve)
    n_windows = digits.shape[0]
    n_buckets = 1 << c
    n = pts_ext.shape[0] - 1

    pts_t = ck.to_rows_t(pts_ext)  # (3L, N+1)

    window_buckets = []  # each (3L, n_buckets)
    for w in range(n_windows):
        grid, _cap = bucket_index_grid(digits[w], n_buckets, n, capacity)
        # capacity-major flattening: lane index = ci*n_buckets + bucket
        idx = jnp.asarray(grid.T.reshape(-1), dtype=jnp.int32)
        x = _tree_levels_t(spec, pts_t, idx, n_buckets, capacity, curve)
        window_buckets.append(x)

    return _combine_windows_t(spec, window_buckets, c, curve)


@functools.partial(jax.jit, static_argnames=("spec", "n_buckets", "capacity", "curve"))
def _tree_levels_t(spec, pts_t, idx, n_buckets: int, capacity: int, curve: str):
    """Gather + grid-sequential fold on capacity-major lanes -> (3L, n_buckets).

    The fold kernel (curve_kernels.fold_t) keeps the bucket accumulator
    resident in VMEM across the whole capacity axis: one Mosaic compile per
    MSM size, instead of one per halving-tree level width."""
    from ...ops.pallas import curve_kernels as ck

    x = jnp.take(pts_t, idx, axis=1)  # (3L, capacity*n_buckets)
    return ck.fold_t(spec, x, n_buckets, curve)


@functools.partial(jax.jit, static_argnames=("spec", "c", "curve"))
def _combine_windows_t(spec, window_buckets, c: int, curve: str, extras=None,
                       carry=None):
    """Bit-masked weighted combine in global-bit layout, two fused kernels.

    window_buckets: list of (3L, n_buckets) per-window bucket sums.
    MSM total = sum_{w,j} j*2^(cw) * B[w,j] = sum_g 2^g U_g with
    U_g = sum of buckets whose weight has scalar-bit g set (g = c*w + b).
    One fold over buckets produces all U_g lanes at once; one ladder kernel
    (G-1 masked doublings + log-depth roll reduce) finishes the sum —
    replacing the former ~150-dispatch double/add chain.

    extras (signed-digit path): optional (3L, n_windows) sums of the
    asymmetric -2^(c-1) digits per window.  With n_buckets = 2^(c-1) the
    mask never sets bit c-1, so lanes g = c*w + (c-1) fold to neutral and
    the extras point-add straight into them (one batched add).

    carry (signed-digit path): optional (3L, 1) sum of the points whose
    top (carry-only) recoding window is 1; appended as one extra ladder
    lane at g = G, i.e. weight 2^(c*n_windows) — see signed_window_grids.
    Returns a natural-layout (3, L) point.
    """
    from ...ops.pallas import curve_kernels as ck

    n_windows = len(window_buckets)
    n_buckets = window_buckets[0].shape[1]
    rows = window_buckets[0].shape[0]
    # (3L, n_buckets, n_windows): bucket chunk-major, window minor
    stack = jnp.stack(window_buckets, axis=2)
    mask = _bit_masks(c, n_buckets)  # (c, n_buckets): bit b of bucket j
    # lane layout g = c*w + b -> (n_buckets, n_windows, c)
    mask_b = jnp.asarray(mask.T[None, :, None, :])  # (1, n_buckets, 1, c)
    neut_col = ck.neutral_rows_t(spec, 1, curve)[:, 0][:, None, None, None]
    x = jnp.where(mask_b, stack[:, :, :, None], neut_col)
    G = c * n_windows
    x = x.reshape(rows, n_buckets * G)  # chunk = bucket, lane g = c*w + b
    t_g = ck.fold_t(spec, x, G, curve)  # (3L, G) per-global-bit sums
    if extras is not None:
        assert n_buckets == 1 << (c - 1), "extras imply signed-digit buckets"
        cols = [c * w + (c - 1) for w in range(n_windows)]
        placed = ck.neutral_rows_t(spec, G, curve).at[:, jnp.asarray(cols)].set(
            extras
        )
        t_g = ck.add_t(spec, t_g, placed, curve)
    if carry is not None:
        t_g = jnp.concatenate([t_g, carry], axis=1)  # lane G: weight 2^G
    return ck.ladder_t(spec, t_g, curve)


def _tree_reduce_axis1(pts: jnp.ndarray, curve: str) -> jnp.ndarray:
    """(B, cap, 3, L) -> (B, 3, L) batched point tree-sum over axis 1."""
    add, _dbl, neutral = _curve_ops(curve)
    while pts.shape[1] > 1:
        if pts.shape[1] % 2:
            pts = jnp.concatenate([pts, neutral((pts.shape[0], 1))], axis=1)
        pts = add(pts[:, 0::2], pts[:, 1::2])
    return pts[:, 0]


def _msm_signed_device(
    points_proj: jnp.ndarray,
    dig_abs: np.ndarray,
    dig_neg: np.ndarray,
    c: int,
    curve: str,
) -> jnp.ndarray:
    """Signed-digit MSM core: doubled (P | -P | pad) table, 2^(c-1) buckets
    per window, asymmetric digits as single-bit extras lanes."""
    from ..pallas import curve_kernels as ck

    n = points_proj.shape[0]
    add, dbl, neutral = _curve_ops(curve)
    pts_ext = jnp.concatenate([points_proj, neutral((1,))], axis=0)
    pts2 = jnp.concatenate([pts_ext, _negate_points_dev(pts_ext, curve)], axis=0)
    spec = _curve_spec(curve)
    n_buckets = 1 << (c - 1)
    fused = ck.should_use()
    grids, capacity, extras, carry_idx = signed_window_grids(
        dig_abs, dig_neg, c, n, quantum=256 if fused else 8
    )
    w_main = len(grids)
    if fused:
        pts_t = ck.to_rows_t(pts2)
        window_buckets = []
        for grid in grids:
            idx = jnp.asarray(grid.T.reshape(-1), dtype=jnp.int32)
            window_buckets.append(
                _tree_levels_t(spec, pts_t, idx, n_buckets, capacity, curve)
            )
        extra_t = None
        if extras is not None:
            w_count, cap_e = extras.shape
            idx = jnp.asarray(extras.T.reshape(-1), dtype=jnp.int32)
            extra_t = _tree_levels_t(spec, pts_t, idx, w_count, cap_e, curve)
        carry_t = None
        if carry_idx is not None and carry_idx.size:
            carry_t = _carry_sum_t(spec, pts_t, carry_idx, n, curve)
        return _combine_windows_t(
            spec, window_buckets, c, curve, extra_t, carry_t
        )
    sums = []
    for grid in grids:
        grid_points = jnp.take(pts2, jnp.asarray(grid), axis=0)
        sums.append(_bucket_reduce_and_combine(grid_points, c, curve))
    acc = _window_ladder(jnp.stack(sums), c, curve)
    if extras is not None:
        e_pts = jnp.take(pts2, jnp.asarray(extras), axis=0)  # (W, cap_e, 3, L)
        eacc = _window_ladder(_tree_reduce_axis1(e_pts, curve), c, curve)
        for _ in range(c - 1):
            eacc = dbl(eacc)
        acc = add(acc, eacc)
    if carry_idx is not None and carry_idx.size:
        c_pts = jnp.take(pts_ext, jnp.asarray(carry_idx), axis=0)[None]
        cacc = _tree_reduce_axis1(c_pts, curve)[0]
        for _ in range(c * w_main):  # weight 2^(c*W_main)
            cacc = dbl(cacc)
        acc = add(acc, cacc)
    return acc


def _carry_sum_t(spec, pts_t, carry_idx: np.ndarray, sentinel: int, curve: str):
    """Plain point-sum of table rows `carry_idx` -> (3L, 1) stacked-row
    point: one fold into 128 equal-weight lanes + one shift-add reduce."""
    from ..pallas import curve_kernels as ck

    m = carry_idx.size
    # quantize the fold depth like every other fused grid (grid_capacity):
    # the carry count (~n/2 for random scalars) varies per scalar set, and an
    # unquantized k would compile a fresh fold program per count band
    k = grid_capacity(max(1, (m + 127) // 128), 8)
    idx = np.full(k * 128, sentinel, dtype=np.int64)
    idx[:m] = carry_idx
    partials = _tree_levels_t(
        spec, pts_t, jnp.asarray(idx, dtype=jnp.int32), 128, k, curve
    )
    return ck.sum_lanes_t(spec, partials, curve)


def msm_device(
    points_proj: jnp.ndarray,
    scalars_std_limbs: np.ndarray,
    c: int | None = None,
    n_bits: int | None = None,
    curve: str = "g1",
    signed: bool | None = None,
) -> jnp.ndarray:
    """MSM of device projective points (N, 3, L) by host standard-limb scalars.

    Returns a single projective point (3, L).  Windows processed
    sequentially to bound the grid memory (one (2^c, capacity) grid live).

    signed=True (or GKR_MSM_SIGNED=1) uses signed base-2^c recoding
    (msm_nonaffine.rs make_digits): 2^(c-1) buckets/window over a doubled
    (P | -P) table — point negation is one coordinate negate, so the
    halved bucket count is free.
    """
    n = points_proj.shape[0]
    assert scalars_std_limbs.shape[0] == n
    if c is None:
        c = auto_c(n)
    if n_bits is None:
        n_bits = FR.bits
    from ...parallel import context as _ctx

    mesh = _ctx.get_mesh()
    if mesh is not None and curve == "g1" and _ctx.shardable(n, mesh):
        from ...parallel.sharded import sharded_msm_device

        return sharded_msm_device(mesh, points_proj, scalars_std_limbs, c, n_bits)
    if signed is None:
        signed = os.environ.get("GKR_MSM_SIGNED", "0") == "1"
    if signed and c >= 2:
        dig_abs, dig_neg = scalars_to_signed_digits(scalars_std_limbs, c, n_bits)
        return _msm_signed_device(points_proj, dig_abs, dig_neg, c, curve)
    _add, _dbl, neutral = _curve_ops(curve)
    digits = scalars_to_digit_matrix(scalars_std_limbs, c, n_bits)
    n_windows = digits.shape[0]
    pts_ext = jnp.concatenate([points_proj, neutral((1,))], axis=0)
    # one shared capacity across windows => a single compiled kernel
    max_c = max(
        1, int(max(np.bincount(digits[w], minlength=1 << c).max() for w in range(n_windows)))
    )
    from ..pallas import curve_kernels as ck

    if ck.should_use():
        return _msm_rows_t(pts_ext, digits, c, grid_capacity(max_c, 256), curve)
    capacity = grid_capacity(max_c)

    sums = []
    for w in range(n_windows):
        grid, _cap = bucket_index_grid(digits[w], 1 << c, n, capacity)
        grid_points = jnp.take(pts_ext, jnp.asarray(grid), axis=0)
        sums.append(_bucket_reduce_and_combine(grid_points, c, curve))
    window_sums = jnp.stack(sums)
    return _window_ladder(window_sums, c, curve)


# -----------------------------------------------------------------------------
# packed-affine fast path (host torch gather + mixed-add device fold)
# -----------------------------------------------------------------------------

_WARNED_NO_TORCH = False


def _torch_table(arr: np.ndarray):
    """Wrap a packed table for torch's multithreaded index_select; warn ONCE
    if torch is missing — the numpy fancy-indexing fallback single-threads
    the host gather and quietly costs ~2-3x MSM throughput at 2^20
    (VERDICT r3 weak#7)."""
    global _WARNED_NO_TORCH
    try:
        import torch

        return torch.from_numpy(arr.view(np.int32))
    except Exception:
        if not _WARNED_NO_TORCH:
            _WARNED_NO_TORCH = True
            import warnings

            warnings.warn(
                "gkr_msm_tpu: torch unavailable — PackedAffineBases falls "
                "back to single-threaded numpy gathers; packed-MSM "
                "throughput will degrade",
                stacklevel=3,
            )
        return None


class PackedAffineBases:
    """Host-packed affine G1 bases for the gather-on-host TPU fast path.

    Device-side gathers are per-index DMA-bound on TPU (~5 us/row — a 2^20
    grid would take minutes), so the bucket permutation happens on HOST with
    a multithreaded torch index_select over a bit-packed (N+1, 25)-u32 table:
    12 packed-X rows (limb r | limb r+12 << 16), 12 packed-Y, one validity
    word.  Slot N is the pad target (validity 0).  ~100 MB upload per 2^20
    window at 25 u32/point vs 72 for unpacked projective.
    """

    ROWS = FQ.n_limbs + 1  # 2*(n_limbs/2) packed coord rows + validity
    _np2 = None  # lazy doubled (P | -P) table for the signed-digit path
    _torch2 = None

    def __init__(self, points_affine: Sequence):
        n = len(points_affine)
        h = FQ.n_limbs // 2
        xs = fl.encode_ints(FQ, [p[0] if p else 0 for p in points_affine])
        ys = fl.encode_ints(FQ, [p[1] if p else 1 for p in points_affine])
        arr = np.zeros((n + 1, 2 * h + 1), np.uint32)
        arr[:n, 0:h] = xs[:, :h] | (xs[:, h:] << np.uint32(16))
        arr[:n, h : 2 * h] = ys[:, :h] | (ys[:, h:] << np.uint32(16))
        arr[:n, 2 * h] = np.asarray(
            [0 if p is None else 1 for p in points_affine], np.uint32
        )
        self.n = n
        self._np = arr
        self._torch = _torch_table(arr)

    @classmethod
    def from_device_proj(cls, pts_dev: jnp.ndarray) -> "PackedAffineBases":
        """Batch-normalize device projective points -> packed host table.

        One device Fermat inverse (z^(p-2) via pow_const) + two muls for the
        whole batch, then a single D2H pull of the Montgomery limb arrays —
        avoids the per-point host normalize_proj (a bigint inverse per point,
        ~minutes at 2^20)."""
        xa, ya, valid = _normalize_proj_dev(pts_dev)
        h = FQ.n_limbs // 2
        xa_np, ya_np = np.asarray(xa), np.asarray(ya)
        vnp = np.asarray(valid)
        n = xa_np.shape[0]
        obj = cls.__new__(cls)
        arr = np.zeros((n + 1, 2 * h + 1), np.uint32)
        arr[:n, 0:h] = xa_np[:, :h] | (xa_np[:, h:] << np.uint32(16))
        arr[:n, h : 2 * h] = ya_np[:, :h] | (ya_np[:, h:] << np.uint32(16))
        arr[:n, 2 * h] = vnp.astype(np.uint32)
        # identity rows must unpack to (0:1:0) on the fallback path
        one_packed = np.asarray(FQ.one_mont[:h], np.uint32) | (
            np.asarray(FQ.one_mont[h:], np.uint32) << np.uint32(16)
        )
        arr[:n][~vnp, h : 2 * h] = one_packed
        obj.n = n
        obj._np = arr
        obj._torch = _torch_table(arr)
        return obj

    def gather(self, idx: np.ndarray) -> np.ndarray:
        """Row-gather (M, 25) u32 for a flat index vector (multithreaded)."""
        if self._torch is not None:
            import torch

            out = torch.index_select(self._torch, 0, torch.from_numpy(idx))
            return out.numpy().view(np.uint32)
        return self._np[idx]

    def _ensure_signed(self) -> None:
        """Build the doubled (P | -P) table: rows [0, n+1) unchanged, rows
        [n+1, 2(n+1)) with Y negated (affine negation is one field negate)."""
        if self._np2 is not None:
            return
        h = FQ.n_limbs // 2
        arr2 = self._np.copy()
        arr2[:, h : 2 * h] = _neg_packed_coords(arr2[:, h : 2 * h])
        self._np2 = np.concatenate([self._np, arr2], axis=0)
        if self._torch is not None:
            self._torch2 = _torch_table(self._np2)

    def gather_signed(self, idx: np.ndarray) -> np.ndarray:
        """Row-gather over the doubled (P | -P) table; idx in [0, 2(n+1))."""
        self._ensure_signed()
        if self._torch2 is not None:
            import torch

            out = torch.index_select(self._torch2, 0, torch.from_numpy(idx))
            return out.numpy().view(np.uint32)
        return self._np2[idx]


def _neg_packed_coords(packed: np.ndarray) -> np.ndarray:
    """(N, h) packed 16-bit-limb-pair field elements -> packed (p - y).

    Vectorized borrow-chain subtraction; rows equal to 0 stay 0 (p - 0 = p
    would be non-canonical)."""
    h = FQ.n_limbs // 2
    y = np.concatenate(
        [packed & np.uint32(0xFFFF), packed >> np.uint32(16)], axis=1
    ).astype(np.int64)
    p_l = np.asarray(FQ.p_limbs, np.int64)
    out = np.zeros_like(y)
    borrow = np.zeros(y.shape[0], np.int64)
    for l in range(FQ.n_limbs):
        d = p_l[l] - y[:, l] - borrow
        borrow = (d < 0).astype(np.int64)
        out[:, l] = d & 0xFFFF
    out[(y == 0).all(axis=1)] = 0
    out = out.astype(np.uint32)
    return out[:, :h] | (out[:, h:] << np.uint32(16))


_NORM_CHUNK = 1 << 16  # fixed chunk: one compiled tree, reused at any N


@jax.jit
def _normalize_chunk(pts: jnp.ndarray):
    """(m, 3, L) projective -> (x/z, y/z) mont limbs + validity (z=0 rows
    flagged invalid; their outputs are don't-care).  Inverse via the
    log-depth batch_inverse product tree (~3 muls/element), not the 380-mul
    Fermat ladder — the unrolled pow graph is uncompilable at 2^20."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    zero = fl.is_zero(FQ, z)
    ones = fl.ones_mont(FQ, z.shape[:-1])
    zi = fl.batch_inverse(FQ, fl.select(zero, ones, z))
    xa = fl.mul(FQ, x, zi)
    ya = fl.mul(FQ, y, zi)
    return xa, ya, jnp.logical_not(zero)


def _normalize_proj_dev(pts_dev: jnp.ndarray):
    """(N, 3, L) projective -> host (x/z, y/z) mont limb arrays + validity."""
    n = pts_dev.shape[0]
    chunk = min(_NORM_CHUNK, max(2, 1 << (n - 1).bit_length()))
    xs, ys, vs = [], [], []
    for i in range(0, n, chunk):
        part = pts_dev[i : i + chunk]
        if part.shape[0] < chunk:  # pad to the compiled shape
            pad = jnp.tile(g1.g1_neutral((1,)), (chunk - part.shape[0], 1, 1))
            part = jnp.concatenate([part, pad], axis=0)
        xa, ya, valid = _normalize_chunk(part)
        xs.append(np.asarray(xa))
        ys.append(np.asarray(ya))
        vs.append(np.asarray(valid))
    m = slice(0, n)
    return (
        np.concatenate(xs)[m],
        np.concatenate(ys)[m],
        np.concatenate(vs)[m],
    )


def _unpack_to_proj(packed: np.ndarray) -> np.ndarray:
    """(N, 25) packed-affine u32 -> (N, 3, L) Montgomery projective numpy."""
    h = FQ.n_limbs // 2
    n = packed.shape[0]
    out = np.zeros((n, 3, FQ.n_limbs), np.uint32)
    out[:, 0, :h] = packed[:, 0:h] & 0xFFFF
    out[:, 0, h:] = packed[:, 0:h] >> 16
    out[:, 1, :h] = packed[:, h : 2 * h] & 0xFFFF
    out[:, 1, h:] = packed[:, h : 2 * h] >> 16
    valid = packed[:, 2 * h] != 0
    one = np.asarray(FQ.one_mont, np.uint32)
    out[valid, 2, :] = one  # Z=1 for real points
    out[~valid, 1, :] = one  # identity (0:1:0)
    return out


@functools.partial(jax.jit, static_argnames=("spec",))
def _transpose_dev(spec, arr: jnp.ndarray) -> jnp.ndarray:
    return arr.T


def msm_packed(
    bases: PackedAffineBases,
    scalars_std_limbs: np.ndarray,
    c: int | None = None,
    n_bits: int | None = None,
    signed: bool | None = None,
) -> jnp.ndarray:
    """MSM over host-packed affine bases -> device projective point (3, L).

    Host pipeline per window: digit bucket-sort (numpy) -> torch row gather
    in capacity-major order -> upload; device: one fold_affine_t kernel
    (mixed adds, bucket accumulator resident in VMEM).  Host prep of window
    w+1 overlaps the device fold of window w (async dispatch).

    signed=True (or GKR_MSM_SIGNED=1): signed base-2^c digits over the
    doubled (P | -P) table — 2^(c-1) buckets/window, extras lanes for the
    asymmetric -2^(c-1) digits (see signed_window_grids).
    """
    from ..pallas import curve_kernels as ck

    if n_bits is None:
        n_bits = FR.bits
    if signed is None:
        signed = os.environ.get("GKR_MSM_SIGNED", "0") == "1"
    n = scalars_std_limbs.shape[0]  # may be a prefix of a larger SRS table
    if c is None:
        c = auto_c(n)
    assert n <= bases.n
    if not ck.should_use():  # CPU/fallback: unpack to projective, generic path
        return msm_device(
            jnp.asarray(_unpack_to_proj(bases._np[:n])), scalars_std_limbs, c,
            n_bits, signed=signed,
        )
    sentinel = bases.n  # the table's dedicated pad row (validity 0)

    import time as _time

    trace = os.environ.get("GKR_MSM_TRACE_MSM") == "1"
    tick = _time.perf_counter
    t_sort = t_gather = t_up = 0.0
    spec = _curve_spec("g1")
    window_buckets = []
    if signed and c >= 2:
        dig_abs, dig_neg = scalars_to_signed_digits(scalars_std_limbs, c, n_bits)
        n_buckets = 1 << (c - 1)
        t0 = tick()
        grids, capacity, extras, carry_idx = signed_window_grids(
            dig_abs, dig_neg, c, n, quantum=256,
            sentinel=sentinel, neg_offset=bases.n + 1,
        )
        t_sort += tick() - t0
        for grid in grids:
            idx = grid.T.reshape(-1)
            t1 = tick()
            g = bases.gather_signed(idx)
            t2 = tick()
            packed_t = _transpose_dev(spec, jnp.asarray(g))
            t3 = tick()
            t_gather += t2 - t1
            t_up += t3 - t2
            window_buckets.append(ck.fold_affine_t(spec, packed_t, n_buckets))
        extra_t = None
        if extras is not None:
            w_count = extras.shape[0]
            g = bases.gather_signed(extras.T.reshape(-1))
            packed_t = _transpose_dev(spec, jnp.asarray(g))
            extra_t = ck.fold_affine_t(spec, packed_t, w_count)
        carry_t = None
        if carry_idx is not None and carry_idx.size:
            m = carry_idx.size
            k = grid_capacity(max(1, (m + 127) // 128), 8)
            idx = np.full(k * 128, sentinel, dtype=np.int64)
            idx[:m] = carry_idx  # positive table half: row i is point i
            g = bases.gather(idx)
            packed_t = _transpose_dev(spec, jnp.asarray(g))
            carry_t = ck.sum_lanes_t(
                spec, ck.fold_affine_t(spec, packed_t, 128), "g1"
            )
        t0 = tick()
        out = _combine_windows_t(spec, window_buckets, c, "g1", extra_t, carry_t)
        if trace:
            jax.block_until_ready(out)
            print(
                f"[msm_packed signed 2^{int(np.log2(max(n,2)))}] c={c} "
                f"capacity={capacity} sort={t_sort:.2f}s gather={t_gather:.2f}s "
                f"upload+dispatch={t_up:.2f}s fold+combine(tail)={tick()-t0:.2f}s",
                flush=True,
            )
        return out
    digits = scalars_to_digit_matrix(scalars_std_limbs, c, n_bits)
    n_windows = digits.shape[0]
    n_buckets = 1 << c
    max_c = max(
        1,
        int(max(np.bincount(digits[w], minlength=n_buckets).max() for w in range(n_windows))),
    )
    capacity = grid_capacity(max_c, 256)  # cache-stable fold grid

    for w in range(n_windows):
        t0 = tick()
        grid, _cap = bucket_index_grid(digits[w], n_buckets, sentinel, capacity)
        idx = grid.T.reshape(-1)  # capacity-major (chunk = slot, lane = bucket)
        t1 = tick()
        g = bases.gather(idx)  # (M, 25) host
        t2 = tick()
        packed_t = _transpose_dev(spec, jnp.asarray(g))  # (25, M) device
        t3 = tick()
        t_sort += t1 - t0
        t_gather += t2 - t1
        t_up += t3 - t2
        window_buckets.append(ck.fold_affine_t(spec, packed_t, n_buckets))
    t0 = tick()
    out = _combine_windows_t(spec, window_buckets, c, "g1")
    if trace:
        jax.block_until_ready(out)
        print(
            f"[msm_packed 2^{int(np.log2(max(n,2)))}] capacity={capacity} "
            f"sort={t_sort:.2f}s gather={t_gather:.2f}s upload+dispatch={t_up:.2f}s "
            f"fold+combine(tail)={tick()-t0:.2f}s",
            flush=True,
        )
    return out


# -----------------------------------------------------------------------------
# device packed-affine table path (SRS resident in HBM as 25-u32 rows)
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec", "n_buckets"))
def _fold_packed_dev(
    spec, table_dev: jnp.ndarray, idx: jnp.ndarray, n_buckets: int
) -> jnp.ndarray:
    """Device gather of packed-affine rows + mixed-add fold -> (3L, n_buckets).

    table_dev: (rows, 25) u32 packed-affine table (PackedAffineBases layout,
    incl. the validity-0 pad row); idx: (capacity * n_buckets,) capacity-major
    flat indices.  Gathers 25 u32/point (vs 72 for projective) and folds with
    the mixed-add kernel (11 muls vs 12) — the device-side equivalent of the
    host-gather msm_packed path, with no host I/O beyond the index vector.
    """
    from ..pallas import curve_kernels as ck

    g = jnp.take(table_dev, idx, axis=0)  # (M, 25)
    return ck.fold_affine_t(spec, g.T, n_buckets)


def msm_table_dev(
    table_dev: jnp.ndarray,
    scalars_std_limbs: np.ndarray,
    sentinel: int,
    table2_dev: Optional[jnp.ndarray] = None,
    c: int | None = None,
    n_bits: int | None = None,
    signed: bool | None = None,
) -> jnp.ndarray:
    """MSM over a DEVICE-resident packed-affine G1 table -> projective (3, L).

    table_dev: (N+1, 25) packed-affine rows, row `sentinel` = pad (validity
    0).  table2_dev: optional doubled (P | -P) table (2(N+1), 25) for the
    signed-digit path (row sentinel+1+i = -P_i).  Requires the fused curve
    kernels (callers route here only when curve_kernels.should_use()).

    This is the TPU-native msm_nonaffine fast path for commitment MSMs: the
    SRS never leaves HBM; the host only uploads the per-window bucket-sort
    index vectors (4 bytes/slot vs 100 for host-gathered rows).
    """
    spec = FQ
    from ..pallas import curve_kernels as ck

    n = scalars_std_limbs.shape[0]
    if c is None:
        c = auto_c(n)
    if n_bits is None:
        n_bits = FR.bits
    if signed is None:
        signed = os.environ.get("GKR_MSM_SIGNED", "0") == "1"
    if signed and c >= 2 and table2_dev is not None:
        dig_abs, dig_neg = scalars_to_signed_digits(scalars_std_limbs, c, n_bits)
        n_buckets = 1 << (c - 1)
        grids, capacity, extras, carry_idx = signed_window_grids(
            dig_abs, dig_neg, c, n, quantum=256,
            sentinel=sentinel, neg_offset=sentinel + 1,
        )
        window_buckets = [
            _fold_packed_dev(
                spec, table2_dev,
                jnp.asarray(grid.T.reshape(-1), dtype=jnp.int32), n_buckets,
            )
            for grid in grids
        ]
        extra_t = None
        if extras is not None:
            extra_t = _fold_packed_dev(
                spec, table2_dev,
                jnp.asarray(extras.T.reshape(-1), dtype=jnp.int32),
                extras.shape[0],
            )
        carry_t = None
        if carry_idx is not None and carry_idx.size:
            m = carry_idx.size
            k = grid_capacity(max(1, (m + 127) // 128), 8)
            idx = np.full(k * 128, sentinel, dtype=np.int64)
            idx[:m] = carry_idx  # positive table half
            carry_t = ck.sum_lanes_t(
                spec,
                _fold_packed_dev(
                    spec, table_dev, jnp.asarray(idx, dtype=jnp.int32), 128
                ),
                "g1",
            )
        return _combine_windows_t(spec, window_buckets, c, "g1", extra_t, carry_t)
    digits = scalars_to_digit_matrix(scalars_std_limbs, c, n_bits)
    n_windows = digits.shape[0]
    n_buckets = 1 << c
    max_load = max(
        1,
        int(max(np.bincount(digits[w], minlength=n_buckets).max()
                for w in range(n_windows))),
    )
    capacity = grid_capacity(max_load, 256)
    window_buckets = []
    for w in range(n_windows):
        grid, _cap = bucket_index_grid(digits[w], n_buckets, sentinel, capacity)
        window_buckets.append(
            _fold_packed_dev(
                spec, table_dev,
                jnp.asarray(grid.T.reshape(-1), dtype=jnp.int32), n_buckets,
            )
        )
    return _combine_windows_t(spec, window_buckets, c, "g1")


# -----------------------------------------------------------------------------
# host-facing helpers
# -----------------------------------------------------------------------------

def encode_points_device(points_affine: Sequence) -> jnp.ndarray:
    """Host affine points (or None) -> device projective (N, 3, L)."""
    return jnp.asarray(g1.encode_affine_to_proj(list(points_affine)))


def scalars_ints_to_limbs(scalars: Sequence[int]) -> np.ndarray:
    """Python ints -> standard-form uint32[N, n_limbs] (numpy).

    Vectorized via a single bytes buffer (int.to_bytes is C-speed; the old
    per-int per-limb Python loop was ~60 s at 2^20)."""
    mod = FR.modulus
    nbytes = 2 * FR.n_limbs
    buf = b"".join((s % mod).to_bytes(nbytes, "little") for s in scalars)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(scalars), FR.n_limbs)
    return u16.astype(np.uint32)


def fr_poly_to_scalar_limbs(poly_mont: jnp.ndarray) -> np.ndarray:
    """Device Montgomery Fr table (N, L) -> host standard-form limbs."""
    return np.asarray(_from_mont_jit(poly_mont))


@jax.jit
def _from_mont_jit(poly_mont: jnp.ndarray) -> jnp.ndarray:
    return fl.from_mont(FR, poly_mont)


def msm_host_result(
    points_proj: jnp.ndarray, scalars_std_limbs: np.ndarray, c: int | None = None,
    n_bits: int | None = None,
):
    """msm_device + decode to host affine tuple (or None)."""
    out = msm_device(points_proj, scalars_std_limbs, c, n_bits)
    return g1.decode_proj(out[None])[0]
