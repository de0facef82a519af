"""Device Pippenger MSM over BLS12-381 G1 — the commitment workhorse.

TPU-native redesign of the reference's MSM kernels
(/root/reference/src/msm_nonaffine.rs, windowed variant :165-272): scatter
is the enemy on TPU, so the bucket accumulation is reformulated as
  1. host (numpy, integer ops): per-window digit extraction + stable
     bucket sort -> a rectangular (n_buckets, capacity) index grid
     (the sort-by-digit / segmented-reduction formulation, SURVEY.md §7.6);
  2. device: one gather + log2(capacity) rounds of batched complete
     projective additions (the VPU-shaped tree reduction);
  3. device: weighted bucket combination sum_j j*B_j via bitwise masks
     (sum_b 2^b * sum_{j: bit b} B_j), replacing the sequential
     running-sum reduction (msm_nonaffine.rs:137-144) with c parallel
     masked tree sums;
  4. device: Horner window ladder S = 2^c * S + S_w.

Works for arbitrary projective bases (the reference's msm_nonaffine
generalization comes for free from complete formulas).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import bls12381 as g1
from ..field import limbs as fl
from ..field.spec import FQ, FR

DEFAULT_C = 8  # window bits; 16-bit limbs split evenly


def _curve_ops(curve: str):
    """(add, double, neutral) for a curve tag: 'g1' (BLS12-381 G1, the
    commitment curve) or 'te' (Bandersnatch twisted Edwards, the MSM-under-
    proof curve — used for the at-scale expected-MSM cross-check)."""
    if curve == "g1":
        return g1.g1_add, g1.g1_double, g1.g1_neutral
    from ..curve import bandersnatch as bs

    return bs.te_add, bs.te_double, bs.te_neutral


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


def grid_capacity(max_c: int) -> int:
    """Physical bucket capacity for a worst-case load: TIGHT (next multiple
    of 8), not the next power of two — bucket loads are multinomial, so the
    worst bucket sits only ~3 sigma above N/2^c and a pow2 roundup wastes up
    to 2x of the dominant tree-reduce work.  The reduce loop pads odd levels
    with one neutral column instead (msm_nonaffine.rs sizes buckets exactly
    per window; this is the vectorized equivalent)."""
    return max(2, ((max_c + 7) // 8) * 8)


def bucket_index_grid(
    digits: np.ndarray, n_buckets: int, sentinel: int, capacity: int | None = None
) -> Tuple[np.ndarray, int]:
    """Stable-sort points by digit -> (n_buckets, capacity) index grid;
    empty slots hold `sentinel` (index of a neutral pad point)."""
    n = digits.shape[0]
    order = np.argsort(digits, kind="stable")
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


@functools.partial(jax.jit, static_argnums=(1, 2))
def _bucket_combine_weighted(buckets: jnp.ndarray, c: int, curve: str = "g1") -> jnp.ndarray:
    """(n_buckets, 3, L) bucket sums -> sum_j j * B_j via the running-sum
    identity sum_j j*B_j = sum_k sum_{j>=k} B_j as a lax.scan (graph stays
    O(1) adds; msm_nonaffine.rs:137-144)."""
    add, _dbl, neutral = _curve_ops(curve)

    def step(carry, bj):
        running, total = carry
        running = add(running, bj)
        total = add(total, running)
        return (running, total), None

    xs = buckets[1:][::-1]  # j = n_buckets-1 .. 1
    (_, total), _ = jax.lax.scan(step, (neutral(), neutral()), xs)
    return total


@functools.partial(jax.jit, static_argnums=(1, 2))
def _bucket_reduce_and_combine(grid_points: jnp.ndarray, c: int, curve: str = "g1") -> jnp.ndarray:
    """(n_buckets, capacity, 3, L) points -> window sum  sum_j j * B_j.

    Capacity tree-reduction is ~log2(capacity) batched adds (odd levels pad
    one neutral column), then the weighted running-sum combination."""
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


def msm_device(
    points_proj: jnp.ndarray,
    scalars_std_limbs: np.ndarray,
    c: int = DEFAULT_C,
    n_bits: int | None = None,
    curve: str = "g1",
) -> jnp.ndarray:
    """MSM of device projective points (N, 3, L) by host standard-limb scalars.

    Returns a single projective point (3, L).  Windows processed
    sequentially to bound the grid memory (one (2^c, capacity) grid live).
    """
    n = points_proj.shape[0]
    assert scalars_std_limbs.shape[0] == n
    if n_bits is None:
        n_bits = FR.bits
    from ...parallel import context as _ctx

    mesh = _ctx.get_mesh()
    if mesh is not None and curve == "g1" and _ctx.shardable(n, mesh):
        from ...parallel.sharded import sharded_msm_device

        return sharded_msm_device(mesh, points_proj, scalars_std_limbs, c, n_bits)
    _add, _dbl, neutral = _curve_ops(curve)
    digits = scalars_to_digit_matrix(scalars_std_limbs, c, n_bits)
    n_windows = digits.shape[0]
    pts_ext = jnp.concatenate([points_proj, neutral((1,))], axis=0)
    # one shared capacity across windows => a single compiled kernel
    max_c = max(
        1, int(max(np.bincount(digits[w], minlength=1 << c).max() for w in range(n_windows)))
    )
    capacity = grid_capacity(max_c)
    sums = []
    for w in range(n_windows):
        grid, _cap = bucket_index_grid(digits[w], 1 << c, n, capacity)
        grid_points = jnp.take(pts_ext, jnp.asarray(grid), axis=0)
        sums.append(_bucket_reduce_and_combine(grid_points, c, curve))
    window_sums = jnp.stack(sums)
    return _window_ladder(window_sums, c, curve)


# -----------------------------------------------------------------------------
# host-facing helpers
# -----------------------------------------------------------------------------

def encode_points_device(points_affine: Sequence) -> jnp.ndarray:
    """Host affine points (or None) -> device projective (N, 3, L)."""
    return jnp.asarray(g1.encode_affine_to_proj(list(points_affine)))


def scalars_ints_to_limbs(scalars: Sequence[int]) -> np.ndarray:
    """Python ints -> standard-form uint32[N, n_limbs] (numpy)."""
    return fl.encode_ints(FR, [s % FR.modulus for s in scalars], mont=False)


def fr_poly_to_scalar_limbs(poly_mont: jnp.ndarray) -> np.ndarray:
    """Device Montgomery Fr table (N, L) -> host standard-form limbs."""
    return np.asarray(_from_mont_jit(poly_mont))


@jax.jit
def _from_mont_jit(poly_mont: jnp.ndarray) -> jnp.ndarray:
    return fl.from_mont(FR, poly_mont)


def msm_host_result(
    points_proj: jnp.ndarray, scalars_std_limbs: np.ndarray, c: int = DEFAULT_C,
    n_bits: int | None = None,
):
    """msm_device + decode to host affine tuple (or None)."""
    out = msm_device(points_proj, scalars_std_limbs, c, n_bits)
    return g1.decode_proj(out[None])[0]
