"""Host-level tests for the signed-digit MSM grid construction.

The fused Pallas curve kernels themselves are validated on real hardware by
scripts/tpu_smoke.py (interpret mode is unusable here: one grid step of the
24-limb schoolbook product takes seconds through the Pallas interpreter).
What IS testable cheaply — and what actually regressed in round 4 — is the
host-side grid construction: with 2^c | 2^n_bits scalars the signed (wNAF)
recoding appends a carry-only top window whose bucket-1 load is ~n/2, and
including it in the shared grids blows every window's fold capacity up to
n/2 (the 2^20 signed-path compile failure).  signed_window_grids must
separate that window into `carry_idx` and keep the shared capacity at the
per-bucket scale.
"""
import random

import numpy as np

from gkr_msm_tpu.ops.msm import pippenger as msm


def test_carry_window_separated(rng):
    n, n_bits, c = 512, 32, 8
    scalars = [(1 << n_bits) - 1 - rng.randrange(1 << 30) for _ in range(n)]
    limbs = msm.scalars_ints_to_limbs(scalars)
    ab, ng = msm.scalars_to_signed_digits(limbs, c, n_bits)
    w_count = ab.shape[0]
    assert w_count == (n_bits + c) // c  # extra carry window
    grids, capacity, extras, carry_idx = msm.signed_window_grids(
        ab, ng, c, n, quantum=8
    )
    assert carry_idx is not None
    # the carry window is excluded from the shared grids...
    assert len(grids) == w_count - 1
    # ...so the shared capacity stays at per-bucket scale, NOT ~n/2
    # (multinomial max load over 2^(c-1) buckets; 8x average is generous)
    assert capacity <= max(8, 8 * n // (1 << (c - 1))), capacity
    # carry_idx = exactly the points whose top window digit is 1
    expect = np.nonzero(ab[w_count - 1] == 1)[0]
    assert np.array_equal(carry_idx, expect)
    assert carry_idx.size > 0  # scalars near 2^n_bits must produce carries


def test_carry_window_recomposition(rng):
    """grids + extras + carry recompose every scalar exactly."""
    n, n_bits, c = 64, 16, 4
    half = 1 << (c - 1)
    scalars = [rng.randrange(1 << n_bits) for _ in range(n)]
    limbs = msm.scalars_ints_to_limbs(scalars)
    ab, ng = msm.scalars_to_signed_digits(limbs, c, n_bits)
    grids, _cap, extras, carry_idx = msm.signed_window_grids(
        ab, ng, c, n, quantum=8
    )
    acc = [0] * n
    for w, grid in enumerate(grids):
        for bucket in range(grid.shape[0]):
            for slot in grid[bucket]:
                if slot == n:  # sentinel
                    continue
                if slot >= n + 1:  # negated table half
                    acc[slot - (n + 1)] -= bucket << (c * w)
                else:
                    acc[slot] += bucket << (c * w)
    if extras is not None:
        for w in range(extras.shape[0]):
            for slot in extras[w]:
                if slot == n:
                    continue
                v = half << (c * w)
                if slot >= n + 1:
                    acc[slot - (n + 1)] -= v
                else:
                    acc[slot] += v
    if carry_idx is not None:
        for i in carry_idx:
            acc[i] += 1 << (c * len(grids))
    assert acc == scalars


def test_no_carry_window_when_absent(rng):
    """Tiny scalars: the top window is all-zero; it is dropped entirely
    (empty carry_idx), not materialized as an all-sentinel grid."""
    n, n_bits, c = 32, 16, 4
    scalars = [rng.randrange(1 << 8) for _ in range(n)]
    limbs = msm.scalars_ints_to_limbs(scalars)
    ab, ng = msm.scalars_to_signed_digits(limbs, c, n_bits)
    grids, _cap, _extras, carry_idx = msm.signed_window_grids(
        ab, ng, c, n, quantum=8
    )
    assert carry_idx is not None and carry_idx.size == 0
    assert len(grids) == ab.shape[0] - 1
