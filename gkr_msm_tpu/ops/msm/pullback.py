"""Pullback bucketed MSM:  sum_i coefs[i] * image[mapping[i]].

Port of /root/reference/src/pullback.rs:28-59: instead of a full MSM over
T[i] = image[mapping[i]], accumulate coefficients per image index (the
bucket pass) and run one small MSM against the image.  The per-image
coefficient accumulation is a vectorized per-limb numpy scatter-add
(np.add.at on 16-bit limb columns stays exact in int64: N * 2^16 < 2^63
for any realistic N) — the reference's per-thread bucket pass
(pullback.rs:40-48) without the Python-int loop.  The small MSM is the
device Pippenger.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ...ops.field.spec import FR
from . import pippenger as msm


def accumulate_coefs(m: int, mapping: Sequence[int], coefs: Sequence[int]) -> List[int]:
    """acc[j] = sum_{i: mapping[i]==j} coefs[i]  (mod r), vectorized."""
    limbs = msm.scalars_ints_to_limbs(list(coefs))  # (N, n_limbs) uint32 < 2^16
    mp = np.asarray(mapping, dtype=np.int64)
    acc = np.zeros((m, limbs.shape[1]), dtype=np.int64)
    np.add.at(acc, mp, limbs.astype(np.int64))
    out = []
    for j in range(m):
        v = 0
        for k in range(limbs.shape[1] - 1, -1, -1):
            v = (v << 16) + int(acc[j, k])
        out.append(v % FR.modulus)
    return out


def bucketed_msm(
    image_points_dev,  # (m, 3, L) device projective bases
    mapping: Sequence[int],
    coefs: Sequence[int],
):
    """sum_i coefs[i] * image[mapping[i]] -> host affine."""
    m = image_points_dev.shape[0]
    acc = accumulate_coefs(m, mapping, coefs)
    limbs = msm.scalars_ints_to_limbs(acc)
    return msm.msm_host_result(image_points_dev, limbs)
