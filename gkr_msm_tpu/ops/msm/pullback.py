"""Pullback bucketed MSM:  sum_i coefs[i] * image[mapping[i]].

Port of /root/reference/src/pullback.rs:28-59: instead of a full MSM over
T[i] = image[mapping[i]], accumulate coefficients per image index (the
bucket pass) and run one small MSM against the image.  On device the
per-image coefficient accumulation is a host numpy bincount (exact integer
adds after lifting to python ints mod r) and the small MSM is the device
Pippenger.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ...ops.field.spec import FR
from . import pippenger as msm


def bucketed_msm(
    image_points_dev,  # (m, 3, L) device projective bases
    mapping: Sequence[int],
    coefs: Sequence[int],
):
    """sum_i coefs[i] * image[mapping[i]] -> host affine."""
    m = image_points_dev.shape[0]
    acc = [0] * m
    for j, c in zip(mapping, coefs):
        acc[j] = (acc[j] + c) % FR.modulus
    limbs = msm.scalars_ints_to_limbs(acc)
    return msm.msm_host_result(image_points_dev, limbs)
