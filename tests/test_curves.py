"""Curve arithmetic vs exact host models (SURVEY.md §4.3 pattern)."""
import jax.numpy as jnp
import numpy as np
import pytest

from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.curve import bls12381 as g1
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR, FQ


def test_bandersnatch_host_model(rng):
    g = bs.Host.gen
    assert bs.Host.is_on_curve(g)
    p = bs.Host.random_point(rng)
    q = bs.Host.random_point(rng)
    s = bs.Host.add(p, q)
    assert bs.Host.is_on_curve(s)
    # order * g = neutral
    assert bs.Host.scalar_mul(bs.Host.order, g) == bs.Host.neutral()


def test_bandersnatch_device_add(rng):
    pts1 = [bs.Host.random_point(rng) for _ in range(4)]
    pts2 = [bs.Host.random_point(rng) for _ in range(4)]
    expected = [bs.Host.add(a, b) for a, b in zip(pts1, pts2)]

    # affine l1-l2-l3 composition
    P1 = jnp.asarray(bs.encode_affine_points(pts1))
    P2 = jnp.asarray(bs.encode_affine_points(pts2))
    outs = bs.affine_add([P1[:, 0], P1[:, 1], P2[:, 0], P2[:, 1]])
    got = bs.decode_proj_points(jnp.stack(outs, axis=1))
    assert got == expected

    # projective unified add on (x, y, 1)
    one = jnp.broadcast_to(fl.ones_mont(FR), P1[:, 0].shape)
    P1p = jnp.stack([P1[:, 0], P1[:, 1], one], axis=1)
    P2p = jnp.stack([P2[:, 0], P2[:, 1], one], axis=1)
    got2 = bs.decode_proj_points(bs.te_add(P1p, P2p))
    assert got2 == expected

    # doubling via unified add
    got3 = bs.decode_proj_points(bs.te_double(P1p))
    assert got3 == [bs.Host.add(a, a) for a in pts1]

    # neutral element
    got4 = bs.decode_proj_points(bs.te_add(P1p, bs.te_neutral((4,))))
    assert got4 == pts1


def test_g1_host_model(rng):
    g = g1.Host.gen
    assert g1.Host.is_on_curve(g)
    assert g1.Host.scalar_mul(g1.Host.order, g) is None
    p = g1.Host.random_point(rng)
    q = g1.Host.random_point(rng)
    assert g1.Host.is_on_curve(g1.Host.add(p, q))


def test_g1_device_complete_add(rng):
    pts1 = [g1.Host.random_point(rng) for _ in range(4)]
    pts2 = [g1.Host.random_point(rng) for _ in range(4)]
    P1 = jnp.asarray(g1.encode_affine_to_proj(pts1))
    P2 = jnp.asarray(g1.encode_affine_to_proj(pts2))

    got = g1.decode_proj(g1.g1_add(P1, P2))
    assert got == [g1.Host.add(a, b) for a, b in zip(pts1, pts2)]

    # complete: doubling through the SAME addition formula
    got_dbl = g1.decode_proj(g1.g1_add(P1, P1))
    assert got_dbl == [g1.Host.add(a, a) for a in pts1]

    # dedicated doubling
    got_dbl2 = g1.decode_proj(g1.g1_double(P1))
    assert got_dbl2 == [g1.Host.add(a, a) for a in pts1]

    # identity handling
    got_id = g1.decode_proj(g1.g1_add(P1, g1.g1_neutral((4,))))
    assert got_id == pts1

    # p + (-p) = infinity
    got_inf = g1.decode_proj(g1.g1_add(P1, g1.g1_neg(P1)))
    assert got_inf == [None] * 4
