"""Bandersnatch twisted-Edwards curve over Fr (BLS12-381 scalar field).

Curve: a*x^2 + y^2 = 1 + d*x^2*y^2 with a = -5 and
d = 0x6389c12633c267cbc66e3bf86be3b6d8cb66677177e54f92b369f2f5188d58e7
(decoded from the reference's Montgomery-form constant,
/root/reference/src/utils.rs:34-37; equals the Bandersnatch paper's
138827208126141220649022263972958607803/171449701953573178309673572579671231137).

Device side: vectorized unified projective/affine addition split into the
same three degree-2 GKR layers as the reference
(/root/reference/src/cleanup/utils/twisted_edwards_ops.rs:10-80) — these
layer maps ARE the GKR circuit being proven, so their algebra must match
exactly.  Host side: exact Python-int model for ground truth in tests.

``mul_by_a`` is 2 doublings + add + negate (utils.rs:40-45) — ~3 cheap limb
additions instead of a full Montgomery multiply.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..field import limbs as fl
from ..field.fieldops import StdOps
from ..field.spec import FR, FieldSpec
from ..poly.algfn import AlgFn

# canonical integer constants
A_INT = FR.modulus - 5
D_INT = 0x6389C12633C267CBC66E3BF86BE3B6D8CB66677177E54F92B369F2F5188D58E7

# Bandersnatch prime-subgroup generator (matches arkworks
# ark-ed-on-bls12-381-bandersnatch).
GEN_X = 0x29C132CC2C0B34C5743711777BBE42F32B79C022AD998465E1E71866A252AE18
GEN_Y = 0x2A6C669EDA123E0F157D8B50BADCD586358CAD81EEE464605E3167B6CC974166


@functools.cache
def _d_mont() -> np.ndarray:
    return fl.encode_ints(FR, [D_INT])[0]


def mul_by_a(x: jnp.ndarray) -> jnp.ndarray:
    """-5*x as double,double,add,negate."""
    t = fl.double(FR, fl.double(FR, x))
    return fl.neg(FR, fl.add(FR, t, x))


def mul_by_d(x: jnp.ndarray) -> jnp.ndarray:
    return fl.mul_const(FR, x, _d_mont())


# -----------------------------------------------------------------------------
# GKR layer maps (twisted_edwards_ops.rs:10-80), written once against the
# field-ops protocol (ops/field/fieldops.py) so the same formulas run on
# standard-layout arrays AND on transposed values inside fused Pallas kernels.
# -----------------------------------------------------------------------------

def ops_mul_by_a(o, x):
    """-5*x as double,double,add,negate (utils.rs:40-45)."""
    return o.neg(o.add(o.double(o.double(x)), x))


def affine_l1_ops(o, args):
    x1, y1, x2, y2 = args
    return [
        o.mul(x1, y2),
        o.mul(x2, y1),
        o.sub(o.mul(y1, y2), ops_mul_by_a(o, o.mul(x1, x2))),
    ]


def affine_l2_ops(o, args):
    x1y2, x2y1, y1y2_ax1x2 = args
    return [o.add(x1y2, x2y1), y1y2_ax1x2, o.mul(x1y2, x2y1)]


def affine_l3_ops(o, args):
    x, y, xy = args
    d_xy = o.mul_const(xy, _d_mont())
    one = o.one_like(d_xy)
    m = o.sub(one, d_xy)
    p = o.add(one, d_xy)
    return [o.mul(m, x), o.mul(p, y), o.mul(m, p)]


def proj_l1_ops(o, args):
    x1, y1, z1, x2, y2, z2 = args
    return [
        o.mul(x1, y2),
        o.mul(x2, y1),
        o.sub(o.mul(y1, y2), ops_mul_by_a(o, o.mul(x1, x2))),
        o.mul(z1, z2),
    ]


def proj_l2_ops(o, args):
    x1y2, x2y1, y1y2_ax1x2, z1z2 = args
    return [
        o.mul(o.add(x1y2, x2y1), z1z2),
        o.mul(y1y2_ax1x2, z1z2),
        o.square(z1z2),
        o.mul(x1y2, x2y1),
    ]


def proj_l3_ops(o, args):
    x, y, z2, xy = args
    d_xy = o.mul_const(xy, _d_mont())
    m = o.sub(z2, d_xy)
    p = o.add(z2, d_xy)
    return [o.mul(m, x), o.mul(p, y), o.mul(m, p)]


def triangle_l1_ops(o, args):
    """12->12 diagonal step (twisted_edwards_ops.rs:67-80): inputs are four
    3-coordinate bundles [a|b|c|d_] laid out as (a,b) then (c,d_); outputs
    l1(a,c) ++ l1(b,d_) ++ l1(c,d_)."""
    assert len(args) == 12
    a = args[0:3]
    b = args[3:6]
    c = args[6:9]
    d_ = args[9:12]
    return (
        proj_l1_ops(o, list(a) + list(c))
        + proj_l1_ops(o, list(b) + list(d_))
        + proj_l1_ops(o, list(c) + list(d_))
    )


_STD = StdOps(FR)


def affine_add_l1(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return affine_l1_ops(_STD, args)


def affine_add_l2(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return affine_l2_ops(_STD, args)


def affine_add_l3(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return affine_l3_ops(_STD, args)


def proj_add_l1(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return proj_l1_ops(_STD, args)


def proj_add_l2(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return proj_l2_ops(_STD, args)


def proj_add_l3(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return proj_l3_ops(_STD, args)


def triangle_l1(args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    return triangle_l1_ops(_STD, args)


# AlgFn wrappers with the reference's (deg, n_ins, n_outs) table
# (twisted_edwards_ops.rs:151-157)
AFFINE_L1 = AlgFn(affine_add_l1, deg=2, n_ins=4, n_outs=3, name="affine_te_l1",
                  ops_fn=affine_l1_ops)
AFFINE_L2 = AlgFn(affine_add_l2, deg=2, n_ins=3, n_outs=3, name="affine_te_l2",
                  ops_fn=affine_l2_ops)
AFFINE_L3 = AlgFn(affine_add_l3, deg=2, n_ins=3, n_outs=3, name="affine_te_l3",
                  ops_fn=affine_l3_ops)
PROJ_L1 = AlgFn(proj_add_l1, deg=2, n_ins=6, n_outs=4, name="te_l1",
                ops_fn=proj_l1_ops)
PROJ_L2 = AlgFn(proj_add_l2, deg=2, n_ins=4, n_outs=4, name="te_l2",
                ops_fn=proj_l2_ops)
PROJ_L3 = AlgFn(proj_add_l3, deg=2, n_ins=4, n_outs=3, name="te_l3",
                ops_fn=proj_l3_ops)
TRIANGLE_L1 = AlgFn(triangle_l1, deg=2, n_ins=12, n_outs=12, name="triangle_te_l1",
                    ops_fn=triangle_l1_ops)


def affine_add(args):
    return affine_add_l3(affine_add_l2(affine_add_l1(args)))


def proj_add(args):
    return proj_add_l3(proj_add_l2(proj_add_l1(args)))


def te_add(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Unified projective add of stacked points uint32[..., 3, n_limbs]."""
    x = proj_add(
        [p1[..., 0, :], p1[..., 1, :], p1[..., 2, :], p2[..., 0, :], p2[..., 1, :], p2[..., 2, :]]
    )
    return jnp.stack(x, axis=-2)


def te_double(p: jnp.ndarray) -> jnp.ndarray:
    return te_add(p, p)


def te_neutral(shape=()) -> jnp.ndarray:
    """(0 : 1 : 1) in Montgomery form."""
    zero = fl.zeros(FR, shape)
    one = jnp.broadcast_to(fl.ones_mont(FR), tuple(shape) + (FR.n_limbs,))
    return jnp.stack([zero, one, one], axis=-2)


# -----------------------------------------------------------------------------
# host-side exact model (tests / ground truth)
# -----------------------------------------------------------------------------

class Host:
    """Python-int Bandersnatch model (affine coordinates + infinity-free TE)."""

    p = FR.modulus
    a = A_INT
    d = D_INT
    gen = (GEN_X, GEN_Y)
    # subgroup order
    order = 0x1CFB69D4CA675F520CCE760202687600FF8F87007419047174FD06B52876E7E1

    @classmethod
    def is_on_curve(cls, pt) -> bool:
        x, y = pt
        p = cls.p
        return (cls.a * x * x + y * y) % p == (1 + cls.d * x * x % p * y * y) % p

    @classmethod
    def add(cls, p1, p2):
        x1, y1 = p1
        x2, y2 = p2
        p = cls.p
        dxy = cls.d * x1 * x2 % p * y1 * y2 % p
        x3 = (x1 * y2 + x2 * y1) * pow(1 + dxy, -1, p) % p
        y3 = (y1 * y2 - cls.a * x1 * x2) * pow(1 - dxy, -1, p) % p
        return (x3, y3)

    @classmethod
    def neutral(cls):
        return (0, 1)

    @classmethod
    def scalar_mul(cls, k: int, pt):
        acc = cls.neutral()
        add = pt
        while k:
            if k & 1:
                acc = cls.add(acc, add)
            add = cls.add(add, add)
            k >>= 1
        return acc

    @classmethod
    def msm(cls, scalars, points):
        acc = cls.neutral()
        for k, pt in zip(scalars, points):
            acc = cls.add(acc, cls.scalar_mul(k, pt))
        return acc

    @classmethod
    def normalize_proj(cls, xyz) -> tuple:
        x, y, z = xyz
        zi = pow(z, -1, cls.p)
        return (x * zi % cls.p, y * zi % cls.p)

    @classmethod
    def random_point(cls, rng):
        k = rng.randrange(1, cls.order)
        return cls.scalar_mul(k, cls.gen)


def encode_affine_points(points) -> np.ndarray:
    """[(x,y) ints] -> uint32[n, 2, n_limbs] Montgomery."""
    xs = fl.encode_ints(FR, [p[0] for p in points])
    ys = fl.encode_ints(FR, [p[1] for p in points])
    return np.stack([xs, ys], axis=1)


def decode_proj_points(arr) -> list:
    """uint32[n, 3, n_limbs] -> [(x,y) ints] (normalized affine)."""
    arr = np.asarray(arr)
    out = []
    for row in arr:
        x, y, z = fl.decode_ints(FR, row)
        out.append(Host.normalize_proj((x, y, z)))
    return out


def encode_affine_to_proj(points) -> np.ndarray:
    """[(x,y) ints] -> uint32[n, 3, n_limbs] Montgomery projective (z=1).
    TE has no point at infinity; the neutral is the affine (0, 1)."""
    xs = fl.encode_ints(FR, [p[0] for p in points])
    ys = fl.encode_ints(FR, [p[1] for p in points])
    ones = np.broadcast_to(
        np.asarray(FR.one_mont, dtype=np.uint32), xs.shape
    ).copy()
    return np.stack([xs, ys, ones], axis=1)
