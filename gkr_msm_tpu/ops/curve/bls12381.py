"""BLS12-381 G1 over Fq — the commitment curve for KZG.

The reference commits with arkworks ``ark_bls12_381`` G1 MSMs
(/root/reference/src/commitments/kzg.rs:123-126).  On TPU we need branch-free
vectorized point arithmetic, so we use the **complete projective formulas**
for short-Weierstrass a=0 curves (Renes–Costello–Batina 2015, Algorithms 7/9
specialised to b=4, b3=12): no doubling/identity special cases, identical
instruction stream for every lane — exactly what the VPU wants.

Host side: exact Python-int affine model (with point at infinity = None) for
ground truth; pairing lives in ``pairing.py``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..field import limbs as fl
from ..field.spec import FQ

B_INT = 4
B3_INT = 12

GEN_X = int(
    "0x17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb",
    16,
)
GEN_Y = int(
    "0x08b3f481e3aaa0f1a09e30ed741d8ae4fcf5e095d5d00af600db18cb2c04b3ed"
    "d03cc744a2888ae40caa232946c5e7e1",
    16,
)


@functools.cache
def _b3_mont() -> np.ndarray:
    return fl.encode_ints(FQ, [B3_INT])[0]


def _mul_b3(x: jnp.ndarray) -> jnp.ndarray:
    return fl.mul_const(FQ, x, _b3_mont())


def g1_add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete projective add, points as uint32[..., 3, n_limbs] (X:Y:Z).

    RCB15 Algorithm 7 (a=0).  Handles doubling and the identity (0:1:0)
    uniformly.
    """
    F = FQ
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    t0 = fl.mul(F, X1, X2)
    t1 = fl.mul(F, Y1, Y2)
    t2 = fl.mul(F, Z1, Z2)
    t3 = fl.mul(F, fl.add(F, X1, Y1), fl.add(F, X2, Y2))
    t3 = fl.sub(F, t3, fl.add(F, t0, t1))
    t4 = fl.mul(F, fl.add(F, Y1, Z1), fl.add(F, Y2, Z2))
    t4 = fl.sub(F, t4, fl.add(F, t1, t2))
    x3 = fl.mul(F, fl.add(F, X1, Z1), fl.add(F, X2, Z2))
    y3 = fl.sub(F, x3, fl.add(F, t0, t2))
    x3 = fl.add(F, t0, t0)
    t0 = fl.add(F, x3, t0)
    t2 = _mul_b3(t2)
    z3 = fl.add(F, t1, t2)
    t1 = fl.sub(F, t1, t2)
    y3 = _mul_b3(y3)
    x3 = fl.mul(F, t4, y3)
    t2 = fl.mul(F, t3, t1)
    x3 = fl.sub(F, t2, x3)
    y3 = fl.mul(F, y3, t0)
    t1 = fl.mul(F, t1, z3)
    y3 = fl.add(F, t1, y3)
    t0 = fl.mul(F, t0, t3)
    z3 = fl.mul(F, z3, t4)
    z3 = fl.add(F, z3, t0)
    return jnp.stack([x3, y3, z3], axis=-2)


def g1_double(p: jnp.ndarray) -> jnp.ndarray:
    """Complete projective doubling (RCB15 Algorithm 9, a=0)."""
    F = FQ
    X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    t0 = fl.mul(F, Y, Y)
    z3 = fl.add(F, t0, t0)
    z3 = fl.add(F, z3, z3)
    z3 = fl.add(F, z3, z3)
    t1 = fl.mul(F, Y, Z)
    t2 = fl.mul(F, Z, Z)
    t2 = _mul_b3(t2)
    x3 = fl.mul(F, t2, z3)
    y3 = fl.add(F, t0, t2)
    z3 = fl.mul(F, t1, z3)
    t1 = fl.add(F, t2, t2)
    t2 = fl.add(F, t1, t2)
    t0 = fl.sub(F, t0, t2)
    y3 = fl.mul(F, t0, y3)
    y3 = fl.add(F, x3, y3)
    t1 = fl.mul(F, X, Y)
    x3 = fl.mul(F, t0, t1)
    x3 = fl.add(F, x3, x3)
    return jnp.stack([x3, y3, z3], axis=-2)


def g1_neutral(shape=()) -> jnp.ndarray:
    """(0 : 1 : 0)."""
    zero = fl.zeros(FQ, shape)
    one = jnp.broadcast_to(fl.ones_mont(FQ), tuple(shape) + (FQ.n_limbs,))
    return jnp.stack([zero, one, zero], axis=-2)


def g1_neg(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [p[..., 0, :], fl.neg(FQ, p[..., 1, :]), p[..., 2, :]], axis=-2
    )


def g1_select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b over stacked points; cond shape = batch shape."""
    return jnp.where(cond[..., None, None], a, b)


# -----------------------------------------------------------------------------
# host-side exact model
# -----------------------------------------------------------------------------

Affine = Optional[Tuple[int, int]]  # None = infinity


class Host:
    p = FQ.modulus
    b = B_INT
    gen: Affine = (GEN_X, GEN_Y)
    # G1 subgroup order = BLS12-381 scalar field r
    order = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

    @classmethod
    def is_on_curve(cls, pt: Affine) -> bool:
        if pt is None:
            return True
        x, y = pt
        return (y * y - x * x * x - cls.b) % cls.p == 0

    @classmethod
    def add(cls, p1: Affine, p2: Affine) -> Affine:
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        P = cls.p
        if x1 == x2:
            if (y1 + y2) % P == 0:
                return None
            lam = (3 * x1 * x1) * pow(2 * y1, -1, P) % P
        else:
            lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
        x3 = (lam * lam - x1 - x2) % P
        y3 = (lam * (x1 - x3) - y1) % P
        return (x3, y3)

    @classmethod
    def neg(cls, pt: Affine) -> Affine:
        if pt is None:
            return None
        return (pt[0], (-pt[1]) % cls.p)

    @classmethod
    def scalar_mul(cls, k: int, pt: Affine) -> Affine:
        if k < 0:
            return cls.neg(cls.scalar_mul(-k, pt))
        acc: Affine = None
        add = pt
        while k:
            if k & 1:
                acc = cls.add(acc, add)
            add = cls.add(add, add)
            k >>= 1
        return acc

    @classmethod
    def msm(cls, scalars, points) -> Affine:
        acc: Affine = None
        for k, pt in zip(scalars, points):
            acc = cls.add(acc, cls.scalar_mul(k, pt))
        return acc

    @classmethod
    def normalize_proj(cls, xyz) -> Affine:
        x, y, z = xyz
        if z == 0:
            return None
        zi = pow(z, -1, cls.p)
        return (x * zi % cls.p, y * zi % cls.p)

    @classmethod
    def random_point(cls, rng) -> Affine:
        return cls.scalar_mul(rng.randrange(1, cls.order), cls.gen)


def encode_affine_to_proj(points) -> np.ndarray:
    """[Affine ints] -> uint32[n, 3, n_limbs] Montgomery projective."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    ex = fl.encode_ints(FQ, xs)
    ey = fl.encode_ints(FQ, ys)
    ez = fl.encode_ints(FQ, zs)
    return np.stack([ex, ey, ez], axis=1)


def decode_proj(arr) -> list:
    arr = np.asarray(arr)
    out = []
    for row in arr.reshape(-1, 3, FQ.n_limbs):
        x, y, z = fl.decode_ints(FQ, row)
        out.append(Host.normalize_proj((x, y, z)))
    return out
