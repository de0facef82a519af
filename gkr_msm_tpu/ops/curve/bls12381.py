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


def g1_add_ops(o, p_xyz, q_xyz):
    """Complete projective add written against the field-ops protocol
    (ops/field/fieldops.py): same formula runs on standard-layout arrays
    (StdOps) and on transposed values inside fused Pallas kernels (TOps).

    RCB15 Algorithm 7 (a=0).  Handles doubling and the identity (0:1:0)
    uniformly.  p_xyz/q_xyz: (X, Y, Z) coordinate triples.
    """
    X1, Y1, Z1 = p_xyz
    X2, Y2, Z2 = q_xyz
    b3 = _b3_mont()
    t0 = o.mul(X1, X2)
    t1 = o.mul(Y1, Y2)
    t2 = o.mul(Z1, Z2)
    t3 = o.mul(o.add(X1, Y1), o.add(X2, Y2))
    t3 = o.sub(t3, o.add(t0, t1))
    t4 = o.mul(o.add(Y1, Z1), o.add(Y2, Z2))
    t4 = o.sub(t4, o.add(t1, t2))
    x3 = o.mul(o.add(X1, Z1), o.add(X2, Z2))
    y3 = o.sub(x3, o.add(t0, t2))
    x3 = o.add(t0, t0)
    t0 = o.add(x3, t0)
    t2 = o.mul_const(t2, b3)
    z3 = o.add(t1, t2)
    t1 = o.sub(t1, t2)
    y3 = o.mul_const(y3, b3)
    x3 = o.mul(t4, y3)
    t2 = o.mul(t3, t1)
    x3 = o.sub(t2, x3)
    y3 = o.mul(y3, t0)
    t1 = o.mul(t1, z3)
    y3 = o.add(t1, y3)
    t0 = o.mul(t0, t3)
    z3 = o.mul(z3, t4)
    z3 = o.add(z3, t0)
    return x3, y3, z3


def g1_madd_ops(o, p_xyz, q_xy):
    """Complete mixed addition P(projective) + Q(affine), RCB15 Algorithm 8
    (a=0).  Complete in P (identity included); Q must be a real point —
    callers mask identity-Q lanes out (the MSM pad-slot mask).
    """
    X1, Y1, Z1 = p_xyz
    X2, Y2 = q_xy
    b3 = _b3_mont()
    t0 = o.mul(X1, X2)
    t1 = o.mul(Y1, Y2)
    t3 = o.add(X2, Y2)
    t4 = o.add(X1, Y1)
    t3 = o.mul(t3, t4)
    t4 = o.add(t0, t1)
    t3 = o.sub(t3, t4)
    t4 = o.mul(Y2, Z1)
    t4 = o.add(t4, Y1)
    y3 = o.mul(X2, Z1)
    y3 = o.add(y3, X1)
    x3 = o.add(t0, t0)
    t0 = o.add(x3, t0)
    t2 = o.mul_const(Z1, b3)
    z3 = o.add(t1, t2)
    t1 = o.sub(t1, t2)
    y3 = o.mul_const(y3, b3)
    x3 = o.mul(t4, y3)
    t2 = o.mul(t3, t1)
    x3 = o.sub(t2, x3)
    y3 = o.mul(y3, t0)
    t1 = o.mul(t1, z3)
    y3 = o.add(t1, y3)
    t0 = o.mul(t0, t3)
    z3 = o.mul(z3, t4)
    z3 = o.add(z3, t0)
    return x3, y3, z3


def g1_double_ops(o, p_xyz):
    """Complete projective doubling (RCB15 Algorithm 9, a=0)."""
    X, Y, Z = p_xyz
    b3 = _b3_mont()
    t0 = o.mul(Y, Y)
    z3 = o.add(t0, t0)
    z3 = o.add(z3, z3)
    z3 = o.add(z3, z3)
    t1 = o.mul(Y, Z)
    t2 = o.mul(Z, Z)
    t2 = o.mul_const(t2, b3)
    x3 = o.mul(t2, z3)
    y3 = o.add(t0, t2)
    z3 = o.mul(t1, z3)
    t1 = o.add(t2, t2)
    t2 = o.add(t1, t2)
    t0 = o.sub(t0, t2)
    y3 = o.mul(t0, y3)
    y3 = o.add(x3, y3)
    t1 = o.mul(X, Y)
    x3 = o.mul(t0, t1)
    x3 = o.add(x3, x3)
    return x3, y3, z3


_STD = None


def _std_ops():
    global _STD
    if _STD is None:
        from ..field.fieldops import StdOps

        _STD = StdOps(FQ)
    return _STD


def g1_add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete projective add, points as uint32[..., 3, n_limbs] (X:Y:Z)."""
    x3, y3, z3 = g1_add_ops(
        _std_ops(),
        (p[..., 0, :], p[..., 1, :], p[..., 2, :]),
        (q[..., 0, :], q[..., 1, :], q[..., 2, :]),
    )
    return jnp.stack([x3, y3, z3], axis=-2)


def g1_double(p: jnp.ndarray) -> jnp.ndarray:
    """Complete projective doubling (RCB15 Algorithm 9, a=0)."""
    x3, y3, z3 = g1_double_ops(
        _std_ops(), (p[..., 0, :], p[..., 1, :], p[..., 2, :])
    )
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
