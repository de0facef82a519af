"""Vectorized 16-bit-limb modular arithmetic over uint32 lanes (jnp).

This is the compute foundation of the whole framework: every polynomial,
curve point, and commitment is an array of field elements stored as
``uint32[..., n_limbs]`` with 16-bit limbs, least-significant first, in
**Montgomery form** (value * R mod p, R = 2^(16*n)).

Why 16-bit limbs (and not 32): TPUs have no 64-bit integer lanes, so a
32x32->64 multiply would need 4 sub-products anyway.  With 16-bit limbs a
limb product fits uint32 exactly, and a full schoolbook column sum of up to
2*n_limbs lo/hi halves stays < 2^22, i.e. multiplication is carry-free until
one final ripple.  All functions are shape-polymorphic over leading batch
dimensions and jit/vmap/shard_map-friendly (pure, static shapes).

Montgomery reduction uses the *separated operand scanning* formulation
(T -> m = T_lo * n' mod R -> (T + m*p)/R): three schoolbook multiplies that
vectorize perfectly, rather than the sequential CIOS interleave the CPU
reference's arkworks backend uses (see SURVEY.md §7.1).

Reference parity: arkworks ``ark_ff::MontBackend`` used throughout
/root/reference (e.g. src/utils.rs:32); here re-derived from first
principles for uint32 lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

MASK = jnp.uint32(LIMB_MASK)

import os as _os

# Carry-chain scan unroll factor for the XLA (non-Pallas) path.  1 keeps the
# traced graph O(1) per carry; full unroll (True) trades a bigger jaxpr for
# cheaper XLA loop handling — set GKR_MSM_CARRY_UNROLL to tune per backend.
_CARRY_UNROLL: object = int(_os.environ.get("GKR_MSM_CARRY_UNROLL", "1"))
if _CARRY_UNROLL <= 0:
    _CARRY_UNROLL = True  # full unroll


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


# -----------------------------------------------------------------------------
# carries
# -----------------------------------------------------------------------------

def carry_ripple(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Fully propagate carries over columns (each < 2^32), keep `out_limbs` limbs.

    cols: uint32[..., m] column sums; returns uint32[..., out_limbs] with every
    limb < 2^16.  Columns beyond out_limbs (and the final carry) are dropped —
    callers guarantee the value fits.  Implemented as one lax.scan over the
    limb axis so the traced graph stays O(1) ops.
    """
    m = cols.shape[-1]
    x = jnp.moveaxis(cols, -1, 0)
    if m < out_limbs:
        x = jnp.concatenate(
            [x, jnp.zeros((out_limbs - m,) + x.shape[1:], dtype=jnp.uint32)]
        )
    else:
        x = x[:out_limbs]

    def step(carry, col):
        t = col + carry
        return t >> LIMB_BITS, t & MASK

    zero_carry = x[0] * jnp.uint32(0)  # derived from data: shard_map-safe
    _, outs = jax.lax.scan(step, zero_carry, x, unroll=_CARRY_UNROLL)
    return jnp.moveaxis(outs, 0, -1)


# -----------------------------------------------------------------------------
# schoolbook multiplication (lazy columns)
# -----------------------------------------------------------------------------

def _diag_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Anti-diagonal sums: out[k] = sum_i x[..., i, k-i] for x uint32[..., n, m].

    The pad-flatten shear trick: one pad + reshape + sum, no scatters.
    """
    n, m = x.shape[-2], x.shape[-1]
    batch = x.shape[:-2]
    y = jnp.pad(x, [(0, 0)] * len(batch) + [(0, 0), (0, n)])
    y = y.reshape(*batch, n * (m + n))[..., : n * (m + n) - n]
    y = y.reshape(*batch, n, m + n - 1)
    return jnp.sum(y, axis=-2, dtype=jnp.uint32)


def _mul_columns(a: jnp.ndarray, b: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Column sums of the schoolbook product, no carries.

    a: uint32[..., na] limbs < 2^16;  b: uint32[..., nb] limbs < 2^16.
    Returns uint32[..., n_cols] where col[k] = sum_{i+j==k} lo(a_i*b_j)
    + sum_{i+j==k-1} hi(a_i*b_j).  Each column < 2*min(na,nb)*2^16 < 2^32.
    One broadcast outer product + two shear-trick diagonal sums.
    """
    na = a.shape[-1]
    nb = b.shape[-1]
    p = a[..., :, None] * b[..., None, :]  # uint32 exact: 16x16 bits
    lo = _diag_sum(p & MASK)  # (..., na+nb-1)
    hi = _diag_sum(p >> LIMB_BITS)
    batch = lo.shape[:-1]
    pad = [(0, 0)] * len(batch)
    cols = jnp.pad(lo, pad + [(0, 1)]) + jnp.pad(hi, pad + [(1, 0)])
    w = cols.shape[-1]
    if w >= n_cols:
        return cols[..., :n_cols]
    return jnp.pad(cols, pad + [(0, n_cols - w)])


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 2n-limb product (carried) of two n-limb values."""
    n = a.shape[-1]
    cols = _mul_columns(a, b, 2 * n)
    return carry_ripple(cols, 2 * n)


# -----------------------------------------------------------------------------
# add / sub / compare
# -----------------------------------------------------------------------------

def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
    """a - b with borrow ripple (lax.scan). Returns (diff, final borrow 0/1)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    av = jnp.moveaxis(a, -1, 0)
    bv = jnp.moveaxis(b, -1, 0)

    def step(borrow, ab):
        ak, bk = ab
        bk = bk + borrow  # <= 2^16
        d = (ak - bk) & MASK
        return (ak < bk).astype(jnp.uint32), d

    zero_borrow = (av[0] ^ av[0]) * (bv[0] * jnp.uint32(0) + jnp.uint32(1))
    borrow, outs = jax.lax.scan(step, zero_borrow * jnp.uint32(0), (av, bv))
    return jnp.moveaxis(outs, 0, -1), borrow


def _add_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b with carry ripple (lax.scan). Returns (sum limbs, final carry)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    av = jnp.moveaxis(a, -1, 0)
    bv = jnp.moveaxis(b, -1, 0)

    def step(carry, ab):
        ak, bk = ab
        t = ak + bk + carry
        return t >> LIMB_BITS, t & MASK

    zero_carry = (av[0] ^ av[0]) | (bv[0] ^ bv[0])
    carry, outs = jax.lax.scan(step, zero_carry, (av, bv))
    return jnp.moveaxis(outs, 0, -1), carry


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b over limb arrays -> bool[...]"""
    _, borrow = _sub_limbs(a, b)
    return borrow == 0


# -----------------------------------------------------------------------------
# field ops (Montgomery form), parameterized by FieldSpec
# -----------------------------------------------------------------------------

def _const(spec_arr: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(spec_arr, dtype=jnp.uint32)


def cond_sub_p(spec: FieldSpec, x: jnp.ndarray, extra_carry=None) -> jnp.ndarray:
    """x (< 2p, possibly with a carry bit above the top limb) -> x mod p."""
    p = _const(spec.p_limbs)
    d, borrow = _sub_limbs(x, jnp.broadcast_to(p, x.shape))
    if extra_carry is not None:
        # carry bit means the true value had 2^(16n) added: subtraction surely ok
        take_sub = jnp.logical_or(borrow == 0, extra_carry != 0)
    else:
        take_sub = borrow == 0
    return jnp.where(take_sub[..., None], d, x)


def _pallas():
    from ..pallas import field_kernels as pk  # local import: avoids cycle

    return pk


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    pk = _pallas()
    if pk.should_use(a, b):
        return pk.add(spec, a, b)
    s, carry = _add_limbs(a, b)
    return cond_sub_p(spec, s, extra_carry=carry)


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    pk = _pallas()
    if pk.should_use(a, b):
        return pk.sub(spec, a, b)
    d, borrow = _sub_limbs(a, b)
    p = jnp.broadcast_to(_const(spec.p_limbs), d.shape)
    dp, _ = _add_limbs(d, p)
    return jnp.where((borrow != 0)[..., None], dp, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    return sub(spec, z, a)


def mont_reduce(spec: FieldSpec, t_cols: jnp.ndarray) -> jnp.ndarray:
    """REDC of a 2n-limb (carried) value T < p*R  ->  T*R^-1 mod p, n limbs.

    Separated formulation:  m = (T mod R) * n' mod R;  out = (T + m*p) / R.
    """
    n = spec.n_limbs
    t = t_cols
    t_lo = t[..., :n]
    np_ = jnp.broadcast_to(_const(spec.np_limbs), t_lo.shape)
    m_cols = _mul_columns(t_lo, np_, n)
    m = carry_ripple(m_cols, n)  # m < R
    p = jnp.broadcast_to(_const(spec.p_limbs), m.shape)
    mp_cols = _mul_columns(m, p, 2 * n + 1)
    # T + m*p: accumulate T's limbs (each < 2^16) onto mp columns (< 2^22): safe.
    total = mp_cols.at[..., : 2 * n].add(t)
    # low n limbs are zero after carry; propagate carries and keep the high part.
    full = carry_ripple(total, 2 * n + 1)
    hi = full[..., n : 2 * n]
    carry = full[..., 2 * n]
    return cond_sub_p(spec, hi, extra_carry=carry)


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product  a*b*R^-1 mod p  of Montgomery-form operands.

    Large TPU-resident batches dispatch to the fused Pallas kernel
    (ops/pallas/field_kernels.py, ~40x the XLA path on v5e)."""
    pk = _pallas()
    if pk.should_use(a, b):
        return pk.mul(spec, a, b)
    n = spec.n_limbs
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    cols = _mul_columns(a, b, 2 * n)
    t = carry_ripple(cols, 2 * n)
    return mont_reduce(spec, t)


def square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mul(spec, a, a)


def mul_const(spec: FieldSpec, a: jnp.ndarray, c_mont: np.ndarray) -> jnp.ndarray:
    """Multiply by a host constant given in Montgomery limb form."""
    c = jnp.broadcast_to(_const(c_mont), a.shape)
    return mul(spec, a, c)


def to_mont(spec: FieldSpec, a_std: jnp.ndarray) -> jnp.ndarray:
    """Standard-form limbs -> Montgomery form (multiply by R^2)."""
    return mul(spec, a_std, jnp.broadcast_to(_const(spec.r2_limbs), a_std.shape))


def from_mont(spec: FieldSpec, a_mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form -> standard-form limbs (multiply by 1)."""
    n = spec.n_limbs
    t = jnp.zeros(a_mont.shape[:-1] + (2 * n,), dtype=jnp.uint32)
    t = t.at[..., :n].set(a_mont)
    return mont_reduce(spec, t)


def zeros(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros(tuple(shape) + (spec.n_limbs,), dtype=jnp.uint32)


def ones_mont(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(_const(spec.one_mont), tuple(shape) + (spec.n_limbs,))


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b, broadcasting cond over the limb axis."""
    return jnp.where(cond[..., None], a, b)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-known exponent (square-and-multiply, unrolled)."""
    result = ones_mont(spec, a.shape[:-1])
    base = a
    while e > 0:
        if e & 1:
            result = mul(spec, result, base)
        e >>= 1
        if e:
            base = square(spec, base)
    return result


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^(p-2).  ~bits squarings — use batch_inverse for bulk."""
    return pow_const(spec, a, spec.modulus - 2)


def batch_inverse(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Invert a batch (leading axis) with a log-depth product tree + one inv.

    a: uint32[m, ..., n_limbs], m a power of two, all entries nonzero.
    Work: ~3x one multiply per element; depth: 2*log2(m) + one Fermat inverse.
    """
    m = a.shape[0]
    assert m & (m - 1) == 0, "batch_inverse requires power-of-two batch"
    # up-sweep: levels[k] has m>>k partial products of sibling pairs
    levels = [a]
    cur = a
    while cur.shape[0] > 1:
        cur = mul(spec, cur[0::2], cur[1::2])
        levels.append(cur)
    root_inv = inv(spec, levels[-1])
    # down-sweep
    inv_cur = root_inv
    for lvl in reversed(levels[:-1]):
        left, right = lvl[0::2], lvl[1::2]
        inv_left = mul(spec, inv_cur, right)
        inv_right = mul(spec, inv_cur, left)
        inv_cur = jnp.stack([inv_left, inv_right], axis=1).reshape(lvl.shape)
    return inv_cur


# -----------------------------------------------------------------------------
# host <-> device conversion helpers
# -----------------------------------------------------------------------------

def encode_ints(spec: FieldSpec, values, mont: bool = True) -> np.ndarray:
    """Python ints -> uint32[len, n_limbs] (numpy, host)."""
    values = list(values)
    out = np.zeros((len(values), spec.n_limbs), dtype=np.uint32)
    for i, v in enumerate(values):
        v = (spec.to_mont_int(v % spec.modulus) if mont else v % spec.modulus)
        out[i] = np.array(
            [(v >> (LIMB_BITS * k)) & LIMB_MASK for k in range(spec.n_limbs)],
            dtype=np.uint32,
        )
    return out


def decode_ints(spec: FieldSpec, limbs, mont: bool = True):
    """uint32[..., n_limbs] -> list of Python ints (host)."""
    arr = np.asarray(limbs).reshape(-1, spec.n_limbs)
    outs = []
    for row in arr:
        v = sum(int(l) << (LIMB_BITS * k) for k, l in enumerate(row))
        outs.append(spec.from_mont_int(v) if mont else v)
    return outs


def decode_ints_fast(spec: FieldSpec, limbs, mont: bool = True):
    """Bulk uint32[..., n_limbs] -> Python ints via packed bytes (fast path
    for large tables: one tobytes + int.from_bytes per element)."""
    arr = np.ascontiguousarray(np.asarray(limbs), dtype=np.uint32).reshape(
        -1, spec.n_limbs
    )
    packed = arr.astype("<u2").tobytes()
    w = 2 * spec.n_limbs
    out = []
    for i in range(arr.shape[0]):
        v = int.from_bytes(packed[i * w : (i + 1) * w], "little")
        out.append(spec.from_mont_int(v) if mont else v)
    return out
