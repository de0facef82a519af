"""Pallas TPU kernels for 16-bit-limb Montgomery field arithmetic.

The jnp reference path (``ops/field/limbs.py``) materializes the schoolbook
outer product as a ``uint32[..., n, n]`` HBM tensor (~1 GB per 2^20-element
multiply) and pays one XLA op dispatch per primitive.  These kernels keep the
whole multiply — schoolbook columns, Montgomery REDC, carry ripples and the
final conditional subtraction — inside VMEM, so a 2^20-element Fr multiply
moves 3×64 MB of HBM traffic instead of multiple GB.

Layout: the public API accepts the framework-standard ``uint32[..., n_limbs]``
arrays; internally operands are transposed to ``(n_limbs, B)`` blocks so the
batch axis fills all 128 VPU lanes and the limb axis sits on sublanes.  All
limb loops are unrolled at trace time (static shapes, no scatter/gather).

Reference parity: same separated-operand-scanning REDC as
``limbs.mont_reduce`` (bit-exact; tested against it in
tests/test_pallas_field.py and scripts/tpu_selfcheck.py).
Reference: arkworks MontBackend usage throughout /root/reference
(src/utils.rs:32); redesigned here for the TPU VPU.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.spec import LIMB_BITS, LIMB_MASK, FieldSpec

# numpy scalar: inlined as a literal at trace time (a jnp scalar would be a
# captured constant, which pallas kernels reject)
MASK = np.uint32(LIMB_MASK)

# Batch lanes per grid step. 512 lanes x (16|24) sublanes keeps every temp
# comfortably inside VMEM while filling the 8x128 VPU.
DEFAULT_BLOCK = 512

_INTERPRET = os.environ.get("GKR_MSM_PALLAS_INTERPRET", "0") == "1"


# =============================================================================
# value-level helpers on transposed (n_limbs, B) uint32 arrays (kernel-side)
# =============================================================================

def _shift_rows(x: jnp.ndarray, start: int, n_rows: int) -> jnp.ndarray:
    """Place x's rows at [start, start+len) inside an (n_rows, B) zero frame.

    Pure pad/slice (no scatter: Pallas kernels reject jax scatter lowering's
    captured index constants, and pads fuse better in Mosaic anyway).
    """
    m = x.shape[0]
    keep = min(m, n_rows - start)
    if keep <= 0:
        return jnp.zeros((n_rows, x.shape[1]), dtype=x.dtype)
    x = x[:keep]
    return jnp.pad(x, ((start, n_rows - start - keep), (0, 0)))


def _carry_t(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Sequential carry ripple over the limb (sublane) axis.

    cols: uint32[m, B], every column sum < 2^32. Returns uint32[out_limbs, B]
    with limbs < 2^16; columns beyond out_limbs and the final carry drop.
    """
    m = cols.shape[0]
    outs = []
    carry = jnp.zeros_like(cols[0:1])
    for k in range(out_limbs):
        col = cols[k : k + 1] if k < m else jnp.zeros_like(carry)
        t = col + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.concatenate(outs, axis=0), carry


def _schoolbook_t(a: jnp.ndarray, b: jnp.ndarray, n_cols: int) -> jnp.ndarray:
    """Lazy schoolbook column sums of a*b, limbs on axis 0.

    a: uint32[na, B] (<2^16), b: uint32[nb, B] (<2^16) ->
    uint32[n_cols, B] with col[k] = sum_{i+j==k} lo(a_i b_j)
    + sum_{i+j==k-1} hi(a_i b_j); every column < 2*min(na,nb)*2^16 < 2^32.
    """
    na, nb = a.shape[0], b.shape[0]
    B = a.shape[1]
    acc = jnp.zeros((n_cols, B), dtype=jnp.uint32)
    for i in range(na):
        p = a[i : i + 1] * b  # (nb, B) exact 16x16-bit products
        lo = p & MASK
        hi = p >> LIMB_BITS
        acc = acc + _shift_rows(lo, i, n_cols)
        acc = acc + _shift_rows(hi, i + 1, n_cols)
    return acc


def _sub_limbs_t(a: jnp.ndarray, b: jnp.ndarray):
    """a - b limbwise with borrow ripple; returns (diff, borrow[1,B])."""
    n = a.shape[0]
    outs = []
    borrow = jnp.zeros_like(a[0:1])
    for k in range(n):
        bk = b[k : k + 1] + borrow
        ak = a[k : k + 1]
        outs.append((ak - bk) & MASK)
        borrow = (ak < bk).astype(jnp.uint32)
    return jnp.concatenate(outs, axis=0), borrow


def _schoolbook_const_t(a: jnp.ndarray, c_limbs, n_cols: int) -> jnp.ndarray:
    """Lazy schoolbook columns of a * c for a compile-time constant c.

    c_limbs: numpy uint32 limbs of the constant (Python ints at trace time) —
    scalar literals, so Mosaic sees no captured arrays; zero limbs are free.
    """
    na = a.shape[0]
    B = a.shape[1]
    acc = jnp.zeros((n_cols, B), dtype=jnp.uint32)
    for j, cj in enumerate(int(x) for x in c_limbs):
        if cj == 0:
            continue
        p = a * jnp.uint32(cj)  # (na, B) exact 16x16-bit products
        lo = p & MASK
        hi = p >> LIMB_BITS
        acc = acc + _shift_rows(lo, j, n_cols)
        acc = acc + _shift_rows(hi, j + 1, n_cols)
    return acc


def _sub_limbs_const_t(a: jnp.ndarray, c_limbs):
    """a - c (constant limbs) with borrow ripple; returns (diff, borrow)."""
    n = a.shape[0]
    outs = []
    borrow = jnp.zeros_like(a[0:1])
    for k in range(n):
        bk = jnp.uint32(int(c_limbs[k])) + borrow
        ak = a[k : k + 1]
        outs.append((ak - bk) & MASK)
        borrow = (ak < bk).astype(jnp.uint32)
    return jnp.concatenate(outs, axis=0), borrow


def _add_limbs_const_t(a: jnp.ndarray, c_limbs):
    """a + c (constant limbs) with carry ripple; returns (sum, carry)."""
    n = a.shape[0]
    outs = []
    carry = jnp.zeros_like(a[0:1])
    for k in range(n):
        t = a[k : k + 1] + jnp.uint32(int(c_limbs[k])) + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.concatenate(outs, axis=0), carry


def _add_limbs_t(a: jnp.ndarray, b: jnp.ndarray):
    """a + b limbwise with carry ripple; returns (sum, carry[1,B])."""
    n = a.shape[0]
    outs = []
    carry = jnp.zeros_like(a[0:1])
    for k in range(n):
        t = a[k : k + 1] + b[k : k + 1] + carry
        outs.append(t & MASK)
        carry = t >> LIMB_BITS
    return jnp.concatenate(outs, axis=0), carry


def _cond_sub_p_t(spec: FieldSpec, x: jnp.ndarray, extra_carry=None) -> jnp.ndarray:
    """x (< 2p, optional carry bit above the top limb) -> x mod p."""
    d, borrow = _sub_limbs_const_t(x, spec.p_limbs)
    take = borrow == 0
    if extra_carry is not None:
        take = jnp.logical_or(take, extra_carry != 0)
    return jnp.where(take, d, x)


def _mont_reduce_t(spec: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """REDC of a carried 2n-limb value T < p*R -> T*R^-1 mod p, (n, B)."""
    n = spec.n_limbs
    m_cols = _schoolbook_const_t(t[:n], spec.np_limbs, n)
    m, _ = _carry_t(m_cols, n)
    mp_cols = _schoolbook_const_t(m, spec.p_limbs, 2 * n + 1)
    total = mp_cols + _shift_rows(t, 0, 2 * n + 1)
    full, _ = _carry_t(total, 2 * n + 1)
    hi = full[n : 2 * n]
    carry = full[2 * n : 2 * n + 1]
    return _cond_sub_p_t(spec, hi, extra_carry=carry)


def _mont_mul_t(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^-1 mod p on (n, B) transposed operands."""
    n = spec.n_limbs
    cols = _schoolbook_t(a, b, 2 * n)
    t, _ = _carry_t(cols, 2 * n)
    return _mont_reduce_t(spec, t)


def _lane_sum_t(spec: FieldSpec, w: jnp.ndarray) -> jnp.ndarray:
    """Exact field sum over the lane (batch) axis: (n, B) -> (n, 1).

    One uint32 column sum (exact while B < 2^16), one carry ripple, one REDC
    and a R^2 rescale — instead of log2(B) modular-add tree steps.  Preserves
    Montgomery form: REDC divides by R, the R^2 Montgomery-multiply restores it.
    """
    n = spec.n_limbs
    B = w.shape[1]
    assert B < (1 << LIMB_BITS), "lane sum bound needs B < 2^16"
    # lazy halving tree of plain uint32 adds (Mosaic lacks unsigned reduce);
    # exact: column sums stay < B * 2^16 < 2^32
    while w.shape[1] > 1:
        half = w.shape[1] // 2
        w = w[:, :half] + w[:, half : 2 * half]
    cols = w  # (n, 1), each < B*2^16
    t, _ = _carry_t(cols, n + 2)
    frame = _shift_rows(t, 0, 2 * n)
    s = _mont_reduce_t(spec, frame)  # = (sum w) * R^-1 (as field value)
    return _mont_mul_const_t(spec, s, spec.r2_limbs)


def _mul_wide_t(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Non-reduced product of Montgomery operands: (2n, B) carried limbs.

    Skips REDC entirely — used when many products are SUMMED before one
    deferred reduction (_lane_sum_wide_t), saving ~2/3 of the per-element
    multiply cost."""
    n = spec.n_limbs
    cols = _schoolbook_t(a, b, 2 * n)
    t, _ = _carry_t(cols, 2 * n)
    return t


def _lane_sum_wide_t(spec: FieldSpec, w: jnp.ndarray) -> jnp.ndarray:
    """Exact field sum over lanes of NON-reduced products: (2n, B) -> (n, 1).

    The integer sum V = sum a_i b_i < B * p^2 exceeds the single-REDC bound
    p*R, so reduce in two REDC steps (V -> V/R -> V/R^2 = sum x_i y_i in
    standard form), then one R^2 Montgomery multiply restores Montgomery
    form — bit-identical to reducing each product then field-summing."""
    n = spec.n_limbs
    B = w.shape[1]
    assert B < (1 << LIMB_BITS)
    while w.shape[1] > 1:
        half = w.shape[1] // 2
        w = w[:, :half] + w[:, half : 2 * half]
    v, _ = _carry_t(w, 2 * n + 2)  # columns < B*2^16 < 2^32
    # REDC step 1: V -> (V + m*p)/R, an (n+2)-limb value
    m_cols = _schoolbook_const_t(v[:n], spec.np_limbs, n)
    m, _ = _carry_t(m_cols, n)
    mp_cols = _schoolbook_const_t(m, spec.p_limbs, 2 * n + 2)
    total = mp_cols + _shift_rows(v, 0, 2 * n + 2)
    full, _ = _carry_t(total, 2 * n + 2)
    v1 = full[n : 2 * n + 2]  # V/R, < B*p^2/R + p  (fits n+2 limbs)
    # REDC step 2 (standard bound holds: V/R < p*R easily)
    std = _mont_reduce_t(spec, _shift_rows(v1, 0, 2 * n))
    return _mont_mul_const_t(spec, std, spec.r2_limbs)


def _add_t(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, carry = _add_limbs_t(a, b)
    return _cond_sub_p_t(spec, s, extra_carry=carry)


def _sub_t(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_limbs_t(a, b)
    dp, _ = _add_limbs_const_t(d, spec.p_limbs)
    return jnp.where(borrow != 0, dp, d)


def _mont_mul_const_t(spec: FieldSpec, a: jnp.ndarray, c_mont) -> jnp.ndarray:
    """Montgomery product by a compile-time constant (Montgomery-form limbs)."""
    n = spec.n_limbs
    cols = _schoolbook_const_t(a, c_mont, 2 * n)
    t, _ = _carry_t(cols, 2 * n)
    m_cols = _schoolbook_const_t(t[:n], spec.np_limbs, n)
    m, _ = _carry_t(m_cols, n)
    mp_cols = _schoolbook_const_t(m, spec.p_limbs, 2 * n + 1)
    total = mp_cols + _shift_rows(t, 0, 2 * n + 1)
    full, _ = _carry_t(total, 2 * n + 1)
    return _cond_sub_p_t(
        spec, full[n : 2 * n], extra_carry=full[2 * n : 2 * n + 1]
    )


def _neg_t(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(p - a) mod p, mapping 0 -> 0."""
    n = a.shape[0]
    nz = a[0:1]
    for k in range(1, n):
        nz = nz | a[k : k + 1]
    outs = []
    borrow = jnp.zeros_like(a[0:1])
    for k in range(n):
        ak = a[k : k + 1] + borrow
        ck = jnp.uint32(int(spec.p_limbs[k]))
        outs.append((ck - ak) & MASK)
        borrow = (ck < ak).astype(jnp.uint32)
    d = jnp.concatenate(outs, axis=0)
    return jnp.where(nz != 0, d, jnp.zeros_like(d))


def _const_rows_t(c_limbs, B: int) -> jnp.ndarray:
    """(n_limbs, B) broadcast of a compile-time constant, from scalar literals."""
    return jnp.concatenate(
        [jnp.full((1, B), int(l), dtype=jnp.uint32) for l in c_limbs], axis=0
    )


class TOps:
    """Transposed-layout executor for formulas inside Pallas kernels.

    Values are ``uint32[n_limbs, B]``; all field constants become scalar
    literals at trace time. Mirror of ops/field/fieldops.StdOps.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec

    def mul(self, a, b):
        return _mont_mul_t(self.spec, a, b)

    def add(self, a, b):
        return _add_t(self.spec, a, b)

    def sub(self, a, b):
        return _sub_t(self.spec, a, b)

    def square(self, a):
        return _mont_mul_t(self.spec, a, a)

    def double(self, a):
        return _add_t(self.spec, a, a)

    def neg(self, a):
        return _neg_t(self.spec, a)

    def mul_const(self, a, c_mont):
        return _mont_mul_const_t(self.spec, a, c_mont)

    def one_like(self, a):
        return _const_rows_t(self.spec.one_mont, a.shape[1])


# =============================================================================
# pallas_call wrappers
# =============================================================================

def _binop_kernel(spec: FieldSpec, op: str):
    body = {"mul": _mont_mul_t, "add": _add_t, "sub": _sub_t}[op]

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = body(spec, a_ref[:], b_ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("spec", "op", "block", "b_scalar", "interpret")
)
def _binop_t(
    spec: FieldSpec,
    op: str,
    a_t: jnp.ndarray,
    b_t: jnp.ndarray,
    block: int = DEFAULT_BLOCK,
    b_scalar: bool = False,
    interpret: bool = False,
):
    """Dispatch op over (n, M) transposed arrays; M multiple of block."""
    n = spec.n_limbs
    M = a_t.shape[1]
    grid = (M // block,)
    a_spec = pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    if b_scalar:
        b_spec = pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)

        def kernel(a_ref, b_ref, o_ref):
            bb = jnp.broadcast_to(b_ref[:], (n, block))
            body = {"mul": _mont_mul_t, "add": _add_t, "sub": _sub_t}[op]
            o_ref[:] = body(spec, a_ref[:], bb)

    else:
        b_spec = a_spec
        kernel = _binop_kernel(spec, op)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, M), jnp.uint32),
        grid=grid,
        in_specs=[a_spec, b_spec],
        out_specs=pl.BlockSpec(
            (n, block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(a_t, b_t)


def _pad_to(a: jnp.ndarray, mult: int) -> jnp.ndarray:
    m = a.shape[-1]
    r = (-m) % mult
    if r:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, r)])
    return a


def binop(spec: FieldSpec, op: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field op on standard-layout uint32[..., n_limbs] arrays.

    Supports equal batch shapes or a scalar (single-element) second operand.
    """
    n = spec.n_limbs
    a_batch = a.shape[:-1]
    b_batch = b.shape[:-1]
    b_elems = int(np.prod(b_batch)) if b_batch else 1
    b_scalar = b_elems == 1 and int(np.prod(a_batch) if a_batch else 1) > 1
    if not b_scalar and a_batch != b_batch:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        a_batch = shape[:-1]
    M = int(np.prod(a_batch)) if a_batch else 1
    block = min(DEFAULT_BLOCK, max(128, 1 << (M - 1).bit_length()))
    a_t = _pad_to(a.reshape(M, n).T, block)
    if b_scalar:
        b_t = b.reshape(1, n).T
    else:
        b_t = _pad_to(b.reshape(M, n).T, block)
    out_t = _binop_t(
        spec, op, a_t, b_t, block=block, b_scalar=b_scalar, interpret=_INTERPRET
    )
    return out_t[:, :M].T.reshape(*a_batch, n)


def mul(spec: FieldSpec, a, b):
    if _is_scalar_operand(a) and not _is_scalar_operand(b):
        a, b = b, a  # commutative: keep the scalar on the broadcast side
    return binop(spec, "mul", a, b)


def add(spec: FieldSpec, a, b):
    if _is_scalar_operand(a) and not _is_scalar_operand(b):
        a, b = b, a
    return binop(spec, "add", a, b)


def sub(spec: FieldSpec, a, b):
    return binop(spec, "sub", a, b)


def _is_scalar_operand(x) -> bool:
    return int(np.prod(x.shape[:-1])) == 1 if x.ndim > 1 else True


# -----------------------------------------------------------------------------
# dispatch policy (consumed by ops.field.limbs)
# -----------------------------------------------------------------------------

_FORCE = os.environ.get("GKR_MSM_PALLAS")  # "1" force-on, "0" force-off
MIN_PALLAS_ELEMS = 2048


@functools.lru_cache(maxsize=1)
def _backend_is_tpu() -> bool:
    try:
        if jax.default_backend() in ("tpu", "axon"):
            return True
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never raises in practice
        return False


def should_use(a: jnp.ndarray, b: jnp.ndarray) -> bool:
    """Trace-time policy: use the Pallas path for large TPU-resident batches."""
    if _FORCE == "0":
        return False
    if _FORCE != "1" and not _backend_is_tpu():
        return False
    an = int(np.prod(a.shape[:-1])) if a.ndim > 1 else 1
    bn = int(np.prod(b.shape[:-1])) if b.ndim > 1 else 1
    if max(an, bn) < MIN_PALLAS_ELEMS:
        return False
    # equal shapes or scalar operand only; anything else falls back
    return a.shape[:-1] == b.shape[:-1] or min(an, bn) == 1
