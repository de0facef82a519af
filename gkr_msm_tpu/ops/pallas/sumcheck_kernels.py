"""Fused Pallas kernels for the deg-2 eq-factored sumcheck round.

The sumcheck prover's per-round hot loop (models/sumcheck.py `_round_sums` +
`bind`, mirroring the reference's vecvec_eq.rs:302-388 algebra) is fused here
into two kernels:

* :func:`fused_round` — computes the eq-weighted layer-map evaluations at
  t=1,2 and their full field sums in ONE pallas_call: per grid block, the
  even/odd table halves are combined, the AlgFn's `ops_fn` formula runs on
  transposed VMEM values (ops/field/fieldops.py protocol), outputs are
  eq-weighted and lane-summed exactly (uint32 column sums + one REDC).
  Per-block partials are tree-summed by a tiny XLA epilogue.
* :func:`fused_bind` — binds the lowest variable of every poly
  (`e + t*(o - e)`) in one pallas_call.

Versus the per-op dispatch path this removes every intermediate HBM round
trip: a 2^20 PROJ_L2 round reads 5x64 MB once instead of ~30 materialized
intermediates.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.spec import FieldSpec
from ..poly.algfn import AlgFn
from . import field_kernels as fk

import os as _os_blk

DEFAULT_BLOCK = int(_os_blk.environ.get("GKR_MSM_PALLAS_BLOCK", "512"))


def _supports(fn: AlgFn) -> bool:
    return fn.ops_fn is not None


# -----------------------------------------------------------------------------
# fused round
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec", "fn", "block", "interpret"))
def _fused_round_call(
    spec: FieldSpec,
    fn: AlgFn,
    ins: tuple,  # 2*n_ins arrays (L, M2): evens/odds interleaved per poly
    eq_t: jnp.ndarray,  # (L, M2)
    block: int,
    interpret: bool,
):
    n = spec.n_limbs
    M2 = ins[0].shape[1]
    grid = (M2 // block,)
    tops = fk.TOps(spec)

    def kernel(*refs):
        in_refs = refs[: 2 * fn.n_ins]
        eq_ref = refs[2 * fn.n_ins]
        out_ref = refs[2 * fn.n_ins + 1]
        evens = [in_refs[2 * k][:] for k in range(fn.n_ins)]
        odds = [in_refs[2 * k + 1][:] for k in range(fn.n_ins)]
        _round_sums_body(spec, fn, evens, odds, eq_ref[:], out_ref)

    bspec = lambda: pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M2 // block, 2 * fn.n_outs, n), jnp.uint32),
        grid=grid,
        in_specs=[bspec() for _ in range(2 * fn.n_ins + 1)],
        out_specs=pl.BlockSpec(
            (1, 2 * fn.n_outs, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*ins, eq_t)
    # XLA epilogue: field tree-sum of per-block partials over a pow2 axis
    from ..field import limbs as fl

    g = out.shape[0]
    gp = 1 << (g - 1).bit_length()
    if gp != g:
        out = jnp.concatenate(
            [out, jnp.zeros((gp - g,) + out.shape[1:], jnp.uint32)], axis=0
        )
    while out.shape[0] > 1:
        out = fl.add(spec, out[0::2], out[1::2])
    return out[0].reshape(2, fn.n_outs, n)


def fused_round(
    spec: FieldSpec,
    polys: Sequence[jnp.ndarray],
    fn: AlgFn,
    eq_tbl: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in twin of models/sumcheck._round_sums -> uint32[2, n_outs, L].

    polys: (M, L) tables; eq_tbl: (M/2, L). Requires fn.ops_fn.
    """
    assert _supports(fn)
    m2 = polys[0].shape[0] // 2
    block = min(DEFAULT_BLOCK, max(128, 1 << (m2 - 1).bit_length()))
    pad = (-m2) % block
    ins = []
    for p in polys:
        pr = p.reshape(m2, 2, spec.n_limbs)
        for half in (0, 1):
            h = pr[:, half, :].T  # (L, m2)
            if pad:
                h = jnp.pad(h, ((0, 0), (0, pad)))
            ins.append(h)
    eq_t = eq_tbl.T
    if pad:
        eq_t = jnp.pad(eq_t, ((0, 0), (0, pad)))  # zero eq => padded lanes vanish
    return _fused_round_call(
        spec, fn, tuple(ins), eq_t, block, fk._INTERPRET
    )


# -----------------------------------------------------------------------------
# fused bind
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("spec", "n_polys", "block", "interpret"))
def _fused_bind_call(
    spec: FieldSpec,
    n_polys: int,
    ins: tuple,  # 2*n_polys arrays (L, M2)
    t_col: jnp.ndarray,  # (L, 1)
    block: int,
    interpret: bool,
):
    n = spec.n_limbs
    M2 = ins[0].shape[1]
    grid = (M2 // block,)
    tops = fk.TOps(spec)

    def kernel(*refs):
        in_refs = refs[: 2 * n_polys]
        t_ref = refs[2 * n_polys]
        out_refs = refs[2 * n_polys + 1 :]
        t = jnp.broadcast_to(t_ref[:], (n, block))
        for k in range(n_polys):
            e = in_refs[2 * k][:]
            o = in_refs[2 * k + 1][:]
            # t must be the SECOND operand: the schoolbook loop slices the
            # first one limb-by-limb, and Mosaic cannot lower a sublane slice
            # of a lane-broadcast value (both-axes broadcast, unimplemented)
            out_refs[k][:] = tops.add(e, tops.mul(tops.sub(o, e), t))

    bspec = lambda: pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n, M2), jnp.uint32) for _ in range(n_polys)],
        grid=grid,
        in_specs=[bspec() for _ in range(2 * n_polys)]
        + [pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[bspec() for _ in range(n_polys)],
        interpret=interpret,
    )(*ins, t_col)
    return outs


def fused_bind(
    spec: FieldSpec, polys: Sequence[jnp.ndarray], t: jnp.ndarray
) -> List[jnp.ndarray]:
    """Drop-in twin of mle.bind_low over all polys: (M, L) -> (M/2, L)."""
    m2 = polys[0].shape[0] // 2
    block = min(DEFAULT_BLOCK, max(128, 1 << (m2 - 1).bit_length()))
    pad = (-m2) % block
    ins = []
    for p in polys:
        pr = p.reshape(m2, 2, spec.n_limbs)
        for half in (0, 1):
            h = pr[:, half, :].T
            if pad:
                h = jnp.pad(h, ((0, 0), (0, pad)))
            ins.append(h)
    t_col = t.reshape(spec.n_limbs, 1) if t.ndim == 1 else t.reshape(-1)[: spec.n_limbs].reshape(spec.n_limbs, 1)
    outs = _fused_bind_call(spec, len(polys), tuple(ins), t_col, block, fk._INTERPRET)
    return [o[:, :m2].T for o in outs]


# -----------------------------------------------------------------------------
# zero-copy round pipeline: transposed bit-reversed "halves" layout
# -----------------------------------------------------------------------------
#
# The fused_round/fused_bind wrappers above still pay an XLA relayout per poly
# per round: the (m2, 2, L) even/odd deinterleave plus transposes materialize
# a full copy of every table before each pallas_call (~2x the kernel's own HBM
# traffic; at 2^20 the bind pass is ~97% relayout, ~3% field math).  The
# pipeline below removes every copy:
#
# * each poly lives as two device arrays ``lo, hi: uint32[n_limbs, m]``
#   (transposed; lanes = table index) where lane j holds natural pair
#   ``rev(j)`` — the BIT-REVERSED pair order.  Binding the lowest variable of
#   a bit-reversed table is contiguous (natural evens = first-half lanes,
#   odds = second-half lanes), so every round's inputs are plain BlockSpec
#   windows of the carried arrays — no gather, no transpose, no interleave.
# * :func:`bind_round_halves` fuses round r-1's bind with round r's sums in
#   ONE pallas_call: it reads the four quarter-windows of (lo, hi), binds
#   with the previous challenge, evaluates the AlgFn at t=1,2, eq-weights,
#   lane-sums, and writes the bound halves for round r+1.  Per poly per round
#   this is `read m`, `write m/2` — the information-theoretic minimum.
# * sums are order-independent, and the eq tables are generated in the same
#   bit-reversed lane order (fused_prover._eq_tables_bitrev_t), so round
#   messages — and therefore the transcript — are IDENTICAL to the natural-
#   order path (asserted in tests/test_fused_prover.py).
#
# The reference's analog is the flat rayon fold over natural order
# (dense_eq.rs:98-173); bit-reversed residency is a TPU-native choice.


@functools.lru_cache(maxsize=None)
def _bitrev_perm(k: int) -> np.ndarray:
    """Bit-reversal permutation over 2^k indices (an involution)."""
    idx = np.arange(1 << k, dtype=np.int64)
    rev = np.zeros(1 << k, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev.astype(np.int32)


def _bitrev_rows_t(x: jnp.ndarray) -> jnp.ndarray:
    """(m, L) -> (L, m) with lanes in bit-reversed index order.

    Uses the split factorization rev_k(r*2^b + c) = rev_b(c)*2^a + rev_a(r):
    two ROW gathers (large contiguous copies XLA lowers at memory speed —
    a flat per-element gather here costs ~100ms/poly at 2^19 on TPU) plus
    one transpose, fused with the final limb transposition."""
    m, L = x.shape
    k = (m - 1).bit_length() if m > 1 else 0
    if k <= 1:
        return x.T
    a = k // 2
    b = k - a
    ra = jnp.asarray(_bitrev_perm(a))
    rb = jnp.asarray(_bitrev_perm(b))
    z = x.reshape(1 << a, 1 << b, L)[ra]  # row gather, rows of 2^b*L words
    w = z.transpose(1, 0, 2)[rb]  # (2^b, 2^a, L) row gather
    return w.transpose(2, 0, 1).reshape(L, m)


def to_halves_bitrev(spec: FieldSpec, poly: jnp.ndarray):
    """(M, L) natural table -> (lo, hi) each uint32[L, M/2], lane j holding
    the natural pair rev(j): lo = evens, hi = odds.  One-time entry relayout."""
    return _bitrev_rows_t(poly[0::2]), _bitrev_rows_t(poly[1::2])


def halves_to_natural(spec: FieldSpec, b_t: jnp.ndarray) -> jnp.ndarray:
    """(L, m) bitrev-lane table -> (m, L) natural order (rev is self-inverse)."""
    m = b_t.shape[1]
    k = (m - 1).bit_length() if m > 1 else 0
    return b_t[:, jnp.asarray(_bitrev_perm(k))].T


def _tree_sum_partials(spec: FieldSpec, out: jnp.ndarray, n_outs: int):
    """Field tree-sum of per-block partials (g, 2*n_outs, L) -> (2, n_outs, L)."""
    from ..field import limbs as fl

    g = out.shape[0]
    gp = 1 << (g - 1).bit_length()
    if gp != g:
        out = jnp.concatenate(
            [out, jnp.zeros((gp - g,) + out.shape[1:], jnp.uint32)], axis=0
        )
    while out.shape[0] > 1:
        out = fl.add(spec, out[0::2], out[1::2])
    return out[0].reshape(2, n_outs, spec.n_limbs)


def _round_sums_body(spec: FieldSpec, fn: AlgFn, evens, odds, eq, out_ref):
    """Shared kernel tail: at2, AlgFn at t=1,2, eq-weight, exact lane sums.

    Eq-weighting uses NON-reduced products with one deferred two-step REDC
    per output per block (field_kernels._lane_sum_wide_t) — ~2/3 cheaper per
    element than a full Montgomery multiply, bit-identical results."""
    tops = fk.TOps(spec)
    at2 = [tops.sub(tops.add(o, o), e) for o, e in zip(odds, evens)]
    f1 = fn.ops_fn(tops, odds)
    f2 = fn.ops_fn(tops, at2)
    rows = []
    for outs in (f1, f2):
        for o in outs:
            w = fk._mul_wide_t(spec, o, eq)
            rows.append(fk._lane_sum_wide_t(spec, w)[:, 0])
    out_ref[0] = jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("spec", "fn", "block", "interpret"))
def _round_halves_call(
    spec: FieldSpec,
    fn: AlgFn,
    ins: tuple,  # lo0, hi0, lo1, hi1, ... each (L, m)
    eq_t: jnp.ndarray,  # (L, >=m): only the first m lanes (prefix) are read
    block: int,
    interpret: bool,
):
    n = spec.n_limbs
    m = ins[0].shape[1]
    grid = (m // block,)

    def kernel(*refs):
        in_refs = refs[: 2 * fn.n_ins]
        eq_ref = refs[2 * fn.n_ins]
        out_ref = refs[2 * fn.n_ins + 1]
        evens = [in_refs[2 * k][:] for k in range(fn.n_ins)]
        odds = [in_refs[2 * k + 1][:] for k in range(fn.n_ins)]
        _round_sums_body(spec, fn, evens, odds, eq_ref[:], out_ref)

    bspec = lambda: pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m // block, 2 * fn.n_outs, n), jnp.uint32),
        grid=grid,
        in_specs=[bspec() for _ in range(2 * fn.n_ins + 1)],
        out_specs=pl.BlockSpec(
            (1, 2 * fn.n_outs, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*ins, eq_t)
    return _tree_sum_partials(spec, out, fn.n_outs)


# Pure-jnp emulation of the halves kernels (same block math, no pallas):
# XLA:CPU compiles interpret-mode pallas programs of this size in minutes,
# so tests of the ORCHESTRATION (transcript identity) run with emulation
# while the per-kernel interpret tests anchor the pallas semantics.
import os as _os

_EMULATE = _os.environ.get("GKR_MSM_PALLAS_EMULATE", "0") == "1"


def _emulate_sums(spec, fn, evens, odds, eq_std):
    """Round sums via the vectorized fl ops on standard-layout (m, L) arrays.

    Exact mod-p sums are order-independent, so this is bit-identical to the
    kernel's per-block partials + tree; the fl path compiles in seconds on
    XLA:CPU where the TOps per-limb graphs take minutes."""
    from ..field import limbs as fl
    from ..poly import mle

    at2 = [fl.sub(spec, fl.add(spec, o, o), e) for o, e in zip(odds, evens)]
    f1 = fn(odds)
    f2 = fn(at2)
    rows = []
    for outs in (f1, f2):
        for o in outs:
            rows.append(mle.field_sum(spec, fl.mul(spec, o, eq_std)))
    return jnp.stack(rows).reshape(2, fn.n_outs, spec.n_limbs)


def _emulate_round_halves(spec, fn, los, his, eq_t):
    m = los[0].shape[1]
    evens = [lo.T for lo in los]
    odds = [hi.T for hi in his]
    return _emulate_sums(spec, fn, evens, odds, eq_t[:, :m].T)


def round_halves(spec: FieldSpec, fn: AlgFn, los, his, eq_t) -> jnp.ndarray:
    """Round sums on halves-resident tables -> uint32[2, n_outs, L].

    los/his: per-poly (L, m) bitrev halves; eq_t: (L, >=m) bitrev eq table
    of which only the m-lane prefix is read (prefix-slicing is how all
    rounds share ONE resident eq table — see fused_prover._eq_bitrev_table)."""
    assert _supports(fn)
    if _EMULATE:
        return _emulate_round_halves(spec, fn, los, his, eq_t)
    m = los[0].shape[1]
    block = min(DEFAULT_BLOCK, m)
    ins = []
    for lo, hi in zip(los, his):
        ins.extend((lo, hi))
    return _round_halves_call(spec, fn, tuple(ins), eq_t, block, fk._INTERPRET)


@functools.partial(jax.jit, static_argnames=("spec", "fn", "block", "interpret"))
def _bind_round_halves_call(
    spec: FieldSpec,
    fn: AlgFn,
    ins: tuple,  # per poly 4 windows-worth: (lo, hi) passed twice each
    x_col: jnp.ndarray,  # (L, 1) previous challenge (Montgomery)
    eq_t: jnp.ndarray,  # (L, >=m), m = POST-bind pair count = input lanes/2;
    # only the m-lane prefix is read
    block: int,
    interpret: bool,
):
    n = spec.n_limbs
    n_i = fn.n_ins
    m = ins[0].shape[1] // 2
    nb = m // block
    grid = (nb,)
    tops = fk.TOps(spec)

    def kernel(*refs):
        in_refs = refs[: 4 * n_i]
        x_ref = refs[4 * n_i]
        eq_ref = refs[4 * n_i + 1]
        sums_ref = refs[4 * n_i + 2]
        lo_outs = refs[4 * n_i + 3 : 4 * n_i + 3 + n_i]
        hi_outs = refs[4 * n_i + 3 + n_i :]
        x = jnp.broadcast_to(x_ref[:], (n, block))
        evens, odds = [], []
        for k in range(n_i):
            lo_a = in_refs[4 * k][:]
            hi_a = in_refs[4 * k + 1][:]
            lo_b = in_refs[4 * k + 2][:]
            hi_b = in_refs[4 * k + 3][:]
            # bind with the previous challenge; x must be the SECOND mul
            # operand (see fused_bind's Mosaic broadcast note)
            b_e = tops.add(lo_a, tops.mul(tops.sub(hi_a, lo_a), x))
            b_o = tops.add(lo_b, tops.mul(tops.sub(hi_b, lo_b), x))
            lo_outs[k][:] = b_e
            hi_outs[k][:] = b_o
            evens.append(b_e)
            odds.append(b_o)
        _round_sums_body(spec, fn, evens, odds, eq_ref[:], sums_ref)

    win = lambda off: pl.BlockSpec(
        (n, block), lambda i, off=off: (0, i + off), memory_space=pltpu.VMEM
    )
    in_specs = []
    for _ in range(n_i):
        # quarters of the logical bound table: first halves of (lo, hi) give
        # the bound evens, second halves the bound odds
        in_specs.extend([win(0), win(0), win(nb), win(nb)])
    in_specs.append(pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM))
    in_specs.append(win(0))
    out_shape = (
        [jax.ShapeDtypeStruct((nb, 2 * fn.n_outs, n), jnp.uint32)]
        + [jax.ShapeDtypeStruct((n, m), jnp.uint32) for _ in range(2 * n_i)]
    )
    out_specs = [
        pl.BlockSpec((1, 2 * fn.n_outs, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ] + [win(0) for _ in range(2 * n_i)]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*ins, x_col, eq_t)
    sums = _tree_sum_partials(spec, outs[0], fn.n_outs)
    new_los = list(outs[1 : 1 + n_i])
    new_his = list(outs[1 + n_i :])
    return sums, new_los, new_his


def _emulate_bind_round_halves(spec, fn, los, his, x_col, eq_t):
    from ..field import limbs as fl

    m = los[0].shape[1] // 2
    x = x_col.reshape(1, spec.n_limbs)
    evens, odds = [], []
    new_los, new_his = [], []
    for lo, hi in zip(los, his):
        lo_s, hi_s = lo.T, hi.T  # (2m, L)
        b = fl.add(spec, lo_s, fl.mul(spec, x, fl.sub(spec, hi_s, lo_s)))
        evens.append(b[:m])
        odds.append(b[m:])
        new_los.append(b[:m].T)
        new_his.append(b[m:].T)
    sums = _emulate_sums(spec, fn, evens, odds, eq_t[:, :m].T)
    return sums, new_los, new_his


@functools.partial(jax.jit, static_argnames=("spec", "fn", "interpret"))
def _bind_round_halves_small_call(
    spec: FieldSpec,
    fn: AlgFn,
    ins: tuple,  # per poly [lo_a, hi_a, lo_b, hi_b], each (L, m) FULL blocks
    x_col: jnp.ndarray,
    eq_t: jnp.ndarray,  # (L, m) pre-sliced
    interpret: bool,
):
    """Gridless bind+round for m < 128: Mosaic requires lane dims divisible
    by 128 OR equal to the whole array, so the quarters arrive pre-sliced."""
    n = spec.n_limbs
    n_i = fn.n_ins
    m = eq_t.shape[1]
    tops = fk.TOps(spec)

    def kernel(*refs):
        in_refs = refs[: 4 * n_i]
        x_ref = refs[4 * n_i]
        eq_ref = refs[4 * n_i + 1]
        sums_ref = refs[4 * n_i + 2]
        lo_outs = refs[4 * n_i + 3 : 4 * n_i + 3 + n_i]
        hi_outs = refs[4 * n_i + 3 + n_i :]
        x = jnp.broadcast_to(x_ref[:], (n, m))
        evens, odds = [], []
        for k in range(n_i):
            lo_a = in_refs[4 * k][:]
            hi_a = in_refs[4 * k + 1][:]
            lo_b = in_refs[4 * k + 2][:]
            hi_b = in_refs[4 * k + 3][:]
            b_e = tops.add(lo_a, tops.mul(tops.sub(hi_a, lo_a), x))
            b_o = tops.add(lo_b, tops.mul(tops.sub(hi_b, lo_b), x))
            lo_outs[k][:] = b_e
            hi_outs[k][:] = b_o
            evens.append(b_e)
            odds.append(b_o)
        _round_sums_body(spec, fn, evens, odds, eq_ref[:], sums_ref)

    full = lambda shape: pl.BlockSpec(
        shape, lambda: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out_shape = (
        [jax.ShapeDtypeStruct((1, 2 * fn.n_outs, n), jnp.uint32)]
        + [jax.ShapeDtypeStruct((n, m), jnp.uint32) for _ in range(2 * n_i)]
    )
    out_specs = [full((1, 2 * fn.n_outs, n))] + [
        full((n, m)) for _ in range(2 * n_i)
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[full((n, m)) for _ in range(4 * n_i)]
        + [full((n, 1)), full((n, m))],
        out_specs=out_specs,
        interpret=interpret,
    )(*ins, x_col, eq_t)
    sums = _tree_sum_partials(spec, outs[0], fn.n_outs)
    return sums, list(outs[1 : 1 + n_i]), list(outs[1 + n_i :])


def bind_round_halves(spec: FieldSpec, fn: AlgFn, los, his, x, eq_t):
    """Fused (bind previous challenge x) + (this round's sums): ONE kernel.

    los/his: (L, 2m) halves of the pre-bind table; eq_t: (L, >=m) bitrev eq
    table of which only the m-lane prefix is read.  Returns
    (sums[2, n_outs, L], new_los, new_his) with the bound halves at (L, m)."""
    assert _supports(fn)
    x_col = x.reshape(spec.n_limbs, 1)
    if _EMULATE:
        return _emulate_bind_round_halves(spec, fn, los, his, x_col, eq_t)
    m = los[0].shape[1] // 2
    if m < 128:
        ins = []
        for lo, hi in zip(los, his):
            ins.extend((lo[:, :m], hi[:, :m], lo[:, m:], hi[:, m:]))
        return _bind_round_halves_small_call(
            spec, fn, tuple(ins), x_col, eq_t[:, :m], fk._INTERPRET
        )
    block = min(DEFAULT_BLOCK, m)
    ins = []
    for lo, hi in zip(los, his):
        ins.extend((lo, hi, lo, hi))
    return _bind_round_halves_call(
        spec, fn, tuple(ins), x_col, eq_t, block, fk._INTERPRET
    )


@functools.partial(jax.jit, static_argnames=("spec", "n_polys", "block", "interpret"))
def _bind_halves_call(
    spec: FieldSpec,
    n_polys: int,
    ins: tuple,  # lo0, hi0, ... each (L, m)
    x_col: jnp.ndarray,
    block: int,
    interpret: bool,
):
    n = spec.n_limbs
    m = ins[0].shape[1]
    grid = (m // block,)
    tops = fk.TOps(spec)

    def kernel(*refs):
        x = jnp.broadcast_to(refs[2 * n_polys][:], (n, block))
        for k in range(n_polys):
            lo = refs[2 * k][:]
            hi = refs[2 * k + 1][:]
            refs[2 * n_polys + 1 + k][:] = tops.add(
                lo, tops.mul(tops.sub(hi, lo), x)
            )

    bspec = lambda: pl.BlockSpec((n, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n, m), jnp.uint32) for _ in range(n_polys)],
        grid=grid,
        in_specs=[bspec() for _ in range(2 * n_polys)]
        + [pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[bspec() for _ in range(n_polys)],
        interpret=interpret,
    )(*ins, x_col)
    return list(outs)


def bind_halves(spec: FieldSpec, los, his, x):
    """Boundary bind (before the scan tail): b = lo + x*(hi - lo), (L, m)."""
    m = los[0].shape[1]
    x_col = x.reshape(spec.n_limbs, 1)
    if _EMULATE:
        from ..field import limbs as fl

        xs = x_col.reshape(1, spec.n_limbs)
        return [
            fl.add(spec, lo.T, fl.mul(spec, xs, fl.sub(spec, hi.T, lo.T))).T
            for lo, hi in zip(los, his)
        ]
    block = min(DEFAULT_BLOCK, m)
    ins = []
    for lo, hi in zip(los, his):
        ins.extend((lo, hi))
    return _bind_halves_call(
        spec, len(los), tuple(ins), x_col, block, fk._INTERPRET
    )


# -----------------------------------------------------------------------------
# per-round scalar-algebra kernels
# -----------------------------------------------------------------------------
#
# The from12/interpolation/challenge algebra is ~30 scalar field ops per
# round; as XLA ops each costs ~8-15us of launch latency (~2 ms/round even
# batched).  These two kernels run the whole chain as ONE dispatch before the
# sponge and one after, on (n_limbs, k) columns in VMEM.  Values are exact
# canonical field elements, so outputs are bit-identical to the XLA chain.


@functools.lru_cache(maxsize=None)
def _inv_consts(spec: FieldSpec):
    from ..field import host as fh
    from ..field import limbs as fl

    p = spec.modulus
    return (
        tuple(int(v) for v in fl.encode_ints(spec, [fh.inv(2, p)])[0]),
        tuple(int(v) for v in fl.encode_ints(spec, [fh.inv(6, p)])[0]),
    )


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _algebra_pre_call(
    spec: FieldSpec, t1, t2, claim, eq1, eq2, eq3_3, ie3, iv2, iv6,
    interpret: bool,
):
    """Pre-sponge round algebra (after the XLA-side gamma fold): from12 +
    interpolation.  All operands are separate (L, 1) refs — Mosaic cannot
    concatenate vectors whose LANE offsets differ, so no value is ever
    extracted from a packed array by lane index; fresh results all carry
    lane offset 0, making the batched from_mont concat legal.

    Returns (L, 7): [c0, c1, c2, c3 (mont), msg0, msg1, msg2 (standard)]."""
    n = spec.n_limbs
    tops = fk.TOps(spec)

    def kernel(t1r, t2r, clr, e1r, e2r, e3r, ier, i2r, i6r, o_ref):
        t = tops
        t1v, t2v, claimv = t1r[:], t2r[:], clr[:]
        prod1 = t.mul(t1v, e1r[:])
        e2v = t.mul(t2v, e2r[:])
        u = t.mul(t.sub(t2v, t1v), e3r[:])
        prod0 = t.sub(claimv, prod1)
        e3v = t.add(u, t.mul(prod0, ier[:]))
        e0, e1v = prod0, prod1
        d1 = t.sub(e1v, e0)
        d2 = t.add(t.sub(e2v, t.double(e1v)), e0)
        d3 = t.add(
            t.sub(e3v, t.add(t.double(e2v), e2v)),
            t.sub(t.add(t.double(e1v), e1v), e0),
        )
        w2 = t.mul(d2, i2r[:])
        w3 = t.mul(d3, i6r[:])
        c0, c3 = e0, w3
        c1 = t.add(t.sub(d1, w2), t.double(w3))
        c2 = t.sub(w2, t.add(t.double(w3), w3))
        msg = fk._mont_reduce_t(
            spec,
            fk._shift_rows(
                jnp.concatenate([c0, c2, c3], axis=1), 0, 2 * n
            ),
        )  # batched from_mont
        o_ref[:] = jnp.concatenate([c0, c1, c2, c3, msg], axis=1)

    full = lambda k: pl.BlockSpec(
        (n, k), lambda: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 7), jnp.uint32),
        in_specs=[full(1) for _ in range(9)],
        out_specs=full(7),
        interpret=interpret,
    )(t1, t2, claim, eq1, eq2, eq3_3, ie3, iv2, iv6)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def _algebra_post_call(
    spec: FieldSpec, x_std, c0, c1, c2, c3, mult, c_a, c_b, interpret: bool
):
    """Post-sponge update: challenge to Montgomery, multiplier and claim.
    Separate (L, 1) refs (see _algebra_pre_call's lane-offset note).
    Returns (L, 3): [x (mont), multiplier', claim']."""
    n = spec.n_limbs
    tops = fk.TOps(spec)
    r2 = tuple(int(v) for v in np.asarray(spec.r2_limbs))

    def kernel(xr, c0r, c1r, c2r, c3r, mr, ar, br, o_ref):
        t = tops
        x = t.mul_const(xr[:], r2)
        m1 = t.mul(br[:], x)
        cx1 = t.mul(c3r[:], x)
        mult2 = t.mul(mr[:], t.add(ar[:], m1))
        claim2 = t.add(
            t.mul(t.add(t.mul(t.add(cx1, c2r[:]), x), c1r[:]), x), c0r[:]
        )
        o_ref[:] = jnp.concatenate([x, mult2, claim2], axis=1)

    full = lambda k: pl.BlockSpec(
        (n, k), lambda: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 3), jnp.uint32),
        in_specs=[full(1) for _ in range(8)],
        out_specs=full(3),
        interpret=interpret,
    )(x_std, c0, c1, c2, c3, mult, c_a, c_b)


def algebra_pre(spec, n_o, sums, claim, multiplier, gamma_pows, rcrow):
    """sums (2, n_o, L), scalars (L,), gamma_pows (n_o, L), rcrow (7, L) ->
    (c0..c3 mont (L,) each, msg_std (3, L)).

    The gamma fold runs as a few batched XLA ops; the serial from12 chain is
    one pallas dispatch."""
    from ..field import limbs as fl

    inv2_l, inv6_l = _inv_consts(spec)
    iv2 = jnp.asarray(np.array(inv2_l, dtype=np.uint32)).reshape(-1, 1)
    iv6 = jnp.asarray(np.array(inv6_l, dtype=np.uint32)).reshape(-1, 1)
    mult_s = fl.mul(spec, multiplier[None], rcrow[6][None])[0]
    w = fl.mul(spec, sums, gamma_pows[None])  # (2, n_o, L)
    acc = w[:, 0]
    for i in range(1, n_o):
        acc = fl.add(spec, acc, w[:, i])
    totals = fl.mul(spec, acc, mult_s[None])  # (2, L)
    out = _algebra_pre_call(
        spec,
        totals[0].reshape(-1, 1),
        totals[1].reshape(-1, 1),
        claim.reshape(-1, 1),
        rcrow[0].reshape(-1, 1),
        rcrow[1].reshape(-1, 1),
        rcrow[2].reshape(-1, 1),
        rcrow[3].reshape(-1, 1),
        iv2,
        iv6,
        fk._INTERPRET,
    )
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4:7].T


def algebra_post(spec, x_std, c0, c1, c2, c3, multiplier, c_a, c_b):
    """-> (x mont, multiplier', claim'), each (L,)."""
    cc = lambda v: v.reshape(-1, 1)
    out = _algebra_post_call(
        spec, cc(x_std), cc(c0), cc(c1), cc(c2), cc(c3), cc(multiplier),
        cc(c_a), cc(c_b), fk._INTERPRET,
    )
    return out[:, 0], out[:, 1], out[:, 2]


def should_use_algebra() -> bool:
    """Policy for the scalar-algebra kernels (any size: they're O(1))."""
    if fk._FORCE == "0" or _EMULATE:
        return False
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    return True


def should_use_halves(spec: FieldSpec, fn: AlgFn, m: int, tail_size: int) -> bool:
    """Policy for the zero-copy halves pipeline (fused_prover unrolled phase)."""
    if fk._FORCE == "0":
        return False
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    if fk._FORCE != "1" and tail_size < 4:
        return False  # smallest bind_round grid is tail_size/2 lanes
    return _supports(fn) and m > tail_size and m >= 2 * fk.MIN_PALLAS_ELEMS


def should_use(spec: FieldSpec, fn: AlgFn, m: int) -> bool:
    """Policy: fused kernels for large TPU-resident rounds with ops formulas."""
    if fk._FORCE == "0":
        return False
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    return _supports(fn) and m >= 2 * fk.MIN_PALLAS_ELEMS


def should_use_bind(m: int) -> bool:
    if fk._FORCE == "0":
        return False
    # GKR_MSM_PALLAS_BIND=0: route binds through XLA (bind is HBM-bound, so
    # XLA reaches similar bandwidth, and its per-shape compiles are ~10x
    # cheaper than Mosaic's — useful for one-shot multi-shape sweeps like
    # the canonical x=16 prove, where binds are the remaining shape zoo)
    if _os.environ.get("GKR_MSM_PALLAS_BIND", "1") == "0":
        return False
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    return m >= 2 * fk.MIN_PALLAS_ELEMS
