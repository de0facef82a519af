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

DEFAULT_BLOCK = 512


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
        eq = eq_ref[:]
        at2 = [tops.sub(tops.add(o, o), e) for o, e in zip(odds, evens)]
        f1 = fn.ops_fn(tops, odds)
        f2 = fn.ops_fn(tops, at2)
        rows = []
        for outs in (f1, f2):
            for o in outs:
                w = tops.mul(o, eq)
                rows.append(fk._lane_sum_t(spec, w)[:, 0])  # (L,)
        out_ref[0] = jnp.stack(rows)  # (2*n_outs, L)

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
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    return m >= 2 * fk.MIN_PALLAS_ELEMS
