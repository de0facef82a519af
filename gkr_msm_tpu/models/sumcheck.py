"""Sumcheck engines: the generic round loop + the dense deg-2 eq prover.

TPU-native re-design of the reference's cleanup sumcheck stack
(/root/reference/src/cleanup/protocols/sumcheck.rs:49-128 generic loop,
sumchecks/dense_eq.rs DenseDeg2Sumcheck, sumchecks/vecvec_eq.rs:193-216
UnivarFormat::from12).  Design:

* the O(N) table plane (polys, eq tables) lives on device as limb arrays;
  each round a jitted reduction produces 2*n_outs scalars (f-evals at t=1,2
  per output), which move to host;
* the O(1) scalar plane (claims, gamma folding, the from12 eq-factor
  algebra, transcript) is exact Python ints;
* binding is a vectorized device fold that halves the table.

The deg-2/eq optimization is kept: per round only evals at t=1 and t=2 are
computed; t=0 falls out of the claim and t=3 by extrapolation (SURVEY.md
hard part #4).  Round messages are compressed (linear coefficient omitted,
sumcheck.rs:14-31), challenges are 128-bit.

Protocol convention (matches reference): rounds bind the LOWEST variable;
the final point is the reversed challenge list, so point[0] pairs with the
poly's MSB.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly import mle
from ..ops.poly.algfn import AlgFn, apply_fn
from ..ops.poly.rect import RectPoly, _exec_pads
from ..utils.transcript import Transcript

SUMCHECK_CHALLENGE_BITS = 128  # proof_transcript.rs:8

import os as _os

# Rounds with live tables below this size run through a FIXED-shape kernel
# with zero-padded eq weights (exact: padded lanes carry eq = 0, and the
# plain objects' fns satisfy f(0,..,0) = 0).  This collapses the per-round
# shape zoo (each halving is a fresh XLA compile) to one compile per fn.
FIXED_ROUND_SIZE = 1 << int(_os.environ.get("GKR_MSM_FIXED_ROUND_LOG", "10"))


def _zpad_axis0(arr: jnp.ndarray, size: int) -> jnp.ndarray:
    n = arr.shape[0]
    if n >= size:
        return arr
    pad = jnp.zeros((size - n,) + arr.shape[1:], dtype=arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


def _round_pad(polys, eq_tbl):
    """Pad (polys, eq) to the fixed round size when below it."""
    m = polys[0].shape[0]
    if m >= FIXED_ROUND_SIZE:
        return polys, eq_tbl
    t = FIXED_ROUND_SIZE
    polys = [_zpad_axis0(p, t) for p in polys]
    if eq_tbl is not None:
        eq_tbl = _zpad_axis0(eq_tbl, t // 2)
    return polys, eq_tbl


@dataclasses.dataclass
class SinglePointClaims:
    """Evaluation claims about several polys at one point (sumcheck.rs:630)."""

    point: List[int]
    evs: List[int]

    def __eq__(self, other):
        return self.point == other.point and self.evs == other.evs


# -----------------------------------------------------------------------------
# device round kernels
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def _round_sums_rect(
    spec: FieldSpec,
    polys: tuple,
    fn: AlgFn,
    eq_seg: jnp.ndarray,
    row_coefs: jnp.ndarray,
) -> jnp.ndarray:
    """Rect round sums: f at t=1,2 over the (rows x cap/2) pair grid, weighted
    by the in-capacity eq table (pairs axis) and row eq coefs (rows axis).

    polys: each uint32[R, C, L]; eq_seg: uint32[C/2, L]; row_coefs: uint32[R, L].
    Returns uint32[2, n_outs, L].  Mirrors vecvec_eq.rs:302-388 with pads
    materialized (the logical-tail correction is added on host).
    """
    odds = [p[:, 1::2] for p in polys]
    evens = [p[:, 0::2] for p in polys]
    at2 = [fl.sub(spec, fl.add(spec, o, o), e) for o, e in zip(odds, evens)]
    f1 = fn(odds)
    f2 = fn(at2)
    sums = []
    for outs in (f1, f2):
        per_out = []
        for o in outs:
            w = fl.mul(spec, o, eq_seg[None])
            # sum over pair axis, weight rows, sum over rows
            rowsum = _axis_field_sum(spec, w, axis=1)
            rowsum = fl.mul(spec, rowsum, row_coefs)
            per_out.append(_axis_field_sum(spec, rowsum, axis=0))
        sums.append(jnp.stack(per_out))
    return jnp.stack(sums)


def _axis_field_sum(spec: FieldSpec, arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Tree-sum field elements over a power-of-two axis."""
    arr = jnp.moveaxis(arr, axis, 0)
    m = arr.shape[0]
    assert m & (m - 1) == 0
    while m > 1:
        arr = fl.add(spec, arr[0::2], arr[1::2])
        m //= 2
    return arr[0]


@functools.partial(jax.jit, static_argnums=(0,))
def _rect_eq_flat(
    spec: FieldSpec, row_coefs: jnp.ndarray, eq_seg: jnp.ndarray
) -> jnp.ndarray:
    """Outer product row_coefs (R, L) x eq_seg (C/2, L) -> (R*C/2, L)."""
    r = row_coefs.shape[0]
    c2 = eq_seg.shape[0]
    w = fl.mul(
        spec,
        jnp.broadcast_to(row_coefs[:, None], (r, c2, spec.n_limbs)),
        jnp.broadcast_to(eq_seg[None], (r, c2, spec.n_limbs)),
    )
    return w.reshape(r * c2, spec.n_limbs)


@functools.partial(jax.jit, static_argnums=(0,))
def _bind_rect(spec: FieldSpec, polys: tuple, t: jnp.ndarray) -> tuple:
    """Bind the lowest row variable on each rect poly (capacity halves)."""
    out = []
    for p in polys:
        even = p[:, 0::2]
        odd = p[:, 1::2]
        out.append(fl.add(spec, even, fl.mul(spec, t[None, None], fl.sub(spec, odd, even))))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _round_sums(
    spec: FieldSpec,
    polys: Sequence[jnp.ndarray],
    fn: AlgFn,
    eq_tbl: jnp.ndarray,
) -> jnp.ndarray:
    """f-evals at t=1 and t=2, eq-weighted and summed over the hypercube.

    polys: current tables (m, L); eq_tbl: (m/2, L) eq table over high vars.
    Returns (2, n_outs, L): [sum_i eq[i] f(odds)[i], sum_i eq[i] f(2odd-even)[i]].
    """
    odds = [p[1::2] for p in polys]
    evens = [p[0::2] for p in polys]
    at2 = [fl.sub(spec, fl.add(spec, o, o), e) for o, e in zip(odds, evens)]
    f1 = fn(odds)
    f2 = fn(at2)
    sums = []
    for outs in (f1, f2):
        weighted = [fl.mul(spec, o, eq_tbl) for o in outs]
        sums.append(jnp.stack([mle.field_sum(spec, w) for w in weighted]))
    return jnp.stack(sums)


def _bind_all(spec: FieldSpec, polys, t: jnp.ndarray):
    return [mle.bind_low(spec, p, t) for p in polys]


@dataclasses.dataclass
class DenseSumcheckObject:
    """Prover state for an eq-weighted sumcheck of a deg-2 AlgFn.

    Functional analog of DenseDeg2SumcheckObjectSO (dense_eq.rs:63-180).
    """

    spec: FieldSpec
    polys: List[jnp.ndarray]
    fn: AlgFn
    gamma_pows: List[int]
    claim: int
    point: List[int]  # remaining (unbound) coordinates, MSB first
    eq_tables: List[jnp.ndarray]  # prefix tables; last = current round's
    multiplier: int = 1
    challenges: dataclasses.field = None
    _cached_coeffs: Optional[List[int]] = None

    @classmethod
    def new(cls, spec, polys, fn, gamma_pows, claim, point):
        eq_tables = mle.eq_table_sequence(spec, point[:-1]) if point else []
        return cls(
            spec=spec,
            polys=list(polys),
            fn=fn,
            gamma_pows=list(gamma_pows),
            claim=claim,
            point=list(point),
            eq_tables=eq_tables,
            challenges=[],
        )

    def unipoly(self) -> List[int]:
        """Round-poly coefficients (deg 3) via the from12 trick."""
        assert self._cached_coeffs is None
        p = self.spec.modulus
        from ..ops.pallas import sumcheck_kernels as sk

        if sk.should_use(self.spec, self.fn, self.polys[0].shape[0]):
            sums = sk.fused_round(
                self.spec, self.polys, self.fn, self.eq_tables[-1]
            )
        else:
            polys_p, eq_p = _round_pad(list(self.polys), self.eq_tables[-1])
            sums = _round_sums(self.spec, polys_p, self.fn, eq_p)
        sums_host = fl.decode_ints(self.spec, sums)  # 2*n_outs ints
        n_o = self.fn.n_outs
        total1 = fh.fold_with_gamma(self.gamma_pows[1] if n_o > 1 else 0,
                                    sums_host[:n_o], p)
        total2 = fh.fold_with_gamma(self.gamma_pows[1] if n_o > 1 else 0,
                                    sums_host[n_o:], p)
        total1 = total1 * self.multiplier % p
        total2 = total2 * self.multiplier % p
        coeffs = fh.from12(total1, total2, self.point[-1], self.claim, p)
        self._cached_coeffs = coeffs
        return coeffs

    def bind(self, t: int) -> None:
        p = self.spec.modulus
        pt = self.point[-1]
        self.multiplier = (
            self.multiplier * ((1 - pt - t + 2 * pt * t) % p) % p
        )
        tl = mle.scalar(self.spec, t)
        from ..ops.pallas import sumcheck_kernels as sk

        if sk.should_use_bind(self.polys[0].shape[0]):
            self.polys = sk.fused_bind(self.spec, self.polys, tl)
        else:
            self.polys = _bind_all(self.spec, self.polys, tl)
        self.point.pop()
        self.eq_tables.pop()
        self.challenges.append(t)
        self.claim = fh.evaluate_univar(self._cached_coeffs, t, p)
        self._cached_coeffs = None

    def final_evals(self) -> List[int]:
        return [fl.decode_ints(self.spec, p[0])[0] for p in self.polys]


# -----------------------------------------------------------------------------
# generic protocol loop (sumcheck.rs:49-128)
# -----------------------------------------------------------------------------

def prove_rounds(tr: Transcript, obj, degrees: Sequence[int], claim: int):
    """Drive any sumcheck object through its rounds.

    Returns ((final_claim, point), final_evals); point is reversed challenges.
    """
    r = []
    for d in degrees:
        coeffs = obj.unipoly()
        msg = fh.compress_coefficients(coeffs)
        assert len(msg) == d
        tr.write_scalars(msg)
        x = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        r.append(x)
        obj.bind(x)
        claim = obj.claim
    r.reverse()
    return (claim, r), obj.final_evals()


def verify_rounds(tr: Transcript, degrees: Sequence[int], claim: int, p: int):
    """Verifier round loop (sumcheck.rs:63-77)."""
    r = []
    for d in degrees:
        msg = tr.read_scalars(d)
        coeffs = fh.decompress_coefficients(msg, claim, p)
        x = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        r.append(x)
        claim = fh.evaluate_univar(coeffs, x, p)
    r.reverse()
    return claim, r


# -----------------------------------------------------------------------------
# DenseDeg2Sumcheck protocol (dense_eq.rs:176-237)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class DenseDeg2Sumcheck:
    fn: AlgFn
    num_vars: int
    spec: FieldSpec = FR

    def degrees(self):
        return [self.fn.deg + 1] * self.num_vars

    def prove(self, tr: Transcript, claims: SinglePointClaims, polys):
        assert self.fn.deg == 2
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        gamma_pows = fh.make_gamma_pows(gamma, max(self.fn.n_outs, 2), p)
        folded = fh.fold_with_gamma(gamma, claims.evs, p)
        from ..parallel import context as _pctx
        from . import fused_prover as fp

        mesh = _pctx.get_mesh()
        if mesh is not None and _pctx.shardable(
            int(polys[0].shape[0]), mesh, min_per_device=4
        ):
            # multi-chip: table plane sharded over the ambient mesh, one psum
            # of O(deg) scalars per round (transcript-identical)
            from ..parallel.sharded import ShardedSumcheckObject

            obj = ShardedSumcheckObject(
                mesh, self.spec, polys, self.fn, gamma_pows, folded,
                list(claims.point),
            )
            (final_claim, point), poly_evs = prove_rounds(
                tr, obj, self.degrees(), folded
            )
        elif self.spec is FR and fp.should_use(self.fn, self.num_vars):
            # single-dispatch device prover: all rounds + sponge on device,
            # byte-identical transcript (models/fused_prover.py)
            (final_claim, point), poly_evs = fp.prove_rounds_device(
                tr, self.fn, list(polys), list(claims.point), gamma_pows, folded
            )
        else:
            obj = DenseSumcheckObject.new(
                self.spec, polys, self.fn, gamma_pows, folded, claims.point
            )
            (final_claim, point), poly_evs = prove_rounds(
                tr, obj, self.degrees(), folded
            )
        tr.write_scalars(poly_evs)
        return SinglePointClaims(point=point, evs=poly_evs), None

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        folded = fh.fold_with_gamma(gamma, claims.evs, p)
        ev, out_point = verify_rounds(tr, self.degrees(), folded, p)
        poly_evs = tr.read_scalars(self.fn.n_ins)
        # final combinator check (dense_eq.rs:228-232)
        f_out = _exec_on_scalars(self.spec, self.fn, poly_evs)
        expected = (
            fh.fold_with_gamma(gamma, f_out, p)
            * fh.eq_ev(claims.point, out_point, p)
            % p
        )
        assert expected == ev, "Final combinator check has failed."
        return SinglePointClaims(point=out_point, evs=poly_evs)

    def prove_layer(self, tr, claims, advice):
        return self.prove(tr, claims, advice)[0]

    def verify_layer(self, tr, claims):
        return self.verify(tr, claims)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _claims_for_map_jit(spec: FieldSpec, fn: AlgFn, polys: tuple, point_enc):
    eq = mle._eq_table(
        spec, point_enc, jnp.asarray(np.asarray(spec.one_mont, dtype=np.uint32))
    )
    outs = fn(list(polys))
    sums = [mle._field_sum(spec, fl.mul(spec, o, eq)) for o in outs]
    return jnp.stack([fl.from_mont(spec, s[None])[0] for s in sums])


def claims_for_map(
    spec: FieldSpec, fn: AlgFn, polys: Sequence[jnp.ndarray], point: Sequence[int]
) -> SinglePointClaims:
    """Direct eq-weighted evaluation claims for fn over polys at point — the
    whole pass (eq table, map, weighted sums) in ONE jitted program."""
    pt = mle.encode_point(spec, list(point))
    std = _claims_for_map_jit(spec, fn, tuple(polys), pt)
    evs = fl.decode_ints(spec, std, mont=False)
    return SinglePointClaims(point=list(point), evs=evs)


def _exec_on_scalars(spec: FieldSpec, fn: AlgFn, scalars: Sequence[int]) -> List[int]:
    """Run an AlgFn on host scalars by round-tripping through 1-element arrays."""
    args = [jnp.asarray(fl.encode_ints(spec, [s])) for s in scalars]
    outs = apply_fn(fn, args)
    return [fl.decode_ints(spec, o)[0] for o in outs]


# -----------------------------------------------------------------------------
# Plain (non-Gruen) sumcheck: gamma-folded multi-output fn, optional eq input
# (sumcheck.rs:283-347 DenseSumcheckObjectSO + EqWrapper/GammaWrapper)
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _plain_round_multi(
    spec: FieldSpec,
    fn: AlgFn,
    with_eq: bool,
    total_deg: int,
    polys: tuple,
    gammas: jnp.ndarray,
) -> jnp.ndarray:
    """Evals at t = 1..total_deg of sum_x gammafold(f(polys(x))) [* eq(x)].

    polys: n_ins arrays (+ the eq table LAST if with_eq).  Iterated-difference
    extrapolation: args_t = odd + (t-1)(odd - even).  Returns (total_deg, L).
    """
    evens = [pp[0::2] for pp in polys]
    odds = [pp[1::2] for pp in polys]
    diffs = [fl.sub(spec, o, e) for o, e in zip(odds, evens)]
    vals = list(odds)
    totals = []
    for t in range(1, total_deg + 1):
        if t > 1:
            vals = [fl.add(spec, v, d) for v, d in zip(vals, diffs)]
        outs = fn(vals[: fn.n_ins])
        acc = None
        for i, o in enumerate(outs):
            w = fl.mul(spec, o, gammas[i][None]) if i > 0 else o
            acc = w if acc is None else fl.add(spec, acc, w)
        if with_eq:
            acc = fl.mul(spec, acc, vals[-1])
        m = acc.shape[0]
        while m > 1:
            acc = fl.add(spec, acc[0::2], acc[1::2])
            m //= 2
        totals.append(acc[0])
    return jnp.stack(totals)


class PlainSumcheckObject:
    """Prover state for sum_x gammafold(f(...)) [* eq_point(x)]; round
    messages are FULL coefficient vectors of degree total_deg.

    With with_eq, the eq table over `point` is materialized and appended as
    an extra bound input (the reference's naive DenseEqSumcheckObject,
    sumcheck.rs:380-416); total degree is fn.deg + 1.
    """

    def __init__(self, spec, polys, fn, gamma, claim, point=None):
        self.spec = spec
        self.fn = fn
        self.with_eq = point is not None
        self.total_deg = fn.deg + (1 if self.with_eq else 0)
        p = spec.modulus
        self.gamma_pows = fh.make_gamma_pows(gamma, max(fn.n_outs, 1), p)
        self.gammas_dev = jnp.asarray(fl.encode_ints(spec, self.gamma_pows))
        self.claim = claim
        self.challenges: List[int] = []
        self._cached: Optional[List[int]] = None
        polys = list(polys)
        if self.with_eq:
            polys.append(mle.eq_table(spec, point))
        self.polys = tuple(polys)

    def unipoly(self) -> List[int]:
        assert self._cached is None
        p = self.spec.modulus
        polys_p, _ = _round_pad(list(self.polys), None)
        sums = _plain_round_multi(
            self.spec, self.fn, self.with_eq, self.total_deg,
            tuple(polys_p), self.gammas_dev,
        )
        evals = fl.decode_ints(self.spec, sums)  # P(1..total_deg)
        p0 = (self.claim - evals[0]) % p
        coeffs = fh.interpolate_from_evals([p0] + evals, p)
        self._cached = coeffs
        return coeffs

    def bind(self, t: int) -> None:
        tl = mle.scalar(self.spec, t)
        self.polys = _bind_tuple(self.spec, self.polys, tl)
        self.claim = fh.evaluate_univar(self._cached, t, self.spec.modulus)
        self._cached = None
        self.challenges.append(t)

    def final_evals(self) -> List[int]:
        return [fl.decode_ints(self.spec, pp[0])[0] for pp in self.polys]


@functools.partial(jax.jit, static_argnums=(0,))
def _bind_tuple(spec: FieldSpec, polys: tuple, t: jnp.ndarray) -> tuple:
    out = []
    for pp in polys:
        even = pp[0::2]
        odd = pp[1::2]
        out.append(fl.add(spec, even, fl.mul(spec, t, fl.sub(spec, odd, even))))
    return tuple(out)


@dataclasses.dataclass
class DenseEqSumcheckNaive:
    """Eq-weighted multi-output dense sumcheck, naive (no Gruen trick) —
    the reference's DenseEqSumcheck (sumcheck.rs:831-889), used by the
    logup main phase.  Handles num_vars == 0 (no rounds, direct evals)."""

    fn: AlgFn
    num_vars: int
    spec: FieldSpec = FR

    def degrees(self):
        return [self.fn.deg + 1] * self.num_vars

    def prove(self, tr: Transcript, claims: SinglePointClaims, polys):
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        folded = fh.fold_with_gamma(gamma, claims.evs, p)
        from ..parallel import context as _pctx

        mesh = _pctx.get_mesh()
        if (
            mesh is not None
            and self.num_vars > 0
            and _pctx.shardable(int(polys[0].shape[0]), mesh, min_per_device=4)
        ):
            # multi-chip: logup-mainphase hot layers shard the table plane
            # (reference rayon parallelism, logup_mainphase.rs:149-200)
            from ..parallel.sharded import ShardedPlainSumcheckObject

            obj = ShardedPlainSumcheckObject(
                mesh, self.spec, polys, self.fn, gamma, folded,
                point=list(claims.point),
            )
        else:
            obj = PlainSumcheckObject(
                self.spec, polys, self.fn, gamma, folded, point=claims.point
            )
        (final_claim, point), poly_evs = prove_rounds(
            tr, obj, self.degrees(), folded
        )
        poly_evs = poly_evs[: self.fn.n_ins]  # drop the eq input
        tr.write_scalars(poly_evs)
        return SinglePointClaims(point=point, evs=poly_evs), None

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        folded = fh.fold_with_gamma(gamma, claims.evs, p)
        ev, out_point = verify_rounds(tr, self.degrees(), folded, p)
        poly_evs = tr.read_scalars(self.fn.n_ins)
        f_out = _exec_on_scalars(self.spec, self.fn, poly_evs)
        expected = (
            fh.fold_with_gamma(gamma, f_out, p)
            * fh.eq_ev(claims.point, out_point, p)
            % p
        )
        assert expected == ev, "Final combinator check has failed."
        return SinglePointClaims(point=out_point, evs=poly_evs)


# -----------------------------------------------------------------------------
# Rect (jagged-equivalent) deg-2 eq sumcheck — the bucket-GKR hot path
# (sumchecks/vecvec_eq.rs VecVecDeg2Sumcheck, reproduced on RectPoly)
# -----------------------------------------------------------------------------

class RectSumcheckObject:
    """Two-stage prover state: Sparse (row vars; rectangular grid + closed-form
    logical-tail corrections) degenerating into DenseSumcheckObject over the
    column vars (vecvec_eq.rs:227-250 stage switch)."""

    def __init__(self, spec, polys: Sequence[RectPoly], fn, gamma_pows, claim, point,
                 fix_cap: Optional[int] = None):
        self.spec = spec
        self.fn = fn
        self.gamma_pows = list(gamma_pows)
        self.claim = claim
        self.point = list(point)  # full point, MSB first
        self.row_logsize = polys[0].row_logsize
        self.col_logsize = polys[0].col_logsize
        assert len(point) == self.row_logsize + self.col_logsize
        self.n_data_rows = polys[0].n_data_rows
        self.row_pads = [p.row_pad for p in polys]
        self.col_pads = [p.col_pad for p in polys]
        self.datas = tuple(p.data for p in polys)
        # fixed round-kernel capacity: rounds below it are zero-padded back
        # up (exact: pad lanes carry eq = 0).  fix_cap lets a GKR pin ONE
        # capacity across all its layers so every layer's round reuses a
        # single compiled kernel per fn instead of one per (fn, capacity) —
        # the x=16 canonical run's compile sweep shrinks ~8x (VERDICT r4 #1).
        self.cap0 = max(int(self.datas[0].shape[1]), int(fix_cap or 0))
        self.k = 0  # bound row vars
        self.multiplier = 1
        self.challenges: List[int] = []
        self._cached_coeffs: Optional[List[int]] = None
        self.dense_obj: Optional[DenseSumcheckObject] = None
        p_mod = spec.modulus
        cols = self.point[: self.col_logsize]
        self.row_coefs = mle.eq_table(spec, cols) if self.col_logsize else None
        self.coef_data_sum = fh.eq_sum(cols, self.n_data_rows, p_mod)
        self.coef_pad_sum = (1 - self.coef_data_sum) % p_mod
        # pad images under f (host scalars, reused every sparse round)
        self.pad_f = _exec_on_scalars(spec, fn, self.row_pads[: fn.n_ins])
        self.col_f = _exec_on_scalars(spec, fn, self.col_pads[: fn.n_ins])

    def unipoly(self) -> List[int]:
        if self.dense_obj is not None:
            return self.dense_obj.unipoly()
        assert self._cached_coeffs is None
        p = self.spec.modulus
        n = len(self.point)
        cv = self.col_logsize
        cap = int(self.datas[0].shape[1])
        s = cap.bit_length() - 2  # log2(cap) - 1 pairs vars
        # vars above the binding var: q[cv .. n-1-k]; lowest s of them are
        # in-capacity segment vars, the rest fold as prod(1-q) (padded scale).
        seg_vars = self.point[n - 1 - self.k - s : n - 1 - self.k]
        pad_vars = self.point[cv : n - 1 - self.k - s]
        pad_scale = 1
        for v in pad_vars:
            pad_scale = pad_scale * (1 - v) % p
        eq_seg = mle.eq_table(self.spec, seg_vars, init=pad_scale)
        row_coefs = (
            self.row_coefs
            if self.row_coefs is not None
            else mle.eq_table(self.spec, [])
        )
        sums = self._round_sums_dev(self.datas, eq_seg, row_coefs)
        sums_host = fl.decode_ints(self.spec, sums)
        n_o = self.fn.n_outs
        trail = (1 - pad_scale) % p
        totals = []
        for which in (0, 1):  # t=1, t=2
            vals = []
            for o in range(n_o):
                tail = (
                    trail
                    * (
                        self.pad_f[o] * self.coef_data_sum
                        + self.col_f[o] * self.coef_pad_sum
                    )
                    % p
                )
                vals.append((sums_host[which * n_o + o] + tail) % p)
            tot = fh.fold_with_gamma(
                self.gamma_pows[1] if n_o > 1 else 0, vals, p
            )
            totals.append(tot * self.multiplier % p)
        eq1 = self.point[n - 1 - self.k]
        coeffs = fh.from12(totals[0], totals[1], eq1, self.claim, p)
        self._cached_coeffs = coeffs
        return coeffs

    # -- device hooks (overridden by parallel.sharded for multi-chip) ---------
    def _round_sums_dev(self, datas, eq_seg, row_coefs) -> jnp.ndarray:
        """Round sums over the (rows x cap/2) grid -> (2, n_outs, L)."""
        from ..ops.pallas import sumcheck_kernels as sk

        cap = int(datas[0].shape[1])
        # fixed-shape round kernel: zero-pad the capacity axis back to cap0
        # (extra lanes carry eq_seg = 0, so sums are exact)
        if cap < self.cap0:
            datas = tuple(
                jnp.concatenate(
                    [
                        d,
                        jnp.zeros(
                            (d.shape[0], self.cap0 - cap, d.shape[2]),
                            dtype=d.dtype,
                        ),
                    ],
                    axis=1,
                )
                for d in datas
            )
            eq_seg = _zpad_axis0(eq_seg, self.cap0 // 2)
        n_rows = int(datas[0].shape[0])
        m_flat = n_rows * self.cap0
        if sk.should_use(self.spec, self.fn, m_flat):
            # reuse the dense fused kernel on the flattened (rows*cap) grid:
            # pairs stay adjacent (cap is even), and the pair weight is the
            # outer product row_coefs[r] * eq_seg[c]
            eq_flat = _rect_eq_flat(self.spec, row_coefs, eq_seg)
            flat = [d.reshape(m_flat, self.spec.n_limbs) for d in datas]
            return sk.fused_round(self.spec, flat, self.fn, eq_flat)
        return _round_sums_rect(self.spec, datas, self.fn, eq_seg, row_coefs)

    def _bind_dev(self, tl: jnp.ndarray) -> tuple:
        """Bind the lowest row variable (capacity halves) on device."""
        from ..ops.pallas import sumcheck_kernels as sk

        n_rows = int(self.datas[0].shape[0])
        cap = int(self.datas[0].shape[1])
        if sk.should_use_bind(n_rows * cap):
            flat = [
                d.reshape(n_rows * cap, self.spec.n_limbs) for d in self.datas
            ]
            outs = sk.fused_bind(self.spec, flat, tl)
            return tuple(
                o.reshape(n_rows, cap // 2, self.spec.n_limbs) for o in outs
            )
        return _bind_rect(self.spec, self.datas, tl)

    def _make_dense_obj(self, cols) -> "DenseSumcheckObject":
        """Stage switch: the column vectors become a dense sumcheck."""
        obj = DenseSumcheckObject.new(
            self.spec,
            cols,
            self.fn,
            self.gamma_pows,
            self.claim,
            self.point[: self.col_logsize],
        )
        obj.multiplier = self.multiplier
        return obj

    def _repad_column(self, vals) -> jnp.ndarray:
        """(n_rows, 1, L) re-pad column (host ints -> device)."""
        n_rows = int(self.datas[0].shape[0])
        return jnp.asarray(fl.encode_ints(self.spec, vals)).reshape(
            n_rows, 1, self.spec.n_limbs
        )

    def bind(self, t: int) -> None:
        if self.dense_obj is not None:
            self.dense_obj.bind(t)
            self.claim = self.dense_obj.claim
            self.challenges.append(t)
            return
        p = self.spec.modulus
        n = len(self.point)
        qb = self.point[n - 1 - self.k]
        self.multiplier = self.multiplier * ((1 - qb - t + 2 * qb * t) % p) % p
        tl = mle.scalar(self.spec, t)
        self.datas = self._bind_dev(tl)
        self.claim = fh.evaluate_univar(self._cached_coeffs, t, p)
        self._cached_coeffs = None
        self.challenges.append(t)
        self.k += 1
        if self.k == self.row_logsize:
            cols = [d[:, 0] for d in self.datas]
            self.dense_obj = self._make_dense_obj(cols)
        elif int(self.datas[0].shape[1]) == 1:
            # re-pad rows to capacity 2 (value, pad) for further row binds
            n_rows = int(self.datas[0].shape[0])
            new = []
            for d, rp, cp in zip(self.datas, self.row_pads, self.col_pads):
                vals = [rp] * self.n_data_rows + [cp] * (n_rows - self.n_data_rows)
                col = self._repad_column(vals)
                new.append(jnp.concatenate([d, col], axis=1))
            self.datas = tuple(new)

    def final_evals(self) -> List[int]:
        assert self.dense_obj is not None
        return self.dense_obj.final_evals()


@dataclasses.dataclass
class RectDeg2Sumcheck:
    """Protocol: eq-weighted deg-2 sumcheck over rect (jagged) polys
    (vecvec_eq.rs:400-467).  GKR-layer compatible."""

    fn: AlgFn
    num_vars: int
    col_logsize: int
    spec: FieldSpec = FR

    def degrees(self):
        return [self.fn.deg + 1] * self.num_vars

    def prove(self, tr: Transcript, claims: SinglePointClaims, polys):
        assert self.fn.deg == 2
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        gamma_pows = fh.make_gamma_pows(gamma, max(self.fn.n_outs, 2), p)
        folded = fh.fold_with_gamma(gamma, claims.evs, p)
        from ..parallel import context as _pctx
        from . import fused_prover as fp

        row_rounds = self.num_vars - self.col_logsize
        same_shape = all(
            p.capacity == polys[0].capacity
            and p.n_data_rows == polys[0].n_data_rows
            for p in polys
        )
        mesh = _pctx.get_mesh()
        if (
            mesh is not None
            and self.col_logsize > 0
            and row_rounds > 0
            and _pctx.shardable(1 << self.col_logsize, mesh)
        ):
            # multi-chip: bucket rows sharded over the mesh (the rayon
            # per-row parallelism at vecvec_eq.rs:302-388 on the mesh axis)
            from ..parallel.sharded import ShardedRectSumcheckObject

            obj = ShardedRectSumcheckObject(
                mesh, self.spec, polys, self.fn, gamma_pows, folded,
                list(claims.point),
            )
            (final_claim, point), poly_evs = prove_rounds(
                tr, obj, self.degrees(), folded
            )
        elif (
            self.spec is FR
            and self.col_logsize > 0
            and row_rounds > 0
            and same_shape
            and fp.should_use_small(self.fn)
        ):
            # the ENTIRE rect sumcheck (sparse rows + dense columns) runs as
            # one device dispatch (byte-identical transcript, tested in
            # test_pallas_sumcheck)
            (final_claim, point), poly_evs = fp.prove_rect_rounds_device(
                tr, self.fn, polys, list(claims.point), gamma_pows, folded
            )
        else:
            obj = RectSumcheckObject(
                self.spec, polys, self.fn, gamma_pows, folded, claims.point,
                fix_cap=getattr(self, "kernel_cap", None),
            )
            (final_claim, point), poly_evs = prove_rounds(
                tr, obj, self.degrees(), folded
            )
        poly_evs = poly_evs[: self.fn.n_ins]
        tr.write_scalars(poly_evs)
        return SinglePointClaims(point=point, evs=poly_evs), None

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        folded = fh.fold_with_gamma(gamma, claims.evs, p)
        ev, out_point = verify_rounds(tr, self.degrees(), folded, p)
        poly_evs = tr.read_scalars(self.fn.n_ins)
        f_out = _exec_on_scalars(self.spec, self.fn, poly_evs)
        expected = (
            fh.fold_with_gamma(gamma, f_out, p)
            * fh.eq_ev(claims.point, out_point, p)
            % p
        )
        assert expected == ev, "Final combinator check has failed."
        return SinglePointClaims(point=out_point, evs=poly_evs)

    def prove_layer(self, tr, claims, advice):
        return self.prove(tr, claims, advice)[0]

    def verify_layer(self, tr, claims):
        return self.verify(tr, claims)
