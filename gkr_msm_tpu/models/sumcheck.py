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
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly import mle
from ..ops.poly.algfn import AlgFn
from ..utils.transcript import Transcript

SUMCHECK_CHALLENGE_BITS = 128  # proof_transcript.rs:8


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
        sums = _round_sums(self.spec, self.polys, self.fn, self.eq_tables[-1])
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


def _exec_on_scalars(spec: FieldSpec, fn: AlgFn, scalars: Sequence[int]) -> List[int]:
    """Run an AlgFn on host scalars by round-tripping through 1-element arrays."""
    args = [jnp.asarray(fl.encode_ints(spec, [s])) for s in scalars]
    outs = fn(args)
    return [fl.decode_ints(spec, o)[0] for o in outs]
