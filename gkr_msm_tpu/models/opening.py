"""Opening protocols: Knuckles (Protocol2 form) + multi-open reduction.

Mirrors /root/reference/src/cleanup/protocols/opening.rs (KnucklesOpening
Protocol returning a deferred pairing pair, batched by the `fin` challenge)
and multiopen_reduction.rs (reduce m openings at m points to one point via
the plain deg-2 sumcheck of sum_i gamma^i poly_i * eq_{pt_i}).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..commitments.knuckles import KnucklesProvingKey, KnucklesVerifyingKey
from ..commitments.kzg import ev
from ..ops.curve import bls12381 as g1
from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FQ, FR, FieldSpec
from ..ops.poly import mle
from ..utils.transcript import Transcript
from .sumcheck import (
    SUMCHECK_CHALLENGE_BITS,
    SinglePointClaims,
    prove_rounds,
    verify_rounds,
)

P = FR.modulus


@dataclasses.dataclass
class PointClaim:
    point: List[int]
    ev: int


@dataclasses.dataclass
class OpeningClaim:
    commitment: g1.Affine
    point: List[int]
    ev: int


# -----------------------------------------------------------------------------
# Knuckles opening (opening.rs:30-141)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class KnucklesOpeningProtocol:
    vk: KnucklesVerifyingKey
    pk: Optional[KnucklesProvingKey] = None

    def prove(self, tr: Transcript, claims: OpeningClaim, poly: Sequence[int]):
        pk = self.pk
        t, opening = pk.compute_t(poly, claims.point)
        assert opening == claims.ev % P, "Incorrect opening claim."
        t_comm = pk.kzg_pk.commit(t)
        tr.write_points([t_comm], FQ)
        x = tr.challenge(SUMCHECK_CHALLENGE_BITS)

        kx = x * pk.k % P
        t_x = ev(t, x)
        p_x = ev(poly, x)
        tr.write_scalars([t_x, p_x])
        lam = tr.challenge(SUMCHECK_CHALLENGE_BITS)

        p_lt = [(a + lam * b) % P for a, b in zip(list(poly) + [0] * (len(t) - len(poly)), t)]
        p_lt_x_proof, _ = pk.kzg_pk.open(p_lt, x)
        tr.write_points([p_lt_x_proof], FQ)

        t_kx_proof, t_kx = pk.kzg_pk.open(t, kx)
        tr.write_scalars([t_kx])
        tr.write_points([t_kx_proof], FQ)

        fin = tr.challenge(SUMCHECK_CHALLENGE_BITS)

        p_lt_comm = g1.Host.add(g1.Host.scalar_mul(lam, t_comm), claims.commitment)
        p_lt_open = (t_x * lam + p_x) % P
        a0, b0 = self.vk.kzg_vk.verify_reduce_to_pair(p_lt_comm, p_lt_x_proof, x, p_lt_open)
        a1, b1 = self.vk.kzg_vk.verify_reduce_to_pair(t_comm, t_kx_proof, kx, t_kx)
        pair = (
            g1.Host.add(a0, g1.Host.scalar_mul(fin, a1)),
            g1.Host.add(b0, g1.Host.scalar_mul(fin, b1)),
        )
        return pair, None

    def verify(self, tr: Transcript, claims: OpeningClaim):
        vk = self.vk
        t_comm = tr.read_points(1, FQ)[0]
        x = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        kx = x * vk.k % P
        t_x, p_x = tr.read_scalars(2)
        lam = tr.challenge(SUMCHECK_CHALLENGE_BITS)

        p_lt_comm = g1.Host.add(g1.Host.scalar_mul(lam, t_comm), claims.commitment)
        p_lt_open = (t_x * lam + p_x) % P
        p_lt_x_proof = tr.read_points(1, FQ)[0]
        a0, b0 = vk.kzg_vk.verify_reduce_to_pair(p_lt_comm, p_lt_x_proof, x, p_lt_open)

        t_kx = tr.read_scalars(1)[0]
        t_kx_proof = tr.read_points(1, FQ)[0]
        a1, b1 = vk.kzg_vk.verify_reduce_to_pair(t_comm, t_kx_proof, kx, t_kx)

        n = 1 << vk.num_vars
        k_pow_n_1 = pow(vk.k, n - 1, P)
        xpow = x
        eq_ev_acc = 1
        for i in range(vk.num_vars):
            r = claims.point[vk.num_vars - i - 1]
            eq_ev_acc = eq_ev_acc * ((r + (1 - r) * xpow) % P) % P
            xpow = xpow * xpow % P
        x_pow_n = xpow
        lhs = (x * ((t_kx - k_pow_n_1 * t_x) % P) + x_pow_n * claims.ev) % P
        rhs = x * p_x % P * eq_ev_acc % P
        assert lhs == rhs, "Knuckles identity check failed"

        fin = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        return (
            g1.Host.add(a0, g1.Host.scalar_mul(fin, a1)),
            g1.Host.add(b0, g1.Host.scalar_mul(fin, b1)),
        )


# -----------------------------------------------------------------------------
# MultiOpenReduction (multiopen_reduction.rs:43-117)
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def _folded_prod_round(spec: FieldSpec, n_args: int, polys: tuple, gammas: jnp.ndarray):
    """Evals at t=1,2 of sum_x sum_i gamma^i a_i(x) b_i(x); polys = a ++ b."""
    totals = []
    for which in (1, 2):
        acc = None
        for i in range(n_args):
            pa, pb = polys[i], polys[i + n_args]
            if which == 1:
                va, vb = pa[1::2], pb[1::2]
            else:
                va = fl.sub(spec, fl.add(spec, pa[1::2], pa[1::2]), pa[0::2])
                vb = fl.sub(spec, fl.add(spec, pb[1::2], pb[1::2]), pb[0::2])
            prod = fl.mul(spec, va, vb)
            prod = fl.mul(spec, prod, gammas[i][None])
            acc = prod if acc is None else fl.add(spec, acc, prod)
        m = acc.shape[0]
        while m > 1:
            acc = fl.add(spec, acc[0::2], acc[1::2])
            m //= 2
        totals.append(acc[0])
    return jnp.stack(totals)


@functools.partial(jax.jit, static_argnums=(0,))
def _bind_list(spec: FieldSpec, polys: tuple, t: jnp.ndarray) -> tuple:
    out = []
    for pp in polys:
        even = pp[0::2]
        odd = pp[1::2]
        out.append(fl.add(spec, even, fl.mul(spec, t, fl.sub(spec, odd, even))))
    return tuple(out)


class FoldedProdObject:
    """Plain (non-eq-factored) deg-2 sumcheck prover state
    (DenseSumcheckObjectSO semantics, sumcheck.rs:283-331)."""

    def __init__(self, spec, polys, n_args, gamma, claim):
        self.spec = spec
        self.polys = tuple(polys)
        self.n_args = n_args
        self.gamma_pows = fh.make_gamma_pows(gamma, n_args, spec.modulus)
        self.gammas_dev = jnp.asarray(fl.encode_ints(spec, self.gamma_pows))
        self.claim = claim
        self.challenges: List[int] = []
        self._cached: Optional[List[int]] = None

    def unipoly(self) -> List[int]:
        assert self._cached is None
        p = self.spec.modulus
        from .sumcheck import _round_pad
        polys_p, _ = _round_pad(list(self.polys), None)
        sums = _folded_prod_round(self.spec, self.n_args, tuple(polys_p), self.gammas_dev)
        p1, p2 = fl.decode_ints(self.spec, sums)
        p0 = (self.claim - p1) % p
        coeffs = fh.interpolate_from_evals([p0, p1, p2], p)
        self._cached = coeffs
        return coeffs

    def bind(self, t: int) -> None:
        tl = mle.scalar(self.spec, t)
        self.polys = _bind_list(self.spec, self.polys, tl)
        self.claim = fh.evaluate_univar(self._cached, t, self.spec.modulus)
        self._cached = None
        self.challenges.append(t)

    def final_evals(self) -> List[int]:
        return [fl.decode_ints(self.spec, pp[0])[0] for pp in self.polys]


@dataclasses.dataclass
class MultiOpenReduction:
    nvars: int
    nargs: int
    spec: FieldSpec = FR

    def prove(self, tr: Transcript, claims: List[PointClaim], advice: List[jnp.ndarray]):
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        folded = fh.fold_with_gamma(gamma, [c.ev for c in claims], p)
        polys = list(advice) + [
            mle.eq_table(self.spec, c.point) for c in claims
        ]
        obj = FoldedProdObject(self.spec, polys, self.nargs, gamma, folded)
        (final_claim, out_point), poly_evs = prove_rounds(
            tr, obj, [2] * self.nvars, folded
        )
        evs = poly_evs[: self.nargs]
        tr.write_scalars(evs)
        return SinglePointClaims(point=out_point, evs=evs), None

    def verify(self, tr: Transcript, claims: List[PointClaim]) -> SinglePointClaims:
        assert len(claims) == self.nargs
        p = self.spec.modulus
        gamma = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        gamma_pows = fh.make_gamma_pows(gamma, self.nargs, p)
        folded = fh.fold_with_gamma(gamma, [c.ev for c in claims], p)
        claim, out_point = verify_rounds(tr, [2] * self.nvars, folded, p)
        evs = tr.read_scalars(self.nargs)
        expected = 0
        for i, (e, c) in enumerate(zip(evs, claims)):
            expected = (
                expected + gamma_pows[i] * e % p * fh.eq_ev(c.point, out_point, p)
            ) % p
        assert claim == expected, "Final combinator check has failed."
        return SinglePointClaims(point=out_point, evs=evs)
