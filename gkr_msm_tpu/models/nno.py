"""Non-native opening (NNO): open a commitment to a non-native-field
polynomial represented by its 64-bit limb matrix.

Completed TPU-native analog of the reference's WIP `src/n_n_o/` module
(NNOProtocol n_n_o/cleanup/matrix_poly.rs:234-344, TripleProductSumcheck
:376-541, inner_prod_lo/hi :27-83, limbed eq n_n_o/cleanup/non_native_evs.rs,
PolynomialWithZeros n_n_o/polynomial_with_zeros.rs:25-148).  The reference
module is explicitly unfinished (its NNOProtocol has no end-to-end test and
the recombination check is commented out); this implementation keeps its
architecture — limb-product response with non-flushed carries, challenge t,
triple-product sumcheck P·eq_lo·eq_hi — and completes the missing pieces:

* the verifier's recombination check  sum_d R_d 2^{64 d} == ev  (mod q);
* verifier-side evaluation of the t-folded limbed eq halves (sqrt-size
  work), closing the sumcheck's final combinator check;
* reduction of the P_t final claim to an opening claim on the committed
  limb-matrix MLE via the powers-of-t tensor point (matrix_point_for_powers).

Protocol math.  Let NNF have modulus q and L = ceil(bits(q)/64) limbs.  The
prover holds the limb matrix P(x, j) in u64 (NN_P(x) = sum_j P(x,j) 2^{64j})
and the claim NN_P(pt) = ev for an NNF point pt.  With eq_pt(x) =
eq_lo(x_lo) * eq_hi(x_hi) and EL, EH the u64 limb matrices of the two eq
halves, the integer identity

    sum_x P_int(x) EL_int(x_lo) EH_int(x_hi) = sum_d R_d 2^{64 d},
    R_d = sum_x sum_{j1+j2+j3=d} P(x,j1) EL(x_lo,j2) EH(x_hi,j3)

holds with 3L-2 coefficients R_d that fit in the native field F (for
x_logsize <= 56 with L = 6).  Reducing mod q gives the claimed evaluation;
a random t in F then collapses R to S(t) = sum_d R_d t^d, proven by a
sumcheck of sum_x P_t(x) EL_t(x_lo) EH_t(x_hi) where each factor is the
t-fold of the limb axis.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FQ, FR, FieldSpec
from ..ops.poly import mle
from ..ops.poly.algfn import AlgFn
from ..utils.transcript import Transcript
from .sumcheck import (
    PlainSumcheckObject,
    SinglePointClaims,
    _axis_field_sum,
    prove_rounds,
    verify_rounds,
    SUMCHECK_CHALLENGE_BITS,
)

PROD2 = AlgFn(
    fn=lambda args: [fl.mul(FR, args[0], args[1])],
    deg=2,
    n_ins=2,
    n_outs=1,
    name="prod2",
    ops_fn=lambda o, args: [o.mul(args[0], args[1])],
)


# -----------------------------------------------------------------------------
# partial inner products (matrix_poly.rs:27-83)
# -----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def _inner_prod_hi(spec: FieldSpec, large: jnp.ndarray, m: int, small: jnp.ndarray):
    n = large.shape[0]
    r = large.reshape(m, n // m, spec.n_limbs)
    w = fl.mul(spec, r, small[:, None])
    return _axis_field_sum(spec, w, axis=0)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _inner_prod_lo(spec: FieldSpec, large: jnp.ndarray, m: int, small: jnp.ndarray):
    n = large.shape[0]
    r = large.reshape(n // m, m, spec.n_limbs)
    w = fl.mul(spec, r, small[None])
    return _axis_field_sum(spec, w, axis=1)


def inner_prod_hi(spec: FieldSpec, large: jnp.ndarray, small: jnp.ndarray):
    """chunk i (size n/m) of `large`, scaled by small[i], summed -> (n/m, L).

    With index x = x_hi * (n/m) + x_lo this contracts the HIGH half:
    out[x_lo] = sum_{x_hi} large[x] * small[x_hi] (matrix_poly.rs:62-83).
    """
    return _inner_prod_hi(spec, large, small.shape[0], small)


def inner_prod_lo(spec: FieldSpec, large: jnp.ndarray, small: jnp.ndarray):
    """per-chunk inner products with `small` -> (n/m, L):
    out[x_hi] = sum_{x_lo} large[x] * small[x_lo] (matrix_poly.rs:27-43)."""
    return _inner_prod_lo(spec, large, small.shape[0], small)


# -----------------------------------------------------------------------------
# limb decompositions (non_native_evs.rs Eqpoly<u64>)
# -----------------------------------------------------------------------------

def to_limbs_u64(vals: Sequence[int], n_limbs: int) -> np.ndarray:
    """ints -> (n, n_limbs) uint64 little-endian 64-bit limbs."""
    out = np.zeros((len(vals), n_limbs), dtype=np.uint64)
    for i, v in enumerate(vals):
        for j in range(n_limbs):
            out[i, j] = (v >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    return out


def eq_table_host(point: Sequence[int], q: int) -> List[int]:
    """Host eq table over an NNF point (MSB-first: point[0] is the index MSB)."""
    tbl = [1]
    for pt in point:  # MSB -> LSB; each coord appends a new index LSB
        nxt = []
        for v in tbl:
            h = v * pt % q
            nxt.append((v - h) % q)
            nxt.append(h)
        tbl = nxt
    return tbl


def limbed_eq(point: Sequence[int], q: int, n_limbs: int) -> np.ndarray:
    """(2^k, n_limbs) uint64 limb matrix of the eq table over `point`."""
    return to_limbs_u64(eq_table_host(point, q), n_limbs)


# -----------------------------------------------------------------------------
# native representation matrix (matrix_poly.rs:215-231)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class MatrixPoly:
    """Limb matrix P(x, j) of a non-native polynomial's evaluation table.

    values: (x_size, y_size) uint64; logical dims are 2^x_logsize x 2^y_logsize
    with implicit zero padding (matrix_poly.rs:212-222).
    """

    x_logsize: int
    y_logsize: int
    values: np.ndarray

    @classmethod
    def from_nnf_evals(cls, nnf_vals: Sequence[int], x_logsize: int, nnf: FieldSpec):
        L = (nnf.modulus.bit_length() + 63) // 64
        y_logsize = max(1, (L - 1).bit_length())
        assert len(nnf_vals) <= 1 << x_logsize
        return cls(x_logsize, y_logsize, to_limbs_u64(list(nnf_vals), L))

    @property
    def n_limbs(self) -> int:
        return self.values.shape[1]

    def padded_mle(self, spec: FieldSpec) -> jnp.ndarray:
        """Dense (2^(x_logsize+y_logsize), L) field table of the matrix MLE,
        limb (y) vars LOWEST: index = x * 2^y_logsize + j."""
        xs, L = self.values.shape
        full = np.zeros((1 << self.x_logsize, 1 << self.y_logsize), dtype=np.uint64)
        full[:xs, :L] = self.values
        return jnp.asarray(fl.encode_ints(spec, [int(v) for v in full.reshape(-1)]))


def prover_response(
    P: np.ndarray, EL: np.ndarray, EH: np.ndarray, x_logsize: int, p: int
) -> List[int]:
    """R_d = sum_x sum_{j1+j2+j3=d} P(x,j1) EL(x_lo,j2) EH(x_hi,j3) as exact
    integers reduced into F (exact when < p; see module doc for the bound).

    Mirrors make_prover_response's non-flushed-carry accumulation
    (matrix_poly.rs:97-134) without its fixed 192-bit accumulator cap.
    """
    n = 1 << x_logsize
    L = P.shape[1]
    n_lo = EL.shape[0]
    xs = P.shape[0]
    Pb = [[int(P[i, j]) for j in range(L)] for i in range(xs)]
    R = [0] * (3 * L - 2)
    for i in range(xs):
        el = EL[i % n_lo]
        eh = EH[i // n_lo]
        # conv(P_i, el) then conv with eh, accumulated into R
        c12 = [0] * (2 * L - 1)
        for j1 in range(L):
            pj = Pb[i][j1]
            if pj == 0:
                continue
            for j2 in range(L):
                c12[j1 + j2] += pj * int(el[j2])
        for d12 in range(2 * L - 1):
            v = c12[d12]
            if v == 0:
                continue
            for j3 in range(L):
                R[d12 + j3] += v * int(eh[j3])
    return [r % p for r in R]


# -----------------------------------------------------------------------------
# triple-product sumcheck (matrix_poly.rs:376-541)
# -----------------------------------------------------------------------------

class TripleProdObject:
    """Two-stage prover state for sum_x P(x) A(x_hi) B(x_lo): stage 1 runs
    over x_lo on [PA, B] with PA = inner_prod_hi(P, A); the switch
    substitutes eq(pt_lo) into P and continues over x_hi on [P_subst, A]
    scaled by the bound B eval (matrix_poly.rs:389-483)."""

    def __init__(self, spec, p_tbl, a_tbl, b_tbl, n_vars_a, n_vars_b, claim):
        self.spec = spec
        self.p_tbl = p_tbl
        self.a_tbl = a_tbl
        self.n_vars_a = n_vars_a
        self.n_vars_b = n_vars_b
        pa = inner_prod_hi(spec, p_tbl, a_tbl)
        self.stage = PlainSumcheckObject(spec, [pa, b_tbl], PROD2, 0, claim)
        self.b_ev: Optional[int] = None
        self.rounds_done = 0
        self.challenges: List[int] = []

    @property
    def claim(self) -> int:
        c = self.stage.claim
        if self.b_ev is not None:
            c = c * self.b_ev % self.spec.modulus
        return c

    def unipoly(self) -> List[int]:
        coeffs = self.stage.unipoly()  # deg-2 product: 3 coefficients
        if self.b_ev is not None:
            coeffs = [c * self.b_ev % self.spec.modulus for c in coeffs]
        return coeffs + [0]  # declared degree 3 (MultiProd<3>)

    def bind(self, t: int) -> None:
        self.stage.bind(t)
        self.rounds_done += 1
        self.challenges.append(t)
        if self.rounds_done == self.n_vars_b and self.n_vars_a > 0:
            pa_ev, b_ev = self.stage.final_evals()
            self.b_ev = b_ev
            pt_lo = list(reversed(self.stage.challenges))
            eq_b = mle.eq_table(self.spec, pt_lo)
            p_subst = inner_prod_lo(self.spec, self.p_tbl, eq_b)
            self.stage = PlainSumcheckObject(
                self.spec, [p_subst, self.a_tbl], PROD2, 0, pa_ev
            )

    def final_evals(self) -> List[int]:
        assert self.rounds_done == self.n_vars_a + self.n_vars_b
        p_ev, a_ev = self.stage.final_evals()
        b_ev = self.b_ev if self.b_ev is not None else 1
        return [p_ev, a_ev, b_ev]


@dataclasses.dataclass
class TripleProductSumcheck:
    """Protocol: sum_x P(x) A(x_hi) B(x_lo) == claim -> evals of P, A, B at
    the sumcheck point (matrix_poly.rs:514-541)."""

    n_vars_a: int
    n_vars_b: int
    spec: FieldSpec = FR

    def degrees(self):
        return [3] * (self.n_vars_a + self.n_vars_b)

    def prove(self, tr: Transcript, sum_claim: int, p_a_b) -> SinglePointClaims:
        p_tbl, a_tbl, b_tbl = p_a_b
        obj = TripleProdObject(
            self.spec, p_tbl, a_tbl, b_tbl, self.n_vars_a, self.n_vars_b, sum_claim
        )
        (final_claim, point), evs = prove_rounds(tr, obj, self.degrees(), sum_claim)
        tr.write_scalars(evs)
        return SinglePointClaims(point=point, evs=evs)

    def verify(self, tr: Transcript, sum_claim: int) -> SinglePointClaims:
        p = self.spec.modulus
        ev, point = verify_rounds(tr, self.degrees(), sum_claim, p)
        evs = tr.read_scalars(3)
        assert evs[0] * evs[1] % p * evs[2] % p == ev, (
            "Final combinator check has failed."
        )
        return SinglePointClaims(point=point, evs=evs)


# -----------------------------------------------------------------------------
# the NNO protocol (matrix_poly.rs:234-344)
# -----------------------------------------------------------------------------

def matrix_point_for_powers(t: int, y_logsize: int, p: int) -> Tuple[List[int], int]:
    """(y_pt, scale) with eq(y_pt, j) * scale = t^j for j < 2^y_logsize:
    y_pt_k = t^(2^k) / (1 + t^(2^k)), scale = prod_k (1 + t^(2^k)).
    Reduces a powers-of-t limb fold to an MLE opening of the matrix poly.
    y_pt is returned MSB-first (matching point conventions)."""
    coords = []
    scale = 1
    tp = t % p
    for _k in range(y_logsize):
        d = (1 + tp) % p
        coords.append(tp * fh.inv(d, p) % p)
        scale = scale * d % p
        tp = tp * tp % p
    coords.reverse()
    return coords, scale


@dataclasses.dataclass
class NNOOutputClaim:
    nn_point_lo: List[int]
    nn_point_hi: List[int]
    r: List[int]  # sumcheck point over the x vars
    native_repr_eval: int  # P_t(r)
    eq_lo_t_eval: int  # EL_t(r_lo)
    eq_hi_t_eval: int  # EH_t(r_hi)
    t: int
    matrix_claim: SinglePointClaims  # opening claim on the padded matrix MLE


class NNOProtocol:
    """Opens NN_P(pt) == ev for a committed limb-matrix representation.

    The transcript is assumed to already bind the commitment to P(x, y)
    (matrix_poly.rs:233).  prove/verify reduce the non-native claim to a
    native opening claim `matrix_claim` on the padded matrix MLE (limb vars
    lowest), which a Knuckles/KZG opening protocol can then discharge.
    """

    def __init__(self, x_logsize: int, nnf: FieldSpec = FQ, spec: FieldSpec = FR):
        self.x_logsize = x_logsize
        self.nnf = nnf
        self.spec = spec
        self.L = (nnf.modulus.bit_length() + 63) // 64
        self.y_logsize = max(1, (self.L - 1).bit_length())
        self.n_vars_a = x_logsize // 2  # hi half (matrix_poly.rs:287-288)
        self.n_vars_b = x_logsize - self.n_vars_a  # lo half

    def _eq_halves(self, pt: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
        q = self.nnf.modulus
        pt_hi = list(pt)[: self.n_vars_a]
        pt_lo = list(pt)[self.n_vars_a :]
        return limbed_eq(pt_lo, q, self.L), limbed_eq(pt_hi, q, self.L)

    def _fold_t(self, tbl_u64: np.ndarray, tpows_dev) -> jnp.ndarray:
        f = jnp.asarray(
            fl.encode_ints(self.spec, [int(v) for v in tbl_u64.reshape(-1)])
        )
        w = fl.mul(self.spec, f.reshape(tbl_u64.shape[0], tbl_u64.shape[1], -1), tpows_dev[None])
        lp = 1 << (w.shape[1] - 1).bit_length()  # pad limb axis to a power of 2
        if lp != w.shape[1]:
            w = jnp.concatenate(
                [w, jnp.zeros((w.shape[0], lp - w.shape[1], w.shape[2]), w.dtype)],
                axis=1,
            )
        return _axis_field_sum(self.spec, w, axis=1)

    def _tpows(self, t: int):
        p = self.spec.modulus
        tpows = [pow(t, j, p) for j in range(self.L)]
        return tpows, jnp.asarray(fl.encode_ints(self.spec, tpows))

    def prove(self, tr: Transcript, pt: Sequence[int], ev: int, matrix: MatrixPoly):
        p = self.spec.modulus
        assert matrix.n_limbs == self.L
        EL, EH = self._eq_halves(pt)
        R = prover_response(matrix.values, EL, EH, self.x_logsize, p)
        tr.write_scalars(R)
        t = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        S = fh.evaluate_univar(R, t, p)
        _, tp_dev = self._tpows(t)
        # t-fold each factor's limb axis
        xs, L = matrix.values.shape
        n = 1 << self.x_logsize
        Pf = np.zeros((n, L), dtype=np.uint64)
        Pf[:xs] = matrix.values
        p_t = self._fold_t(Pf, tp_dev)
        a_t = self._fold_t(EH, tp_dev)
        b_t = self._fold_t(EL, tp_dev)
        triple = TripleProductSumcheck(self.n_vars_a, self.n_vars_b, self.spec)
        claims = triple.prove(tr, S, (p_t, a_t, b_t))
        return self._output(pt, t, claims), None

    def verify(self, tr: Transcript, pt: Sequence[int], ev: int) -> NNOOutputClaim:
        p = self.spec.modulus
        q = self.nnf.modulus
        R = tr.read_scalars(3 * self.L - 2)
        # recombination check (left as a comment in matrix_poly.rs:322-323)
        total = 0
        for d, r_d in enumerate(R):
            total += r_d << (64 * d)
        assert total % q == ev % q, "NNO recombination check failed"
        t = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        S = fh.evaluate_univar(R, t, p)
        triple = TripleProductSumcheck(self.n_vars_a, self.n_vars_b, self.spec)
        claims = triple.verify(tr, S)
        # verifier recomputes the sqrt-size eq halves and checks their evals
        _, tp_dev = self._tpows(t)
        EL, EH = self._eq_halves(pt)
        a_t = self._fold_t(EH, tp_dev)
        b_t = self._fold_t(EL, tp_dev)
        r = claims.point
        r_hi, r_lo = r[: self.n_vars_a], r[self.n_vars_a :]
        assert mle.evaluate(self.spec, a_t, r_hi) == claims.evs[1], (
            "eq_hi t-fold eval mismatch"
        )
        assert mle.evaluate(self.spec, b_t, r_lo) == claims.evs[2], (
            "eq_lo t-fold eval mismatch"
        )
        return self._output(pt, t, claims)

    def _output(self, pt, t, claims: SinglePointClaims) -> NNOOutputClaim:
        p = self.spec.modulus
        y_pt, scale = matrix_point_for_powers(t, self.y_logsize, p)
        matrix_claim = SinglePointClaims(
            point=list(claims.point) + y_pt,
            evs=[claims.evs[0] * fh.inv(scale, p) % p],
        )
        return NNOOutputClaim(
            nn_point_lo=list(pt)[self.n_vars_a :],
            nn_point_hi=list(pt)[: self.n_vars_a],
            r=list(claims.point),
            native_repr_eval=claims.evs[0],
            eq_lo_t_eval=claims.evs[2],
            eq_hi_t_eval=claims.evs[1],
            t=t,
            matrix_claim=matrix_claim,
        )


# -----------------------------------------------------------------------------
# PolynomialWithZeros (n_n_o/polynomial_with_zeros.rs:25-148)
# -----------------------------------------------------------------------------

class PolynomialWithZeros:
    """Dense MLE stored as a prefix of nonzero evals + implicit zero tail.

    Only the prefix (padded to the next power of two) is materialized; the
    high vars fold as prod(1 - pt) since the data lives in the low block.
    """

    def __init__(self, spec: FieldSpec, vals: Sequence[int], num_vars: int):
        assert len(vals) <= 1 << num_vars
        self.spec = spec
        self.num_vars = num_vars
        self.len = len(vals)
        k = (self.len - 1).bit_length() if self.len > 1 else 0
        self.log_prefix = min(k, num_vars)
        padded = list(vals) + [0] * ((1 << self.log_prefix) - len(vals))
        self.data = jnp.asarray(fl.encode_ints(spec, padded))

    def sum(self) -> int:
        return fl.decode_ints(self.spec, mle.field_sum(self.spec, self.data))[0]

    def evaluate(self, point: Sequence[int]) -> int:
        assert len(point) == self.num_vars
        p = self.spec.modulus
        lo = point[self.num_vars - self.log_prefix :]
        hi = point[: self.num_vars - self.log_prefix]
        v = (
            mle.evaluate(self.spec, self.data, lo)
            if self.log_prefix
            else fl.decode_ints(self.spec, self.data[:1])[0]
        )
        for c in hi:
            v = v * ((1 - c) % p) % p
        return v

    def bind_low(self, t: int) -> "PolynomialWithZeros":
        tl = mle.scalar(self.spec, t)
        out = PolynomialWithZeros.__new__(PolynomialWithZeros)
        out.spec = self.spec
        out.num_vars = self.num_vars - 1
        out.len = (self.len + 1) // 2
        if self.log_prefix == 0:
            out.log_prefix = 0
            out.data = self.data
            return out
        out.log_prefix = self.log_prefix - 1
        out.data = mle.bind_low(self.spec, self.data, tl)
        return out
