"""The legacy round-driven protocol generation, rebuilt natively.

Port targets (all under /root/reference/src/):
  * protocol/protocol.rs:16-33      — MultiEvalClaim / EvalClaim
  * protocol/sumcheck.rs:25-257     — SumcheckPolyMap over FragmentedPoly
                                      with copolynomial eq handling
                                      (FragmentedLincomb :66-156), params
                                      :295-298, to_multieval :300-304,
                                      folded builders :659-699
  * protocol/sumcheck.rs:262-523    — LameSumcheckPolyMap (dense polyfill)
  * protocol/split.rs:26-115        — Split (even/odd eval folding)
  * protocol/split_at.rs:34-123     — SplitAt (fold by an arbitrary var)
  * protocol/bintree.rs:13-396      — queue-driven layered GKR
  * protocol/generic_gkr.rs:261-356 — registry-generalized GKR driver,
    instantiated for bintree-add (:15-266) and triangle-add
    (protocol/triangle.rs:54-356)
  * transcript.rs:27-102            — label-based transcript API +
                                      IndexedProofTranscript round counter

models/legacy.py already adapts any ONE-SHOT protocol to the
`round(challenge)` shape via a transcript pump; this module is the other
half of parity: the protocols the reference implements NATIVELY in the
round-driven style, over the fragmented polynomial stack
(ops/poly/fragmented.py + ops/poly/copoly.py).  Everything here is
host-side exact-int scalar plane: the legacy generation is superseded by
the cleanup pipeline for the TPU hot path (SURVEY.md §7.12) and exists for
API/behavior coverage, tested by the same prover<->verifier round-trip
patterns as the reference (SURVEY.md §4.1).

Round-message encoding deviation (documented): round unipolys are sent as
their evaluations at 0..deg+1 rather than liblasso UniPoly coefficients —
the transcript is SHA-256, not merlin, so byte parity is out of scope
(README "documented deviations"); claim algebra is identical.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple, Union

from ..ops.field.spec import FR
from ..ops.poly.copoly import Copolynomial, CopolyData, EqPoly
from ..ops.poly.fragmented import FragmentedPoly, Shape
from .legacy import PolynomialMapping

P = FR.modulus


# -----------------------------------------------------------------------------
# claims (protocol/protocol.rs:16-33)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class EvalClaim:
    point: List[int]
    evs: List[int]


@dataclasses.dataclass
class MultiEvalClaim:
    """Several points; per point a sparse list of (output index, ev)."""

    points: List[List[int]]
    evs: List[List[Tuple[int, int]]]


def to_multieval(claim: EvalClaim) -> MultiEvalClaim:
    """protocol/sumcheck.rs:300-304."""
    return MultiEvalClaim(
        points=[list(claim.point)],
        evs=[list(enumerate(claim.evs))],
    )


# -----------------------------------------------------------------------------
# label-based transcript (transcript.rs:27-102)
# -----------------------------------------------------------------------------

class LegacyTranscript:
    """TranscriptSender/TranscriptReceiver with labels, over the same
    SHA-256 sponge as utils.transcript: `append_scalars(label, ...)`
    absorbs, `challenge_scalar(label)` squeezes.  IndexedProofTranscript's
    global challenge counter (transcript.rs:47-68) is `n_challenges`."""

    def __init__(self, label: bytes = b"legacy"):
        from ..utils.transcript import Transcript

        self._tr = Transcript(label)
        self.n_challenges = 0

    def append_scalars(self, label: bytes, scalars: Sequence[int]) -> None:
        self._tr._absorb(label)
        self._tr.write_scalars(list(scalars))

    def append_scalar(self, label: bytes, scalar: int) -> None:
        self.append_scalars(label, [scalar])

    def challenge_scalar(self, label: bytes) -> Challenge:
        self._tr._absorb(label)
        self.n_challenges += 1
        return Challenge(self._tr.challenge(128))

    def proof_bytes(self) -> bytes:
        return bytes(self._tr._proof)


@dataclasses.dataclass
class Challenge:
    value: int


# -----------------------------------------------------------------------------
# univariate round messages (evaluation form)
# -----------------------------------------------------------------------------

def _lagrange_evaluate(evals: Sequence[int], x: int, p: int = P) -> int:
    """Evaluate the poly interpolating (i, evals[i]) for i = 0..len-1 at x."""
    n = len(evals)
    # weights w_i = prod_{j != i} (i - j): i! * (n-1-i)! * (-1)^(n-1-i)
    fact = [1] * n
    for i in range(1, n):
        fact[i] = fact[i - 1] * i % p
    acc = 0
    # full product prod (x - j)
    prefix = [1] * (n + 1)
    for j in range(n):
        prefix[j + 1] = prefix[j] * ((x - j) % p) % p
    suffix = [1] * (n + 1)
    for j in reversed(range(n)):
        suffix[j] = suffix[j + 1] * ((x - j) % p) % p
    for i in range(n):
        num = prefix[i] * suffix[i + 1] % p
        den = fact[i] * fact[n - 1 - i] % p
        if (n - 1 - i) % 2 == 1:
            den = (-den) % p
        acc = (acc + evals[i] * num % p * pow(den, p - 2, p)) % p
    return acc


# -----------------------------------------------------------------------------
# FragmentedLincomb sumcheckable (protocol/sumcheck.rs:36-156)
# -----------------------------------------------------------------------------

class FragmentedLincomb:
    """Sumcheckable over fragmented polys with eq copolynomials: items =
    (data ++ consts); copoly data aligns values with data and segment SUMS
    with consts, so per-item folding is exact."""

    def __init__(
        self,
        polys: List[FragmentedPoly],
        copolys: List[Copolynomial],
        folded_f: Callable[[Sequence[int]], int],
        degree: int,
    ):
        self.polys = polys
        self.copolys = copolys
        self.folded_f = folded_f
        self.degree = degree
        self._splits: Optional[Tuple] = None

    def _split(self):
        if self._splits is not None:
            return
        lr = [p.split() for p in self.polys]
        lpolys = [l for l, _ in lr]
        rpolys = [r for _, r in lr]
        co_lr = [c.materialize_split() for c in self.copolys]
        lco = [l for l, _ in co_lr]
        rco = [r for _, r in co_lr]
        self._splits = (lpolys, rpolys, lco, rco)

    def bind(self, t: int) -> None:
        self._split()
        lpolys, rpolys, _, _ = self._splits
        bound = []
        for l, r in zip(lpolys, rpolys):
            data = [(a + t * (b - a)) % P for a, b in zip(l.data, r.data)]
            consts = [(a + t * (b - a)) % P for a, b in zip(l.consts, r.consts)]
            bound.append(FragmentedPoly(data, consts, l.shape))
        self.polys = bound
        for c in self.copolys:
            c.bind(t)
            if getattr(c, "shape", None) is not None:
                c.shape = c.shape.split()  # advance with the poly shape
        self._splits = None

    def unipoly(self) -> List[int]:
        """Evals of the round poly at t = 0..degree+1 (sumcheck.rs:99-151)."""
        self._split()
        lpolys, rpolys, lco, rco = self._splits

        def items(poly: FragmentedPoly) -> List[int]:
            return list(poly.data) + list(poly.consts)

        def co_items(c: CopolyData) -> List[int]:
            return list(c.values) + list(c.sums)

        l_items = [items(p) for p in lpolys]
        r_items = [items(p) for p in rpolys]
        lc_items = [co_items(c) for c in lco]
        rc_items = [co_items(c) for c in rco]
        n_items = len(l_items[0])
        evals = []
        for t in range(self.degree + 2):
            cur = [
                [(a + t * (b - a)) % P for a, b in zip(li, ri)]
                for li, ri in zip(l_items, r_items)
            ]
            cur_co = [
                [(a + t * (b - a)) % P for a, b in zip(li, ri)]
                for li, ri in zip(lc_items, rc_items)
            ]
            total = 0
            for i in range(n_items):
                args = [c[i] for c in cur] + [c[i] for c in cur_co]
                total += self.folded_f(args)
            evals.append(total % P)
        return evals

    def final_evals(self) -> List[int]:
        return [p.get(0) for p in self.polys]


def make_folded_claim(claims: MultiEvalClaim, gamma_pows: Sequence[int]) -> int:
    i = 0
    acc = 0
    for evs in claims.evs:
        for _, ev in evs:
            acc += ev * gamma_pows[i]
            i += 1
    return acc % P


def make_folded_f(
    claims: MultiEvalClaim, gamma_pows: Sequence[int], f: PolynomialMapping
) -> Callable[[Sequence[int]], int]:
    """protocol/sumcheck.rs:674-699: args = (inputs ++ eq values); output =
    sum_j eq_j * sum_{(o, _) in evs_j} gamma^i * f(ins)[o]."""

    def folded(args: Sequence[int]) -> int:
        ins, eqs = args[: f.num_i], args[f.num_i :]
        out = f.exec_fn(ins)
        i = 0
        acc = 0
        for j, evs in enumerate(claims.evs):
            part = 0
            for o, _ in evs:
                part += out[o] * gamma_pows[i]
                i += 1
            acc += part % P * eqs[j]
        return acc % P

    return folded


# -----------------------------------------------------------------------------
# SumcheckPolyMap (protocol/sumcheck.rs:158-260, 525-658)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class SumcheckPolyMapParams:
    f: PolynomialMapping
    num_vars: int


@dataclasses.dataclass
class SumcheckPolyMapProof:
    round_poly_evals: List[List[int]]  # per round, evals at 0..deg+1
    final_evaluations: List[int]


class SumcheckPolyMapProtocol:
    """Legacy Protocol impl: static witness + round-driven prover/verifier."""

    @staticmethod
    def witness(
        args: List[FragmentedPoly], params: SumcheckPolyMapParams
    ) -> Tuple[List[List[FragmentedPoly]], List[FragmentedPoly]]:
        out = FragmentedPoly.map_over_poly(
            args, params.f.exec_fn, params.f.num_o, P
        )
        return [args], out

    Prover = None  # set below
    Verifier = None


class SumcheckPolyMapProver:
    """protocol/sumcheck.rs:175-257: first challenge folds the multi-claim
    by gamma, later challenges bind; round messages are unipoly evals."""

    def __init__(
        self,
        claims_to_reduce: MultiEvalClaim,
        trace: List[List[FragmentedPoly]],
        params: SumcheckPolyMapParams,
    ):
        self.claims = claims_to_reduce
        self.polys = list(trace[0])
        self.mapping = params.f
        self.num_vars = params.num_vars
        assert len(self.polys) == self.mapping.num_i
        self.sumcheckable: Optional[FragmentedLincomb] = None
        self.rs: List[int] = []
        self.round_polys: List[List[int]] = []

    def round(
        self, challenge: Challenge, transcript: LegacyTranscript
    ) -> Optional[Tuple[EvalClaim, SumcheckPolyMapProof]]:
        if self.sumcheckable is None:
            gamma = challenge.value
            n_claims = sum(len(e) for e in self.claims.evs)
            gamma_pows = [1] * max(1, n_claims)
            for i in range(1, n_claims):
                gamma_pows[i] = gamma_pows[i - 1] * gamma % P
            shape = self.polys[0].shape
            copolys: List[Copolynomial] = []
            for r in self.claims.points:
                eq = EqPoly(r, P)
                eq.take_shape(shape)
                copolys.append(eq)
            self.sumcheckable = FragmentedLincomb(
                self.polys,
                copolys,
                make_folded_f(self.claims, gamma_pows, self.mapping),
                self.mapping.degree,
            )
        else:
            r_j = challenge.value
            self.rs.insert(0, r_j)  # fix_var_bot
            self.sumcheckable.bind(r_j)

        if len(self.rs) == self.num_vars:
            final_evaluations = self.sumcheckable.final_evals()
            final = final_evaluations[: self.mapping.num_i]
            transcript.append_scalars(b"sumcheck_final_evals", final)
            return (
                EvalClaim(point=list(self.rs), evs=final),
                SumcheckPolyMapProof(
                    round_poly_evals=self.round_polys, final_evaluations=final
                ),
            )

        evals = self.sumcheckable.unipoly()
        transcript.append_scalars(b"poly", evals)
        self.round_polys.append(evals)
        return None


class SumcheckPolyMapVerifier:
    """protocol/sumcheck.rs:525-658 mirror: replays round messages, checks
    q(0)+q(1) == claim each round, final check against folded_f on the
    final evaluations with verifier-computed eq evals."""

    def __init__(
        self,
        claims_to_reduce: MultiEvalClaim,
        proof: SumcheckPolyMapProof,
        params: SumcheckPolyMapParams,
    ):
        self.claims = claims_to_reduce
        self.proof = proof
        self.params = params
        self.num_vars = params.num_vars
        self.round_idx = 0
        self.gamma_pows: Optional[List[int]] = None
        self.current_sum = 0
        self.rs: List[int] = []

    def round(
        self, challenge: Challenge, transcript: LegacyTranscript
    ) -> Optional[EvalClaim]:
        if self.gamma_pows is None:
            gamma = challenge.value
            n_claims = sum(len(e) for e in self.claims.evs)
            self.gamma_pows = [1] * max(1, n_claims)
            for i in range(1, n_claims):
                self.gamma_pows[i] = self.gamma_pows[i - 1] * gamma % P
            self.current_sum = make_folded_claim(self.claims, self.gamma_pows)
        else:
            r_j = challenge.value
            self.rs.insert(0, r_j)
            evals = self.proof.round_poly_evals[self.round_idx - 1]
            self.current_sum = _lagrange_evaluate(evals, r_j)

        if self.round_idx == self.num_vars:
            final = self.proof.final_evaluations
            transcript.append_scalars(b"sumcheck_final_evals", final)
            folded = make_folded_f(self.claims, self.gamma_pows, self.params.f)
            eq_evs = [
                EqPoly(pt, P).ev(self.rs) for pt in self.claims.points
            ]
            check = folded(list(final) + eq_evs)
            assert check == self.current_sum, "sumcheck final check failed"
            return EvalClaim(point=list(self.rs), evs=list(final))

        evals = self.proof.round_poly_evals[self.round_idx]
        assert (evals[0] + evals[1]) % P == self.current_sum, (
            f"round {self.round_idx}: q(0)+q(1) != claim"
        )
        assert len(evals) == self.params.f.degree + 2
        transcript.append_scalars(b"poly", evals)
        self.round_idx += 1
        return None


SumcheckPolyMapProtocol.Prover = SumcheckPolyMapProver
SumcheckPolyMapProtocol.Verifier = SumcheckPolyMapVerifier


class LameSumcheckPolyMap(SumcheckPolyMapProtocol):
    """Dense polyfill (protocol/sumcheck.rs:262-523): same protocol driven
    on fully-dense fragmented polys."""

    @staticmethod
    def witness(args, params):
        dense = [FragmentedPoly.from_dense(a.vec()) for a in args]
        return SumcheckPolyMapProtocol.witness(dense, params)


# -----------------------------------------------------------------------------
# Split / SplitAt (protocol/split.rs:26-115, split_at.rs:34-123)
# -----------------------------------------------------------------------------

class SplitProtocol:
    @staticmethod
    def witness(args: List[FragmentedPoly], _params=None):
        lr = [p.split() for p in args]
        out = [l for l, _ in lr] + [r for _, r in lr]
        return [args], out


class SplitProver:
    def __init__(self, claims_to_reduce: EvalClaim, _trace=None, _params=None):
        self.claims = claims_to_reduce
        self.done = False

    def round(self, challenge: Challenge, _transcript=None):
        assert not self.done
        self.done = True
        r = challenge.value
        evs = self.claims.evs
        half = len(evs) // 2
        evs_new = [
            (x + r * (y - x)) % P for x, y in zip(evs[:half], evs[half:])
        ]
        point = list(self.claims.point) + [r]  # fix_var_top
        return EvalClaim(point=point, evs=evs_new), None


class SplitVerifier(SplitProver):
    def round(self, challenge: Challenge, _transcript=None):
        out = super().round(challenge, _transcript)
        return out[0] if out else None


SplitProtocol.Prover = SplitProver
SplitProtocol.Verifier = SplitVerifier


@dataclasses.dataclass
class SplitAtParams:
    var: int           # variable index from the top (0 = MSB)
    poly_grp_size: int


class SplitAtProtocol:
    @staticmethod
    def witness(args: List[FragmentedPoly], params: SplitAtParams):
        lr = [p.split_at(params.var) for p in args]
        l = [x for x, _ in lr]
        r = [x for _, x in lr]
        out: List[FragmentedPoly] = []
        g = params.poly_grp_size
        for i in range(0, len(l), g):
            out.extend(l[i : i + g])
            out.extend(r[i : i + g])
        return [args], out


class SplitAtProver:
    def __init__(self, claims_to_reduce: EvalClaim, _trace, params: SplitAtParams):
        self.claims = claims_to_reduce
        self.params = params
        self.done = False

    def round(self, challenge: Challenge, _transcript=None):
        assert not self.done
        self.done = True
        r = challenge.value
        evs = self.claims.evs
        g = self.params.poly_grp_size
        chunks = [evs[i : i + g] for i in range(0, len(evs), g)]
        evs_l = [v for c in chunks[0::2] for v in c]
        evs_r = [v for c in chunks[1::2] for v in c]
        evs_new = [(x + r * (y - x)) % P for x, y in zip(evs_l, evs_r)]
        point = list(self.claims.point)
        point.insert(self.params.var, r)
        return EvalClaim(point=point, evs=evs_new), None


class SplitAtVerifier(SplitAtProver):
    def round(self, challenge: Challenge, _transcript=None):
        out = super().round(challenge, _transcript)
        return out[0] if out else None


SplitAtProtocol.Prover = SplitAtProver
SplitAtProtocol.Verifier = SplitAtVerifier


# -----------------------------------------------------------------------------
# Bintree (protocol/bintree.rs:13-396)
# -----------------------------------------------------------------------------

class Layer:
    """Layer::Mapping | Layer::Split (bintree.rs:14-64)."""

    def __init__(self, mapping: Optional[PolynomialMapping] = None,
                 split: Optional[int] = None):
        assert (mapping is None) != (split is None)
        self.mapping = mapping
        self.split = split

    @classmethod
    def new_pmap(cls, fn: Callable, degree: int, num_i: int, num_o: int) -> "Layer":
        return cls(mapping=PolynomialMapping(fn, degree, num_i, num_o))

    @classmethod
    def new_split(cls, num_polys: int) -> "Layer":
        return cls(split=num_polys)

    def num_i(self) -> int:
        return self.mapping.num_i if self.mapping else self.split

    def num_o(self) -> int:
        return self.mapping.num_o if self.mapping else 2 * self.split

    def layer_wtns(self, num_vars: int, inputs: List[FragmentedPoly]):
        if self.mapping is not None:
            return SumcheckPolyMapProtocol.witness(
                inputs, SumcheckPolyMapParams(f=self.mapping, num_vars=num_vars)
            )
        return SplitProtocol.witness(inputs)


@dataclasses.dataclass
class BintreeParams:
    layers: List[Layer]
    num_vars: int

    def unroll(self) -> List[Tuple[Layer, int]]:
        """bintree.rs:80-124: annotate layers with live num_vars; checks
        i/o counts chain and that split is never last."""
        num_vars = self.num_vars
        out = []
        last_num_o = None
        for layer in self.layers:
            if last_num_o is not None:
                assert last_num_o == layer.num_i(), "layer i/o mismatch"
            last_num_o = layer.num_o()
            out.append((layer, num_vars))
            if layer.split is not None:
                assert num_vars > 0, "cannot split a 0-variable vector"
                num_vars -= 1
        assert out[-1][0].split is None, "split cannot be the last layer"
        return out


class BintreeProtocol:
    """Queue-driven GKR: witness composes layers forward; the prover
    consumes them in reverse, switching between sumcheck-map and split
    sub-provers (bintree.rs:128-288)."""

    @staticmethod
    def witness(args: List[FragmentedPoly], params: BintreeParams):
        trace: List[List[FragmentedPoly]] = []
        output = args
        for layer, nv in params.unroll():
            layer_trace, output = layer.layer_wtns(nv, output)
            trace.extend(layer_trace)
        return trace, output


class BintreeProver:
    def __init__(self, claims_to_reduce: MultiEvalClaim, trace, params: BintreeParams):
        self.trace = list(trace)
        self.params = params.unroll()
        self.current_claims: Union[MultiEvalClaim, EvalClaim] = claims_to_reduce
        self.current_prover = None
        self.proofs: List = []

    def _start_next(self):
        current_trace = self.trace.pop()
        layer, nv = self.params.pop()
        if layer.mapping is not None:
            claims = (
                self.current_claims
                if isinstance(self.current_claims, MultiEvalClaim)
                else to_multieval(self.current_claims)
            )
            self.current_prover = SumcheckPolyMapProver(
                claims, [current_trace],
                SumcheckPolyMapParams(f=layer.mapping, num_vars=nv),
            )
        else:
            assert isinstance(self.current_claims, EvalClaim)
            self.current_prover = SplitProver(self.current_claims)

    def round(self, challenge: Challenge, transcript: LegacyTranscript):
        if self.current_prover is None:
            self._start_next()
        out = self.current_prover.round(challenge, transcript)
        if out is not None:
            claim, proof = out
            self.current_claims = claim
            self.proofs.append(proof)
            self.current_prover = None
            if not self.params:
                return self.current_claims, self.proofs
        return None


class BintreeVerifier:
    def __init__(self, claims_to_reduce: MultiEvalClaim, proofs, params: BintreeParams):
        self.proofs = list(proofs)
        self.params = params.unroll()
        self.current_claims: Union[MultiEvalClaim, EvalClaim] = claims_to_reduce
        self.current_verifier = None
        self.proof_idx = 0

    def _start_next(self):
        layer, nv = self.params.pop()
        proof = self.proofs[self.proof_idx]
        self.proof_idx += 1
        if layer.mapping is not None:
            claims = (
                self.current_claims
                if isinstance(self.current_claims, MultiEvalClaim)
                else to_multieval(self.current_claims)
            )
            self.current_verifier = SumcheckPolyMapVerifier(
                claims, proof,
                SumcheckPolyMapParams(f=layer.mapping, num_vars=nv),
            )
        else:
            assert isinstance(self.current_claims, EvalClaim)
            self.current_verifier = SplitVerifier(self.current_claims)

    def round(self, challenge: Challenge, transcript: LegacyTranscript):
        if self.current_verifier is None:
            self._start_next()
        out = self.current_verifier.round(challenge, transcript)
        if out is not None:
            self.current_claims = out
            self.current_verifier = None
            if not self.params:
                return self.current_claims
        return None


BintreeProtocol.Prover = BintreeProver
BintreeProtocol.Verifier = BintreeVerifier


# -----------------------------------------------------------------------------
# GenericGKRProtocol (protocol/generic_gkr.rs:261-356): the bintree driver
# generalized over a component registry
# -----------------------------------------------------------------------------

class GKRComponentRegistry:
    """Assoc-type bundle (generic_gkr.rs:261-300): how to build layer
    witnesses and per-layer provers/verifiers for a layer vocabulary."""

    def layer_wtns(self, layer, num_vars: int, inputs):
        raise NotImplementedError

    def make_prover(self, layer, claims, trace, num_vars: int):
        raise NotImplementedError

    def make_verifier(self, layer, claims, proof, num_vars: int):
        raise NotImplementedError

    def is_split(self, layer) -> bool:
        raise NotImplementedError


class GenericGKRProtocol:
    """Same driver as Bintree but layer handling is delegated to the
    registry (generic_gkr.rs:303-356)."""

    def __init__(self, registry: GKRComponentRegistry, layers, num_vars: int):
        self.registry = registry
        self.layers = list(layers)
        self.num_vars = num_vars

    def unroll(self):
        nv = self.num_vars
        out = []
        for layer in self.layers:
            out.append((layer, nv))
            if self.registry.is_split(layer):
                nv -= 1
        return out

    def witness(self, args):
        trace = []
        output = args
        for layer, nv in self.unroll():
            layer_trace, output = self.registry.layer_wtns(layer, nv, output)
            trace.extend(layer_trace)
        return trace, output

    def prover(self, claims, trace):
        return _GenericGKRProver(self, claims, trace)

    def verifier(self, claims, proofs):
        return _GenericGKRVerifier(self, claims, proofs)


class _GenericGKRProver:
    def __init__(self, proto: GenericGKRProtocol, claims, trace):
        self.proto = proto
        self.trace = list(trace)
        self.params = proto.unroll()
        self.current_claims = claims
        self.current = None
        self.proofs: List = []

    def round(self, challenge: Challenge, transcript):
        if self.current is None:
            t = self.trace.pop()
            layer, nv = self.params.pop()
            self.current = self.proto.registry.make_prover(
                layer, self.current_claims, [t], nv
            )
        out = self.current.round(challenge, transcript)
        if out is not None:
            claim, proof = out
            self.current_claims = claim
            self.proofs.append(proof)
            self.current = None
            if not self.params:
                return self.current_claims, self.proofs
        return None


class _GenericGKRVerifier:
    def __init__(self, proto: GenericGKRProtocol, claims, proofs):
        self.proto = proto
        self.proofs = list(proofs)
        self.params = proto.unroll()
        self.current_claims = claims
        self.current = None
        self.idx = 0

    def round(self, challenge: Challenge, transcript):
        if self.current is None:
            layer, nv = self.params.pop()
            self.current = self.proto.registry.make_verifier(
                layer, self.current_claims, self.proofs[self.idx], nv
            )
            self.idx += 1
        out = self.current.round(challenge, transcript)
        if out is not None:
            self.current_claims = out
            self.current = None
            if not self.params:
                return self.current_claims
        return None


class BintreeComponent(GKRComponentRegistry):
    """generic_gkr.rs:15-266 BintreeAddComponent: the Layer vocabulary is
    exactly Mapping|Split — reuses the legacy sub-protocols."""

    def layer_wtns(self, layer: Layer, num_vars: int, inputs):
        return layer.layer_wtns(num_vars, inputs)

    def is_split(self, layer: Layer) -> bool:
        return layer.split is not None

    def make_prover(self, layer: Layer, claims, trace, num_vars: int):
        if layer.mapping is not None:
            claims = claims if isinstance(claims, MultiEvalClaim) else to_multieval(claims)
            return SumcheckPolyMapProver(
                claims, trace, SumcheckPolyMapParams(f=layer.mapping, num_vars=num_vars)
            )
        return SplitProver(claims)

    def make_verifier(self, layer: Layer, claims, proof, num_vars: int):
        if layer.mapping is not None:
            claims = claims if isinstance(claims, MultiEvalClaim) else to_multieval(claims)
            return SumcheckPolyMapVerifier(
                claims, proof, SumcheckPolyMapParams(f=layer.mapping, num_vars=num_vars)
            )
        return SplitVerifier(claims)


# -----------------------------------------------------------------------------
# Legacy TriangleAdd (protocol/triangle.rs:54-356): the diagonal
# twisted-Edwards step fns over flattened 3-coordinate bundles, the layer
# vocabulary Mapping | SplitAt(n, var), and the params builder.  The TE
# layer formulas are shared with the cleanup generation via the field-ops
# protocol (ops/field/fieldops.py IntOps executor).
# -----------------------------------------------------------------------------

def _int_ops():
    from ..ops.field.fieldops import IntOps

    return IntOps(FR)


def _te_l1(chunk: Sequence[int]) -> List[int]:
    from ..ops.curve.bandersnatch import proj_l1_ops

    return proj_l1_ops(_int_ops(), list(chunk))


def _te_l2(chunk: Sequence[int]) -> List[int]:
    from ..ops.curve.bandersnatch import proj_l2_ops

    return proj_l2_ops(_int_ops(), list(chunk))


def _te_l3(chunk: Sequence[int]) -> List[int]:
    from ..ops.curve.bandersnatch import proj_l3_ops

    return proj_l3_ops(_int_ops(), list(chunk))


def t1_l1(pts: Sequence[int]) -> List[int]:
    """triangle.rs:273-287: inputs 4 bundles (a,b,c,d); outputs
    l1(a,c) ++ l1(b,d) ++ l1(c,d)."""
    assert len(pts) == 12
    a, b, c, d = pts[0:3], pts[3:6], pts[6:9], pts[9:12]
    return _te_l1(list(a) + list(c)) + _te_l1(list(b) + list(d)) + _te_l1(
        list(c) + list(d)
    )


def l1_i_at(depth: int) -> int:
    return 3 * 4 + 3 * 2 * depth


def l2_i_at(depth: int) -> int:
    return 4 * 2 + 4 * (depth + 1)


def l3_i_at(depth: int) -> int:
    return 4 * 2 + 4 * (depth + 1)


def l1_at(depth: int, pts: Sequence[int]) -> List[int]:
    """triangle.rs:289-299."""
    assert len(pts) == l1_i_at(depth)
    ret = t1_l1(pts[:12])
    for k in range(12, len(pts), 6):
        ret.extend(_te_l1(pts[k : k + 6]))
    assert len(ret) == l2_i_at(depth)
    return ret


def l2_at(depth: int, pts: Sequence[int]) -> List[int]:
    assert len(pts) == l2_i_at(depth)
    ret: List[int] = []
    for k in range(0, len(pts), 4):
        ret.extend(_te_l2(pts[k : k + 4]))
    assert len(ret) == l3_i_at(depth)
    return ret


def l3_at(depth: int, pts: Sequence[int]) -> List[int]:
    assert len(pts) == l3_i_at(depth)
    ret: List[int] = []
    for k in range(0, len(pts), 4):
        ret.extend(_te_l3(pts[k : k + 4]))
    assert len(ret) * 2 == l1_i_at(depth + 1)
    return ret


class TriangleAddLayer:
    """Mapping | SplitAt(n, var_idx) (triangle.rs:58-102)."""

    def __init__(self, mapping: Optional[PolynomialMapping] = None,
                 split: Optional[Tuple[int, int]] = None):
        assert (mapping is None) != (split is None)
        self.mapping = mapping
        self.split = split  # (num_polys, var_idx)

    @classmethod
    def new_pmap(cls, fn, degree, num_i, num_o) -> "TriangleAddLayer":
        return cls(mapping=PolynomialMapping(fn, degree, num_i, num_o))

    @classmethod
    def new_split(cls, num_polys: int, var_idx: int) -> "TriangleAddLayer":
        return cls(split=(num_polys, var_idx))

    def layer_wtns(self, num_vars: int, inputs):
        if self.mapping is not None:
            return SumcheckPolyMapProtocol.witness(
                inputs, SumcheckPolyMapParams(f=self.mapping, num_vars=num_vars)
            )
        n, var = self.split
        return SplitAtProtocol.witness(
            inputs, SplitAtParams(var=var, poly_grp_size=3)
        )


class TriangleAddComponent(GKRComponentRegistry):
    """generic_gkr.rs TriangleAddComponent instantiation."""

    def layer_wtns(self, layer: TriangleAddLayer, num_vars: int, inputs):
        return layer.layer_wtns(num_vars, inputs)

    def is_split(self, layer: TriangleAddLayer) -> bool:
        return layer.split is not None

    def make_prover(self, layer, claims, trace, num_vars):
        if layer.mapping is not None:
            claims = claims if isinstance(claims, MultiEvalClaim) else to_multieval(claims)
            return SumcheckPolyMapProver(
                claims, trace,
                SumcheckPolyMapParams(f=layer.mapping, num_vars=num_vars),
            )
        _, var = layer.split
        return SplitAtProver(claims, None, SplitAtParams(var=var, poly_grp_size=3))

    def make_verifier(self, layer, claims, proof, num_vars):
        if layer.mapping is not None:
            claims = claims if isinstance(claims, MultiEvalClaim) else to_multieval(claims)
            return SumcheckPolyMapVerifier(
                claims, proof,
                SumcheckPolyMapParams(f=layer.mapping, num_vars=num_vars),
            )
        _, var = layer.split
        return SplitAtVerifier(claims, None, SplitAtParams(var=var, poly_grp_size=3))


def make_triangle_add_params(num_vars: int, split_var_idx: int):
    """triangle.rs:332-351: the full legacy triangle schedule."""
    layers = [TriangleAddLayer.new_split(3, split_var_idx)]
    for d in range(num_vars - split_var_idx - 1):
        layers.extend([
            TriangleAddLayer.new_split(l1_i_at(d) // 2, split_var_idx),
            TriangleAddLayer.new_pmap(
                (lambda dd: (lambda pts: l1_at(dd, pts)))(d), 2,
                l1_i_at(d), l2_i_at(d)),
            TriangleAddLayer.new_pmap(
                (lambda dd: (lambda pts: l2_at(dd, pts)))(d), 2,
                l2_i_at(d), l3_i_at(d)),
            TriangleAddLayer.new_pmap(
                (lambda dd: (lambda pts: l3_at(dd, pts)))(d), 2,
                l3_i_at(d), l1_i_at(d + 1) // 2),
        ])
    return layers


def triangle_add_protocol(num_vars: int, split_var_idx: int) -> GenericGKRProtocol:
    return GenericGKRProtocol(
        TriangleAddComponent(), make_triangle_add_params(num_vars, split_var_idx),
        num_vars,
    )
