"""Legacy round-driven protocol generation: prover<->verifier round trips
(the reference's dominant test pattern, SURVEY.md §4.1) over the
fragmented/copoly stack.

Mirrors /root/reference/src/protocol/sumcheck.rs:721-1001 (sumcheck lite /
multiclaim), split.rs:118-181, split_at tests, bintree.rs roundtrip, and
triangle.rs:357-393 — rebuilt on host ints."""
import random

import pytest

from gkr_msm_tpu.models.legacy import PolynomialMapping
from gkr_msm_tpu.models.legacy_protocols import (
    BintreeParams,
    BintreeProtocol,
    BintreeProver,
    BintreeVerifier,
    EvalClaim,
    Layer,
    LegacyTranscript,
    MultiEvalClaim,
    SplitAtParams,
    SplitAtProtocol,
    SplitProtocol,
    SumcheckPolyMapParams,
    SumcheckPolyMapProtocol,
    SumcheckPolyMapProver,
    SumcheckPolyMapVerifier,
    to_multieval,
    triangle_add_protocol,
)
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly.fragmented import FragmentedPoly, Shape

P = FR.modulus


def _pump_prover(prover, transcript):
    while True:
        ch = transcript.challenge_scalar(b"c")
        out = prover.round(ch, transcript)
        if out is not None:
            return out


def _pump_verifier(verifier, transcript):
    while True:
        ch = transcript.challenge_scalar(b"c")
        out = verifier.round(ch, transcript)
        if out is not None:
            return out


def _combfunc(ins):
    """reference test combfunc (protocol/sumcheck.rs:734-741 style)."""
    a, b = ins
    return [a * b % P, (a * a % P + b) % P, a % P]


MAPPING = PolynomialMapping(exec_fn=_combfunc, degree=2, num_i=2, num_o=3)


def _rand_polys(rng, nv, n, fragmented=True):
    if fragmented:
        shape = Shape.rand(rng, nv)
        return [FragmentedPoly.rand_with_shape(rng, shape, P) for _ in range(n)]
    return [
        FragmentedPoly.from_dense([rng.randrange(P) for _ in range(1 << nv)])
        for _ in range(n)
    ]


@pytest.mark.parametrize("nv", [2, 3, 5])
@pytest.mark.parametrize("fragmented", [False, True])
def test_sumcheck_poly_map_roundtrip(nv, fragmented):
    rng = random.Random(100 + nv + fragmented)
    polys = _rand_polys(rng, nv, 2, fragmented)
    params = SumcheckPolyMapParams(f=MAPPING, num_vars=nv)
    trace, outs = SumcheckPolyMapProtocol.witness(polys, params)

    point = [rng.randrange(P) for _ in range(nv)]
    claims = MultiEvalClaim(
        points=[point],
        evs=[[(j, o.evaluate(point, P)) for j, o in enumerate(outs)]],
    )

    tp = LegacyTranscript(b"legacy-test")
    prover = SumcheckPolyMapProver(claims, trace, params)
    (claim_new, proof) = _pump_prover(prover, tp)

    tv = LegacyTranscript(b"legacy-test")
    verifier = SumcheckPolyMapVerifier(claims, proof, params)
    claim_v = _pump_verifier(verifier, tv)

    assert claim_new.point == claim_v.point
    assert claim_new.evs == claim_v.evs
    # transcripts agree byte-for-byte (identical append sequence)
    assert tp.proof_bytes() == tv.proof_bytes()
    # final evals really are the input polys at the final point
    for p, ev in zip(polys, claim_new.evs):
        assert p.evaluate(claim_new.point, P) == ev


def test_sumcheck_poly_map_multiclaim():
    rng = random.Random(7)
    nv = 4
    polys = _rand_polys(rng, nv, 2, True)
    params = SumcheckPolyMapParams(f=MAPPING, num_vars=nv)
    trace, outs = SumcheckPolyMapProtocol.witness(polys, params)

    pts = [[rng.randrange(P) for _ in range(nv)] for _ in range(2)]
    claims = MultiEvalClaim(
        points=pts,
        evs=[
            [(j, o.evaluate(pts[0], P)) for j, o in enumerate(outs)],
            [(1, outs[1].evaluate(pts[1], P)), (2, outs[2].evaluate(pts[1], P))],
        ],
    )
    tp = LegacyTranscript(b"mc")
    prover = SumcheckPolyMapProver(claims, trace, params)
    claim_new, proof = _pump_prover(prover, tp)
    tv = LegacyTranscript(b"mc")
    claim_v = _pump_verifier(SumcheckPolyMapVerifier(claims, proof, params), tv)
    assert claim_new.point == claim_v.point and claim_new.evs == claim_v.evs


def test_sumcheck_rejects_tampered_proof():
    rng = random.Random(8)
    nv = 3
    polys = _rand_polys(rng, nv, 2, True)
    params = SumcheckPolyMapParams(f=MAPPING, num_vars=nv)
    trace, outs = SumcheckPolyMapProtocol.witness(polys, params)
    point = [rng.randrange(P) for _ in range(nv)]
    claims = MultiEvalClaim(
        points=[point],
        evs=[[(j, o.evaluate(point, P)) for j, o in enumerate(outs)]],
    )
    tp = LegacyTranscript(b"t")
    _, proof = _pump_prover(SumcheckPolyMapProver(claims, trace, params), tp)
    proof.round_poly_evals[0][1] = (proof.round_poly_evals[0][1] + 1) % P
    with pytest.raises(AssertionError):
        _pump_verifier(
            SumcheckPolyMapVerifier(claims, proof, params),
            LegacyTranscript(b"t"),
        )


def test_split_roundtrip():
    rng = random.Random(9)
    nv = 4
    polys = _rand_polys(rng, nv, 3, True)
    trace, outs = SplitProtocol.witness(polys)
    assert len(outs) == 6
    point = [rng.randrange(P) for _ in range(nv - 1)]
    claims = EvalClaim(point=point, evs=[o.evaluate(point, P) for o in outs])
    tp = LegacyTranscript(b"s")
    prover = SplitProtocol.Prover(claims)
    claim_new, _ = _pump_prover(prover, tp)
    # folded claim == original polys evaluated at extended point
    for p, ev in zip(polys, claim_new.evs):
        assert p.evaluate(claim_new.point, P) == ev
    tv = LegacyTranscript(b"s")
    claim_v = _pump_verifier(SplitProtocol.Verifier(claims), tv)
    assert claim_new.point == claim_v.point and claim_new.evs == claim_v.evs


@pytest.mark.parametrize("var", [0, 1, 2])
def test_split_at_roundtrip(var):
    rng = random.Random(10 + var)
    nv = 4
    polys = _rand_polys(rng, nv, 3, True)
    params = SplitAtParams(var=var, poly_grp_size=3)
    trace, outs = SplitAtProtocol.witness(polys, params)
    assert len(outs) == 6
    point = [rng.randrange(P) for _ in range(nv - 1)]
    claims = EvalClaim(point=point, evs=[o.evaluate(point, P) for o in outs])
    prover = SplitAtProtocol.Prover(claims, None, params)
    claim_new, _ = _pump_prover(prover, LegacyTranscript(b"sa"))
    for p, ev in zip(polys, claim_new.evs):
        assert p.evaluate(claim_new.point, P) == ev
    claim_v = _pump_verifier(
        SplitAtProtocol.Verifier(claims, None, params), LegacyTranscript(b"sa")
    )
    assert claim_new.point == claim_v.point and claim_new.evs == claim_v.evs


def _bintree_params(nv):
    f1 = PolynomialMapping(
        exec_fn=lambda v: [v[0] * v[1] % P, (v[0] + v[1]) % P],
        degree=2, num_i=2, num_o=2,
    )
    f2 = PolynomialMapping(
        exec_fn=lambda v: [(v[0] * v[3] + v[1] * v[2]) % P, (v[2] + v[3]) % P],
        degree=2, num_i=4, num_o=2,
    )
    f3 = PolynomialMapping(
        exec_fn=lambda v: [(v[0] + v[1] + v[2] + v[3]) % P],
        degree=1, num_i=4, num_o=1,
    )
    return BintreeParams(
        layers=[
            Layer(mapping=f1),
            Layer.new_split(2),
            Layer(mapping=f2),
            Layer.new_split(2),
            Layer(mapping=f3),
        ],
        num_vars=nv,
    )


def test_bintree_roundtrip():
    rng = random.Random(11)
    nv = 4
    params = _bintree_params(nv)
    polys = _rand_polys(rng, nv, 2, True)
    trace, outs = BintreeProtocol.witness(polys, params)
    final_nv = nv - 2  # two splits
    point = [rng.randrange(P) for _ in range(final_nv)]
    claims = to_multieval(
        EvalClaim(point=point, evs=[o.evaluate(point, P) for o in outs])
    )
    tp = LegacyTranscript(b"bt")
    claim_new, proofs = _pump_prover(BintreeProver(claims, trace, params), tp)
    tv = LegacyTranscript(b"bt")
    claim_v = _pump_verifier(BintreeVerifier(claims, proofs, params), tv)
    assert claim_new.point == claim_v.point and claim_new.evs == claim_v.evs
    assert tp.proof_bytes() == tv.proof_bytes()
    # final claim is about the bintree INPUT polys
    for p, ev in zip(polys, claim_new.evs):
        assert p.evaluate(claim_new.point, P) == ev


def test_generic_gkr_triangle_roundtrip():
    from gkr_msm_tpu.ops.curve import bandersnatch as bs

    rng = random.Random(12)
    nv, split_var = 3, 1
    proto = triangle_add_protocol(nv, split_var)
    # input: 3 coordinate polys of random projective Bandersnatch points
    pts = [bs.Host.random_point(rng) for _ in range(1 << nv)]
    xs, ys, zs = [], [], []
    for (x, y) in pts:
        xs.append(x)
        ys.append(y)
        zs.append(1)
    polys = [FragmentedPoly.from_dense(v) for v in (xs, ys, zs)]
    trace, outs = proto.witness(polys)
    final_nv = split_var  # every split strips one var down to split_var
    point = [rng.randrange(P) for _ in range(final_nv)]
    claims = to_multieval(
        EvalClaim(point=point, evs=[o.evaluate(point, P) for o in outs])
    )
    tp = LegacyTranscript(b"tri")
    claim_new, proofs = _pump_prover(proto.prover(claims, trace), tp)
    tv = LegacyTranscript(b"tri")
    claim_v = _pump_verifier(proto.verifier(claims, proofs), tv)
    assert claim_new.point == claim_v.point and claim_new.evs == claim_v.evs
    assert tp.proof_bytes() == tv.proof_bytes()
    for p, ev in zip(polys, claim_new.evs):
        assert p.evaluate(claim_new.point, P) == ev
