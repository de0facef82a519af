"""Legacy round-driven API tests: the challenge-pump adapter must reproduce
the one-shot protocols round-for-round (reference pattern: legacy sumcheck
tests with caller-owned TestTranscript, protocol/sumcheck.rs)."""
import random

from gkr_msm_tpu.models.legacy import (
    PolynomialMapping,
    RoundDrivenProver,
    RoundDrivenVerifier,
)
from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck, claims_for_map
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.utils.transcript import Transcript


def test_round_driven_pump_matches_one_shot(rng):
    fn = bs.PROJ_L1
    num_vars = 4
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    claims = claims_for_map(FR, fn, polys, point)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    # caller owns the randomness: an outer transcript supplies challenges
    outer = Transcript(b"caller")
    prover = RoundDrivenProver(proto, claims, [p for p in polys])
    challenges = []
    result = None
    while result is None:
        c = outer.challenge(128)
        challenges.append(c)
        result = prover.round(c)
    out_claims, proof = result
    assert len(challenges) == num_vars + 1  # gamma + one per round

    verifier = RoundDrivenVerifier(proto, claims, proof)
    v_result = None
    for c in challenges:
        assert v_result is None
        v_result = verifier.round(c)
    assert v_result is not None
    assert v_result.point == out_claims.point
    assert v_result.evs == out_claims.evs
    # final evals really are the polys' evaluations at the output point
    for poly, ev in zip(polys, out_claims.evs):
        assert mle.evaluate(FR, poly, out_claims.point) == ev


def test_round_driven_verifier_rejects_tamper(rng):
    fn = bs.AFFINE_L1
    num_vars = 3
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    claims = claims_for_map(FR, fn, polys, point)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    outer = Transcript(b"caller2")
    prover = RoundDrivenProver(proto, claims, [p for p in polys])
    challenges = []
    result = None
    while result is None:
        c = outer.challenge(128)
        challenges.append(c)
        result = prover.round(c)
    _, proof = result

    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    try:
        verifier = RoundDrivenVerifier(proto, claims, bytes(bad))
        for c in challenges:
            verifier.round(c)
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_polynomial_mapping_roundtrip():
    fn = bs.PROJ_L2
    pm = PolynomialMapping.from_algfn(fn)
    assert (pm.degree, pm.num_i, pm.num_o) == (fn.deg, fn.n_ins, fn.n_outs)
    back = pm.to_algfn(name="roundtrip")
    assert (back.deg, back.n_ins, back.n_outs) == (fn.deg, fn.n_ins, fn.n_outs)
