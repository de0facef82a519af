"""Prover/verifier round-trip for the dense deg-2 eq sumcheck
(SURVEY.md §4.1 pattern, mirroring dense_eq.rs check_univars + protocol tests)."""
import jax.numpy as jnp
import pytest

from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck, SinglePointClaims
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import host as fh
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.ops.poly.algfn import AlgFn
from gkr_msm_tpu.utils.transcript import Transcript


def direct_claims(spec, polys, fn, point):
    """evs[o] = sum_i eq(point)[i] * f(polys)[i][o] — the claims the sumcheck
    reduces (computed directly, like the reference's vec_claim)."""
    eq = mle.eq_table(spec, point)
    outs = fn(polys)
    return [
        fl.decode_ints(spec, mle.field_sum(spec, fl.mul(spec, o, eq)))[0]
        for o in outs
    ]


@pytest.mark.parametrize("num_vars", [2, 5])
def test_dense_deg2_sumcheck_te_l1(rng, num_vars):
    fn = bs.PROJ_L1
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    evs = direct_claims(FR, polys, fn, point)
    claims = SinglePointClaims(point=point, evs=evs)

    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)
    tr = Transcript(b"test")
    out_claims, _ = proto.prove(tr, claims, polys)
    proof = tr.end()

    tv = Transcript(b"test", proof=proof)
    ver_claims = proto.verify(tv, SinglePointClaims(point=point, evs=evs))
    tv.assert_end()

    assert out_claims == ver_claims
    # output evs must equal direct evaluation of each input poly
    for poly, ev in zip(polys, ver_claims.evs):
        assert mle.evaluate(FR, poly, ver_claims.point) == ev


def test_sumcheck_rejects_tampered_proof(rng):
    fn = bs.PROJ_L2
    num_vars = 3
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    evs = direct_claims(FR, polys, fn, point)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)
    tr = Transcript(b"test")
    proto.prove(tr, SinglePointClaims(point=point, evs=evs), polys)
    proof = bytearray(tr.end())
    proof[7] ^= 1
    with pytest.raises(AssertionError):
        tv = Transcript(b"test", proof=bytes(proof))
        proto.verify(tv, SinglePointClaims(point=point, evs=evs))


def test_eq_table_matches_host_eq(rng):
    point = [rng.randrange(FR.modulus) for _ in range(4)]
    tbl = mle.eq_table(FR, point)
    vals = fl.decode_ints(FR, tbl)
    for i, v in enumerate(vals):
        bits = [(i >> (3 - j)) & 1 for j in range(4)]  # point[0] at MSB
        assert v == fh.eq_ev(point, bits, FR.modulus)


def test_interpolation_helpers():
    p = FR.modulus
    coeffs = [3, 1, 4, 1]
    evals = [fh.evaluate_univar(coeffs, t, p) for t in range(4)]
    assert fh.interpolate_at_0123(evals, p) == coeffs
    assert fh.interpolate_from_evals(evals, p) == coeffs
    msg = fh.compress_coefficients(coeffs)
    claim = (fh.evaluate_univar(coeffs, 0, p) + fh.evaluate_univar(coeffs, 1, p)) % p
    assert fh.decompress_coefficients(msg, claim, p) == coeffs
