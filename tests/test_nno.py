"""Non-native opening (NNO) module tests.

Mirrors the reference test patterns (SURVEY.md §4): inner-product helpers vs
direct sums (matrix_poly.rs:554-584 ips_work), staged triple-product object
vs the naive dense object round-by-round (matrix_poly.rs:587-660), and the
prover/verifier round-trip the reference's WIP module never had."""
import random

import numpy as np
import pytest

from gkr_msm_tpu.models import nno
from gkr_msm_tpu.models.sumcheck import PlainSumcheckObject
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FQ, FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.ops.poly.algfn import AlgFn
from gkr_msm_tpu.utils.transcript import Transcript

P = FR.modulus
Q = FQ.modulus


def enc(vals):
    import jax.numpy as jnp

    return jnp.asarray(fl.encode_ints(FR, list(vals)))


def test_inner_prods_match_direct(rng):
    n_a, n_b = 2, 3
    la, lb = 1 << n_a, 1 << n_b
    large = [rng.randrange(P) for _ in range(la * lb)]
    a = [rng.randrange(P) for _ in range(la)]
    b = [rng.randrange(P) for _ in range(lb)]

    hi = nno.inner_prod_hi(FR, enc(large), enc(a))
    expect_hi = [
        sum(large[xh * lb + xl] * a[xh] for xh in range(la)) % P for xl in range(lb)
    ]
    assert fl.decode_ints(FR, hi) == expect_hi

    lo = nno.inner_prod_lo(FR, enc(large), enc(b))
    expect_lo = [
        sum(large[xh * lb + xl] * b[xl] for xl in range(lb)) % P for xh in range(la)
    ]
    assert fl.decode_ints(FR, lo) == expect_lo


def test_triple_prod_object_vs_naive(rng):
    n_a, n_b = 2, 3
    la, lb = 1 << n_a, 1 << n_b
    p_tbl = [rng.randrange(P) for _ in range(la * lb)]
    a = [rng.randrange(P) for _ in range(la)]
    b = [rng.randrange(P) for _ in range(lb)]
    a_ext = [a[i // lb] for i in range(la * lb)]
    b_ext = [b[i % lb] for i in range(la * lb)]
    claim = sum(p * x * y for p, x, y in zip(p_tbl, a_ext, b_ext)) % P

    prod3 = AlgFn(
        fn=lambda args: [fl.mul(FR, fl.mul(FR, args[0], args[1]), args[2])],
        deg=3,
        n_ins=3,
        n_outs=1,
        name="prod3",
    )
    naive = PlainSumcheckObject(
        FR, [enc(p_tbl), enc(a_ext), enc(b_ext)], prod3, 0, claim
    )
    staged = nno.TripleProdObject(FR, enc(p_tbl), enc(a), enc(b), n_a, n_b, claim)

    from gkr_msm_tpu.ops.field import host as fh

    for _ in range(n_a + n_b):
        u = naive.unipoly()  # 4 coefficients (deg 3)
        v = staged.unipoly()  # padded to 4
        for s in range(5):
            assert fh.evaluate_univar(u, s, P) == fh.evaluate_univar(v, s, P)
        t = rng.randrange(P)
        naive.bind(t)
        staged.bind(t)
        assert naive.claim == staged.claim
    n_evs = naive.final_evals()
    s_evs = staged.final_evals()
    assert n_evs[0] == s_evs[0]
    assert n_evs[1] == s_evs[1]
    assert n_evs[2] == s_evs[2]


def test_eq_table_host_matches_device(rng):
    point = [rng.randrange(P) for _ in range(4)]
    host = nno.eq_table_host(point, P)
    dev = fl.decode_ints(FR, mle.eq_table(FR, point))
    assert host == dev


def test_limbed_eq_recombines(rng):
    point = [rng.randrange(Q) for _ in range(3)]
    L = (Q.bit_length() + 63) // 64
    tbl = nno.limbed_eq(point, Q, L)
    vals = nno.eq_table_host(point, Q)
    for i, v in enumerate(vals):
        assert sum(int(tbl[i, j]) << (64 * j) for j in range(L)) == v


def nnf_mle_eval(vals, point, q):
    eq = nno.eq_table_host(point, q)
    return sum(v * e for v, e in zip(vals, eq)) % q


@pytest.mark.parametrize("x_logsize", [3, 4])
def test_nno_prove_verify_roundtrip(rng, x_logsize):
    n = 1 << x_logsize
    vals = [rng.randrange(Q) for _ in range(n)]
    matrix = nno.MatrixPoly.from_nnf_evals(vals, x_logsize, FQ)
    pt = [rng.randrange(Q) for _ in range(x_logsize)]
    ev = nnf_mle_eval(vals, pt, Q)

    proto = nno.NNOProtocol(x_logsize)
    tr = Transcript(b"nno")
    out, _ = proto.prove(tr, pt, ev, matrix)
    proof = tr.end()

    tv = Transcript(b"nno", proof=proof)
    ver = proto.verify(tv, pt, ev)
    tv.assert_end()
    assert out == ver or (
        out.r == ver.r
        and out.native_repr_eval == ver.native_repr_eval
        and out.matrix_claim == ver.matrix_claim
    )
    # the output matrix claim must be a true opening of the padded matrix MLE
    padded = matrix.padded_mle(FR)
    got = mle.evaluate(FR, padded, out.matrix_claim.point)
    assert got == out.matrix_claim.evs[0]

    # soundness probes: wrong ev and tampered proof must fail
    with pytest.raises(AssertionError):
        proto.verify(Transcript(b"nno", proof=proof), pt, (ev + 1) % Q)
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    with pytest.raises(AssertionError):
        proto.verify(Transcript(b"nno", proof=bytes(bad)), pt, ev)


def test_polynomial_with_zeros(rng):
    num_vars = 5
    length = 11
    vals = [rng.randrange(P) for _ in range(length)]
    pwz = nno.PolynomialWithZeros(FR, vals, num_vars)
    dense = vals + [0] * ((1 << num_vars) - length)

    assert pwz.sum() == sum(vals) % P
    point = [rng.randrange(P) for _ in range(num_vars)]
    expect = fl.decode_ints(
        FR, mle.eq_table(FR, point)
    )  # direct dot product
    direct = sum(d * e for d, e in zip(dense, expect)) % P
    assert pwz.evaluate(point) == direct

    t = rng.randrange(P)
    bound = pwz.bind_low(t)
    tl = mle.scalar(FR, t)
    dense_bound = fl.decode_ints(FR, mle.bind_low(FR, enc(dense), tl))
    point2 = [rng.randrange(P) for _ in range(num_vars - 1)]
    eq2 = fl.decode_ints(FR, mle.eq_table(FR, point2))
    assert bound.evaluate(point2) == sum(
        d * e for d, e in zip(dense_bound, eq2)
    ) % P
