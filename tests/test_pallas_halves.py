"""Bitrev halves-pipeline and scalar-algebra kernels vs XLA (interpret mode).

Split from test_pallas_sumcheck.py so xdist's per-file workers spread the
interpret-mode compile cost (each of these tests costs minutes on XLA:CPU).
"""
import random

import numpy as np
import pytest
import jax.numpy as jnp

from gkr_msm_tpu.models.sumcheck import _round_sums
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.pallas import field_kernels as fk
from gkr_msm_tpu.ops.pallas import sumcheck_kernels as sk
from gkr_msm_tpu.ops.poly import mle


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(fk, "_INTERPRET", True)


@pytest.mark.parametrize("fn", [bs.PROJ_L2, bs.AFFINE_L1], ids=lambda f: f.name)
def test_round_halves_matches_xla(fn):
    """Bit-reversed transposed halves round == natural-order round sums."""
    rng = random.Random(0x44A1)
    num_vars = 5
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars - 1)]
    eq = mle.eq_table(FR, point)
    ref = np.asarray(_round_sums(FR, polys, fn, eq))

    los, his = zip(*(sk.to_halves_bitrev(FR, p) for p in polys))
    # bitrev eq table = natural table indexed by rev(lane)
    perm = sk._bitrev_perm(num_vars - 1)
    eq_br = jnp.asarray(np.asarray(eq)[perm]).T
    got = np.asarray(sk.round_halves(FR, fn, list(los), list(his), eq_br))
    assert np.array_equal(ref, got)


def test_bind_round_halves_matches_bind_plus_round():
    """One fused kernel == bind_low followed by the natural round sums."""
    fn = bs.PROJ_L2
    rng = random.Random(0x9B1D)
    num_vars = 6
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    x = mle.scalar(FR, rng.randrange(FR.modulus))
    bound = [mle.bind_low(FR, p, x) for p in polys]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars - 2)]
    eq = mle.eq_table(FR, point)
    ref_sums = np.asarray(_round_sums(FR, bound, fn, eq))

    los, his = zip(*(sk.to_halves_bitrev(FR, p) for p in polys))
    perm = sk._bitrev_perm(num_vars - 2)
    eq_br = jnp.asarray(np.asarray(eq)[perm]).T
    sums, nlos, nhis = sk.bind_round_halves(
        FR, fn, list(los), list(his), x, eq_br
    )
    assert np.array_equal(ref_sums, np.asarray(sums))
    # the written halves are the bound table's bitrev halves
    for b, nlo, nhi in zip(bound, nlos, nhis):
        blo, bhi = sk.to_halves_bitrev(FR, b)
        assert np.array_equal(np.asarray(blo), np.asarray(nlo))
        assert np.array_equal(np.asarray(bhi), np.asarray(nhi))


def test_halves_emulation_matches_xla(monkeypatch):
    """The pure-jnp emulation path (used by orchestration tests) computes
    the same sums/binds as the natural-order XLA reference."""
    monkeypatch.setattr(sk, "_EMULATE", True)
    fn = bs.PROJ_L2
    rng = random.Random(0xE5)
    num_vars = 6
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    x = mle.scalar(FR, rng.randrange(FR.modulus))
    bound = [mle.bind_low(FR, p, x) for p in polys]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars - 2)]
    eq = mle.eq_table(FR, point)
    ref_sums = np.asarray(_round_sums(FR, bound, fn, eq))
    los, his = zip(*(sk.to_halves_bitrev(FR, p) for p in polys))
    eq_br = jnp.asarray(np.asarray(eq)[sk._bitrev_perm(num_vars - 2)]).T
    sums, nlos, nhis = sk.bind_round_halves(FR, fn, list(los), list(his), x, eq_br)
    assert np.array_equal(ref_sums, np.asarray(sums))
    for b, nlo, nhi in zip(bound, nlos, nhis):
        blo, bhi = sk.to_halves_bitrev(FR, b)
        assert np.array_equal(np.asarray(blo), np.asarray(nlo))
        assert np.array_equal(np.asarray(bhi), np.asarray(nhi))
    outs = sk.bind_halves(FR, list(nlos), list(nhis), x)
    ref2 = [np.asarray(mle.bind_low(FR, b, x)) for b in bound]
    for r, o in zip(ref2, outs):
        assert np.array_equal(r, np.asarray(sk.halves_to_natural(FR, o)))


def test_bind_halves_roundtrip():
    rng = random.Random(0x71F)
    polys = [mle.random_poly(FR, rng, 5) for _ in range(2)]
    x = mle.scalar(FR, rng.randrange(FR.modulus))
    ref = [np.asarray(mle.bind_low(FR, p, x)) for p in polys]
    los, his = zip(*(sk.to_halves_bitrev(FR, p) for p in polys))
    outs = sk.bind_halves(FR, list(los), list(his), x)
    for r, o in zip(ref, outs):
        assert np.array_equal(r, np.asarray(sk.halves_to_natural(FR, o)))


def test_algebra_kernels_match_host_math():
    """The pre/post scalar-algebra pallas kernels (interpret mode) reproduce
    the host from12 + interpolation + challenge algebra bit-exactly."""
    from gkr_msm_tpu.ops.field import host as fh

    p = FR.modulus
    rng = random.Random(0xA19)
    n_o = 4
    sums_i = [[rng.randrange(p) for _ in range(n_o)] for _ in range(2)]
    claim_i = rng.randrange(p)
    mult_i = rng.randrange(p)
    gp_i = [rng.randrange(p) for _ in range(n_o)]
    pt = rng.randrange(p)
    eq0 = (1 - pt) % p
    rc_i = [pt, (2 * pt - eq0) % p, 3 * (2 * (2 * pt - eq0) - pt) % p,
            fh.inv(eq0, p) * (2 * (2 * pt - eq0) - pt) % p, eq0,
            (2 * pt - 1) % p, 1]

    enc = lambda vals: jnp.asarray(fl.encode_ints(FR, list(vals)))
    sums = enc(sums_i[0] + sums_i[1]).reshape(2, n_o, FR.n_limbs)
    c0, c1, c2, c3, msg_std = sk.algebra_pre(
        FR, n_o, sums, enc([claim_i])[0], enc([mult_i])[0], enc(gp_i),
        enc(rc_i),
    )

    # host reference: totals -> from12 coeffs
    def fold(row):
        acc = 0
        for v, g in zip(row, gp_i):
            acc = (acc + v * g) % p
        return acc

    t1 = fold(sums_i[0]) * mult_i % p
    t2 = fold(sums_i[1]) * mult_i % p
    coeffs = fh.from12(t1, t2, pt, claim_i, p)
    got_c = fl.decode_ints(FR, jnp.stack([c0, c1, c2, c3]))
    assert got_c == coeffs
    msg_ints = fl.decode_ints(FR, msg_std, mont=False)
    assert msg_ints == [coeffs[0], coeffs[2], coeffs[3]]

    # post-sponge update
    x_i = rng.randrange(1 << 128)
    x_limbs = [(x_i >> (16 * j)) & 0xFFFF for j in range(8)] + [0] * 8
    x_std = jnp.asarray(np.array(x_limbs, dtype=np.uint32))
    xm, mult2, claim2 = sk.algebra_post(
        FR, x_std, c0, c1, c2, c3, enc([mult_i])[0],
        enc([eq0])[0], enc([(2 * pt - 1) % p])[0],
    )
    assert fl.decode_ints(FR, xm[None])[0] == x_i % p
    assert (
        fl.decode_ints(FR, mult2[None])[0]
        == mult_i * ((1 - pt - x_i + 2 * pt * x_i) % p) % p
    )
    assert (
        fl.decode_ints(FR, claim2[None])[0]
        == fh.evaluate_univar(coeffs, x_i, p)
    )



def test_rect_dense_phase_device_handoff(monkeypatch):
    """RectDeg2Sumcheck through the single-dispatch rect device prover
    (sparse rows + dense columns in one program, fused_prover.
    prove_rect_rounds_device) must produce a byte-identical transcript."""
    import random

    from gkr_msm_tpu.models import fused_prover as fp
    from gkr_msm_tpu.models.sumcheck import RectDeg2Sumcheck, SinglePointClaims
    from gkr_msm_tpu.ops.poly.rect import RectPoly, rect_map
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(0x1E57)
    row_logsize, col_logsize = 3, 3
    num_vars = row_logsize + col_logsize
    fn = bs.AFFINE_L1
    n_rows = rng.randrange(1 << col_logsize) + 1
    lens = [rng.randrange(1 << row_logsize) + 1 for _ in range(n_rows)]
    rows = [[rng.randrange(FR.modulus) for _ in range(l)] for l in lens]
    mk = lambda pr, pc: RectPoly.from_rows(
        FR, rows, pr, pc, row_logsize, col_logsize
    )
    polys = [mk(0, 0), mk(1, 1), mk(0, 0), mk(1, 1)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    evs = [o.evaluate(point) for o in rect_map(polys, fn)]
    claims = SinglePointClaims(point=point, evs=evs)
    proto = RectDeg2Sumcheck(fn, num_vars, col_logsize)

    def run():
        tr = Transcript(b"rect-dev")
        out, _ = proto.prove(tr, claims, polys)
        return out, tr.end()

    ref_claims, ref = run()
    monkeypatch.setattr(fp, "should_use_small", lambda f: True)
    got_claims, got = run()
    assert ref == got
    assert ref_claims.point == got_claims.point
    assert ref_claims.evs == got_claims.evs
    tv = Transcript(b"rect-dev", proof=got)
    vout = proto.verify(tv, claims)
    tv.assert_end()
    assert vout.point == got_claims.point
