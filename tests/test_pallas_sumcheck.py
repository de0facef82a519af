"""Fused Pallas sumcheck kernels vs the XLA round path (interpret mode)."""
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
from gkr_msm_tpu.ops.poly.algfn import bitcheck, id_algfn, repeated, stacked


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(fk, "_INTERPRET", True)


FNS = [
    bs.AFFINE_L1,
    bs.PROJ_L1,
    bs.PROJ_L2,
    bs.PROJ_L3,
    stacked(bs.AFFINE_L1, bitcheck(FR, 2)),
    repeated(bs.PROJ_L2, 2),
]


@pytest.mark.parametrize("fn", FNS, ids=[f.name for f in FNS])
def test_fused_round_matches_xla(fn):
    rng = random.Random(hash(fn.name) & 0xFFFF)
    num_vars = 5
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars - 1)]
    eq = mle.eq_table(FR, point)
    ref = np.asarray(_round_sums(FR, polys, fn, eq))
    got = np.asarray(sk.fused_round(FR, polys, fn, eq))
    assert np.array_equal(ref, got)


def test_fused_round_nonpow2_block_padding():
    # m2 below the block size exercises the zero-eq lane padding
    rng = random.Random(3)
    fn = bs.PROJ_L2
    polys = [mle.random_poly(FR, rng, 3) for _ in range(fn.n_ins)]
    eq = mle.eq_table(FR, [rng.randrange(FR.modulus) for _ in range(2)])
    ref = np.asarray(_round_sums(FR, polys, fn, eq))
    got = np.asarray(sk.fused_round(FR, polys, fn, eq))
    assert np.array_equal(ref, got)


def test_fused_bind_matches_bind_low():
    rng = random.Random(11)
    polys = [mle.random_poly(FR, rng, 6) for _ in range(3)]
    t = mle.scalar(FR, rng.randrange(FR.modulus))
    ref = [np.asarray(mle.bind_low(FR, p, t)) for p in polys]
    got = [np.asarray(g) for g in sk.fused_bind(FR, polys, t)]
    for r, g in zip(ref, got):
        assert np.array_equal(r, g)


def test_lane_sum_exact():
    rng = random.Random(5)
    vals = [rng.randrange(FR.modulus) for _ in range(256)]
    w = jnp.asarray(fl.encode_ints(FR, vals)).T  # (L, 256)
    got = fk._lane_sum_t(FR, w)[:, 0]
    expected = sum(vals) % FR.modulus
    assert fl.decode_ints(FR, got[None])[0] == expected


def test_rect_prover_fused_matches_xla(monkeypatch):
    """Rect sparse rounds through the flattened fused kernel (interpret mode)
    must produce byte-identical proofs to the XLA rect path."""
    import gkr_msm_tpu.ops.pallas.field_kernels as fkm
    from gkr_msm_tpu.models.sumcheck import RectDeg2Sumcheck, SinglePointClaims
    from gkr_msm_tpu.ops.poly.rect import RectPoly, rect_map
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(77)
    row_logsize, col_logsize = 3, 2
    num_vars = row_logsize + col_logsize
    fn = bs.AFFINE_L1
    n_rows = rng.randrange(1 << col_logsize) + 1
    lens = [rng.randrange(1 << row_logsize) + 1 for _ in range(n_rows)]
    rows = [[rng.randrange(FR.modulus) for _ in range(l)] for l in lens]
    mk = lambda pad_r, pad_c: RectPoly.from_rows(
        FR, rows, pad_r, pad_c, row_logsize, col_logsize
    )
    polys = [mk(0, 0), mk(1, 1), mk(0, 0), mk(1, 1)]
    outputs = rect_map(polys, fn)
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    evs = [o.evaluate(point) for o in outputs]
    claims = SinglePointClaims(point=point, evs=evs)
    proto = RectDeg2Sumcheck(fn, num_vars, col_logsize)

    def run():
        tr = Transcript(b"rect-fused")
        out, _ = proto.prove(tr, claims, polys)
        return out, tr.end()

    monkeypatch.setattr(fkm, "_FORCE", "0")
    ref_claims, ref_proof = run()
    monkeypatch.setattr(fkm, "_FORCE", "1")
    monkeypatch.setattr(fkm, "_INTERPRET", True)
    monkeypatch.setattr(fkm, "MIN_PALLAS_ELEMS", 1)
    got_claims, got_proof = run()
    assert ref_proof == got_proof
    assert ref_claims == got_claims
