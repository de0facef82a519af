"""Rect (jagged-equivalent) sumcheck + bintree-add GKR tests.

Mirrors the reference's patterns (SURVEY.md §4): prover/verifier round-trip
on random jagged instances (vecvec_eq.rs:602-660, bintree_add.rs:401-458)
and witness-generator semantic checks against the host curve model
(bintree_add.rs:460-504)."""
import pytest

from gkr_msm_tpu.models import bintree, gkr
from gkr_msm_tpu.models.sumcheck import RectDeg2Sumcheck, SinglePointClaims
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.ops.poly.algfn import id_algfn
from gkr_msm_tpu.ops.poly.rect import RectPoly, rect_map, rect_map_split
from gkr_msm_tpu.utils.transcript import Transcript


def random_jagged_points(rng, row_logsize, col_logsize, dense=False):
    """Random affine Bandersnatch points in jagged rows -> ([x, y] RectPolys,
    host rows of (x,y) tuples).  Pads: x->0, y->1 (the neutral point),
    mirroring rand_points_affine (vecvec.rs:347-377)."""
    if dense:
        n_rows = 1 << col_logsize
        lens = [1 << row_logsize] * n_rows
    else:
        n_rows = rng.randrange(1 << col_logsize) + 1
        lens = [rng.randrange(1 << row_logsize) + 1 for _ in range(n_rows)]
    host_rows = [
        [bs.Host.random_point(rng) for _ in range(l)] for l in lens
    ]
    xs = RectPoly.from_rows(
        FR, [[p[0] for p in r] for r in host_rows], 0, 0, row_logsize, col_logsize
    )
    ys = RectPoly.from_rows(
        FR, [[p[1] for p in r] for r in host_rows], 1, 1, row_logsize, col_logsize
    )
    return [xs, ys], host_rows


@pytest.mark.parametrize("col_logsize", [0, 2])
@pytest.mark.parametrize("dense", [False, True])
def test_rect_sumcheck_roundtrip(rng, col_logsize, dense):
    row_logsize = 3
    num_vars = row_logsize + col_logsize
    fn = bs.AFFINE_L1
    polys, _ = random_jagged_points(rng, row_logsize, col_logsize, dense)
    polys = polys + [p for p in polys]  # 4 inputs (x,y,x,y)

    outputs = rect_map(polys, fn)
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    evs = [o.evaluate(point) for o in outputs]
    claims = SinglePointClaims(point=point, evs=evs)

    proto = RectDeg2Sumcheck(fn, num_vars, col_logsize)
    tr = Transcript(b"rect")
    out_claims, _ = proto.prove(tr, claims, polys)
    proof = tr.end()

    tv = Transcript(b"rect", proof=proof)
    ver_claims = proto.verify(tv, claims)
    tv.assert_end()
    assert out_claims == ver_claims
    # final evs == direct evaluation of the (padded) input polys
    for poly, ev in zip(polys, ver_claims.evs):
        assert poly.evaluate(ver_claims.point) == ev


@pytest.mark.parametrize(
    "num_adds,row_logsize,col_logsize",
    [(3, 3, 2), (2, 2, 3)],
)
def test_bintree_prove_verify_and_sums(rng, num_adds, row_logsize, col_logsize):
    num_vars = row_logsize + col_logsize
    points, host_rows = random_jagged_points(rng, row_logsize, col_logsize)
    inputs = rect_map_split(points, id_algfn(2), 2)

    advices = bintree.witness_build(inputs, row_logsize, num_adds, False)
    out_polys = bintree.last_step(advices[-1], num_adds - 1)

    if isinstance(out_polys[0], RectPoly):
        dense_out = [o.to_dense() for o in out_polys]
    else:
        dense_out = out_polys
    out_vars = num_vars - num_adds
    point = [rng.randrange(FR.modulus) for _ in range(out_vars)]
    evs = [mle.evaluate(FR, o, point) for o in dense_out]
    claims = SinglePointClaims(point=point, evs=evs)

    proto = bintree.BintreeAdd(num_adds, num_vars, row_logsize, False)
    tr = Transcript(b"bintree")
    out_claims = proto.prove(tr, claims, advices)
    proof = tr.end()

    tv = Transcript(b"bintree", proof=proof)
    ver_claims = proto.verify(tv, claims)
    tv.assert_end()
    assert out_claims == ver_claims

    # output claims are about the 4 split input polys
    for poly, ev in zip(inputs, ver_claims.evs):
        assert poly.evaluate(ver_claims.point) == ev

    # witness semantics: outputs are group sums of 2^num_adds-point chunks
    group = 1 << num_adds
    xs = fl.decode_ints(FR, dense_out[0])
    ys = fl.decode_ints(FR, dense_out[1])
    zs = fl.decode_ints(FR, dense_out[2])
    flat_points = []
    for r in range(1 << col_logsize):
        row = host_rows[r] if r < len(host_rows) else []
        row = row + [bs.Host.neutral()] * ((1 << row_logsize) - len(row))
        flat_points.extend(row)
    for idx in range(1 << out_vars):
        expected = bs.Host.neutral()
        for pt in flat_points[idx * group : (idx + 1) * group]:
            expected = bs.Host.add(expected, pt)
        assert zs[idx] != 0
        got = bs.Host.normalize_proj((xs[idx], ys[idx], zs[idx]))
        assert bs.Host.is_on_curve(got)
        assert got == expected


def test_bintree_with_bitcheck(rng):
    num_adds, row_logsize, col_logsize = 2, 2, 2
    num_vars = row_logsize + col_logsize
    points, host_rows = random_jagged_points(rng, row_logsize, col_logsize)
    domain = RectPoly.from_rows(
        FR,
        [[1] * len(r) for r in host_rows],
        0,
        0,
        row_logsize,
        col_logsize,
    )
    inputs = rect_map_split(points, id_algfn(2), 2)
    inputs.extend(rect_map_split([domain], id_algfn(1), 1))

    advices = bintree.witness_build(inputs, row_logsize, num_adds, True)
    out_polys = bintree.last_step(advices[-1], num_adds - 1)
    dense_out = (
        [o.to_dense() for o in out_polys]
        if isinstance(out_polys[0], RectPoly)
        else out_polys
    )
    out_vars = num_vars - num_adds
    point = [rng.randrange(FR.modulus) for _ in range(out_vars)]
    evs = [mle.evaluate(FR, o, point) for o in dense_out]
    claims = SinglePointClaims(point=point, evs=evs)

    proto = bintree.BintreeAdd(num_adds, num_vars, row_logsize, True)
    tr = Transcript(b"bintree")
    out_claims = proto.prove(tr, claims, advices)
    proof = tr.end()

    tv = Transcript(b"bintree", proof=proof)
    ver_claims = proto.verify(tv, claims)
    tv.assert_end()
    assert out_claims == ver_claims
    for poly, ev in zip(inputs, ver_claims.evs):
        assert poly.evaluate(ver_claims.point) == ev


def test_bintree_fixcap_transcript_identical(rng, monkeypatch):
    """Pinning one round-kernel capacity across all bintree layers
    (GKR_MSM_RECT_FIXCAP, the canonical-run compile-sweep fix) must be
    byte-transparent: zero-padded lanes carry eq weight 0."""
    import random

    rng = random.Random(0xF1CA)
    num_adds, row_logsize, col_logsize = 3, 3, 2
    num_vars = row_logsize + col_logsize
    points, _ = random_jagged_points(rng, row_logsize, col_logsize)
    inputs = rect_map_split(points, id_algfn(2), 2)
    advices = bintree.witness_build(inputs, row_logsize, num_adds, False)
    out_polys = bintree.last_step(advices[-1], num_adds - 1)
    dense_out = [o.to_dense() for o in out_polys] if isinstance(
        out_polys[0], RectPoly) else out_polys
    out_vars = num_vars - num_adds
    point = [rng.randrange(FR.modulus) for _ in range(out_vars)]
    evs = [mle.evaluate(FR, o, point) for o in dense_out]
    claims = SinglePointClaims(point=point, evs=evs)

    proofs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("GKR_MSM_RECT_FIXCAP", flag)
        proto = bintree.BintreeAdd(num_adds, num_vars, row_logsize, False)
        tr = Transcript(b"bintree-fixcap")
        proto.prove(tr, claims, advices)
        proofs[flag] = tr.end()
    assert proofs["0"] == proofs["1"]
