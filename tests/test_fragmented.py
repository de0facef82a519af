"""Fragmented poly + copoly stack vs dense ground truth (the reference's
optimized-vs-naive pattern, SURVEY.md §4.2; fragmented.rs / copoly.rs
in-crate tests)."""
import random

from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly.copoly import (
    EqPoly,
    RotPoly,
    StandardSubset,
    compute_segment_split,
)
from gkr_msm_tpu.ops.poly.fragmented import (
    FragmentedPoly,
    RowFormatPoly,
    Shape,
)

P = FR.modulus


def _eq_dense(point, m=1):
    tbl = [m % P]
    for r in point:
        tbl = [v for t in tbl for v in (t * ((1 - r) % P) % P, t * r % P)]
    return tbl


def test_fragmented_split_bind_evaluate_vs_dense():
    rng = random.Random(1)
    for _ in range(60):
        nv = rng.randrange(2, 7)
        p = FragmentedPoly.rand(rng, nv, P)
        dense = p.vec()
        l, r = p.split()
        assert l.vec() == dense[0::2] and r.vec() == dense[1::2]
        t = rng.randrange(P)
        assert p.bind(t, P).vec() == [
            (a + t * (b - a)) % P for a, b in zip(dense[0::2], dense[1::2])
        ]
        pt = [rng.randrange(P) for _ in range(nv)]
        cur = dense
        for tt in reversed(pt):
            cur = [(a + tt * (b - a)) % P for a, b in zip(cur[0::2], cur[1::2])]
        assert p.evaluate(pt, P) == cur[0]


def test_fragmented_split_at_vs_dense_chunks():
    rng = random.Random(2)
    for _ in range(60):
        nv = rng.randrange(2, 7)
        p = FragmentedPoly.rand(rng, nv, P)
        dense = p.vec()
        idx = rng.randrange(nv)
        chunk = (1 << nv) >> (1 + idx)
        l, r = p.split_at(idx)
        el, er = [], []
        for s in range(0, 1 << nv, 2 * chunk):
            el.extend(dense[s : s + chunk])
            er.extend(dense[s + chunk : s + 2 * chunk])
        assert l.vec() == el and r.vec() == er


def test_fragmented_map_over_poly_shared_shape():
    rng = random.Random(3)
    for _ in range(30):
        nv = rng.randrange(2, 6)
        sh = Shape.rand(rng, nv)
        a = FragmentedPoly.rand_with_shape(rng, sh, P)
        b = FragmentedPoly.rand_with_shape(rng, sh, P)
        outs = FragmentedPoly.map_over_poly(
            [a, b], lambda v: [v[0] * v[1], v[0] + v[1]], 2, P
        )
        da, db = a.vec(), b.vec()
        assert outs[0].vec() == [x * y % P for x, y in zip(da, db)]
        assert outs[1].vec() == [(x + y) % P for x, y in zip(da, db)]


def test_row_format_poly():
    rf = RowFormatPoly.new([1, 2, 3], 7, 8, P)
    assert rf.poly.vec() == [1, 2, 3, 7, 7, 7, 7, 7]
    assert rf.data_len() == 3 and rf.pad() == 7


def test_segment_split_dyadic():
    for start in range(0, 64):
        for end in range(start, 65):
            subs = compute_segment_split(start, end)
            total = 0
            pos = start
            for ss in subs:
                assert ss.start == pos and ss.start % (1 << ss.loglength) == 0
                pos = ss.end
                total += 1 << ss.loglength
            assert total == end - start


def test_eqpoly_copoly_vs_dense():
    rng = random.Random(4)
    for _ in range(50):
        nv = rng.randrange(1, 7)
        pt = [rng.randrange(P) for _ in range(nv)]
        m = rng.randrange(P)
        eq = EqPoly(pt, P, m)
        dense = _eq_dense(pt, m)
        n = 1 << nv
        s = rng.randrange(n)
        e = rng.randrange(s, n + 1)
        assert eq.materialize_segment(s, e) == dense[s:e]
        a, b = eq.half_sums_segment(s, e)
        assert a == sum(dense[i] for i in range(s, e) if i % 2 == 0) % P
        assert b == sum(dense[i] for i in range(s, e) if i % 2 == 1) % P
        # materialize with shape: inner product == dense dot
        sh = Shape.rand(rng, nv)
        poly = FragmentedPoly.rand_with_shape(rng, sh, P)
        eq2 = EqPoly(pt, P, m)
        eq2.take_shape(sh)
        assert eq2.materialize().inner_product(poly, P) == sum(
            x * y for x, y in zip(poly.vec(), dense)
        ) % P


def test_rotpoly_vs_shifted_eq():
    rng = random.Random(5)
    for _ in range(40):
        nv = rng.randrange(1, 7)
        pt = [rng.randrange(P) for _ in range(nv)]
        rot = RotPoly(pt, P)
        n = 1 << nv
        expect = [_eq_dense(pt)[(i + 1) % n] for i in range(n)]
        s = rng.randrange(n)
        e = rng.randrange(s, n + 1)
        assert rot.materialize_segment(s, e) == expect[s:e]
        x = [rng.randrange(P) for _ in range(nv)]
        cur = expect
        for t in reversed(x):
            cur = [(u + t * (v - u)) % P for u, v in zip(cur[0::2], cur[1::2])]
        assert rot.ev(x) == cur[0]
