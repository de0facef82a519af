"""MSM kernel tests: device Pippenger vs host model, binary MSM vs filtered
sum (binary_msm.rs:63-96), pullback vs plain MSM (pullback.rs:85-106),
SRS dump/load roundtrip."""
import random

import jax
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    """XLA:CPU segfaults sporadically once one process holds hundreds of
    live compiled executables; this module compiles the largest programs in
    the suite (unrolled bucket-combine graphs, ~200 s each), so the
    module-scoped clear in conftest is not enough — a worker running this
    whole file crashed mid-module in round 4.  Per-test clearing keeps the
    live-executable count at one test's worth."""
    yield
    jax.clear_caches()

from gkr_msm_tpu.commitments import kzg as kzgm
from gkr_msm_tpu.ops.curve import bls12381 as g1
from gkr_msm_tpu.ops.msm import binary as bmsm
from gkr_msm_tpu.ops.msm import pippenger as msm
from gkr_msm_tpu.ops.msm import pullback as pb


def test_msm_device_vs_host(rng):
    n = 32
    pts = [g1.Host.random_point(rng) for _ in range(n)]
    scalars = [rng.randrange(g1.Host.order) for _ in range(n)]
    dev = msm.encode_points_device(pts)
    got = msm.msm_host_result(dev, msm.scalars_ints_to_limbs(scalars))
    assert got == g1.Host.msm(scalars, pts)


def test_msm_nonaffine_bases(rng):
    """Projective (non-affine) bases work unchanged (msm_nonaffine.rs role)."""
    n = 16
    pts = [g1.Host.random_point(rng) for _ in range(n)]
    # encode with random projective scaling z
    import jax.numpy as jnp

    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FQ

    xs, ys, zs = [], [], []
    for x, y in pts:
        z = rng.randrange(1, FQ.modulus)
        xs.append(x * z % FQ.modulus)
        ys.append(y * z % FQ.modulus)
        zs.append(z)
    dev = jnp.stack(
        [
            jnp.asarray(fl.encode_ints(FQ, xs)),
            jnp.asarray(fl.encode_ints(FQ, ys)),
            jnp.asarray(fl.encode_ints(FQ, zs)),
        ],
        axis=1,
    )
    scalars = [rng.randrange(g1.Host.order) for _ in range(n)]
    got = msm.msm_host_result(dev, msm.scalars_ints_to_limbs(scalars))
    assert got == g1.Host.msm(scalars, pts)


def test_binary_msm(rng):
    n, gamma = 24, 4
    bases = [g1.Host.random_point(rng) for _ in range(n)]
    bits = [rng.randrange(2) for _ in range(n)]
    tables = bmsm.prepare_bases(bases, gamma)
    got = bmsm.binary_msm(tables, bits, gamma)
    expected = g1.Host.msm(bits, bases)
    assert got == expected


def test_pullback_bucketed_msm(rng):
    m, n = 8, 40
    image = [g1.Host.random_point(rng) for _ in range(m)]
    mapping = [rng.randrange(m) for _ in range(n)]
    coefs = [rng.randrange(g1.Host.order) for _ in range(n)]
    dev = msm.encode_points_device(image)
    got = pb.bucketed_msm(dev, mapping, coefs)
    expected = g1.Host.msm(coefs, [image[j] for j in mapping])
    assert got == expected


def test_srs_dump_load(rng, tmp_path):
    pk = kzgm.random_kzg_pk(8, rng)
    path = str(tmp_path / "srs.npz")
    kzgm.dump_kzg_pk(pk, path)
    pk2 = kzgm.load_kzg_pk(path)
    assert pk2.ptau_host == pk.ptau_host
    assert pk2.h0 == pk.h0 and pk2.h1 == pk.h1
    poly = [rng.randrange(kzgm.FR.modulus) for _ in range(5)]
    assert pk.commit(poly) == pk2.commit(poly)


def test_msm_device_vs_host_small_bitwidth(rng):
    """Fast-tier device Pippenger check: 16-bit scalars keep the compile
    count at 2 windows (the full-width variant lives in the slow tier)."""
    n = 16
    pts = [g1.Host.random_point(rng) for _ in range(n)]
    scalars = [rng.randrange(1 << 16) for _ in range(n)]
    dev = msm.encode_points_device(pts)
    got = msm.msm_host_result(dev, msm.scalars_ints_to_limbs(scalars), n_bits=16)
    assert got == g1.Host.msm(scalars, pts)


def test_pullback_accumulate_coefs(rng):
    """Vectorized per-limb scatter-add == exact bigint accumulation
    (pullback.rs:40-48)."""
    from gkr_msm_tpu.ops.field.spec import FR

    m, n = 13, 200
    mapping = [rng.randrange(m) for _ in range(n)]
    coefs = [rng.randrange(FR.modulus) for _ in range(n)]
    acc = pb.accumulate_coefs(m, mapping, coefs)
    ref = [0] * m
    for j, c in zip(mapping, coefs):
        ref[j] = (ref[j] + c) % FR.modulus
    assert acc == ref


def test_msm_device_te_curve(rng):
    """Device Pippenger on the Bandersnatch TE curve (curve='te') matches
    the host model — used for the at-scale expected-MSM cross-check."""
    import jax.numpy as jnp

    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FR

    n = 16
    pts = [bs.Host.random_point(rng) for _ in range(n)]
    scalars = [rng.randrange(1 << 16) for _ in range(n)]
    dev = jnp.asarray(bs.encode_affine_to_proj(pts))
    out = msm.msm_device(dev, msm.scalars_ints_to_limbs(scalars), n_bits=16, curve="te")
    xyz = fl.decode_ints(FR, np.asarray(out))
    got = bs.Host.normalize_proj(tuple(xyz)) if xyz[2] != 0 else bs.Host.neutral()
    assert got == bs.Host.msm(scalars, pts)


def test_te_fixed_base_batch(rng):
    """Device fixed-base batch on Bandersnatch == host scalar_mul."""
    from gkr_msm_tpu.commitments.kzg import fixed_base_batch
    from gkr_msm_tpu.ops.curve import bandersnatch as bs

    ks = [rng.randrange(1, bs.Host.order) for _ in range(4)]
    pts = bs.decode_proj_points(np.asarray(fixed_base_batch(bs.Host.gen, ks, curve="te")))
    for k, got in zip(ks, pts):
        assert got == bs.Host.scalar_mul(k, bs.Host.gen)


def test_fixed_base_batch_chunked(rng, monkeypatch):
    """Sliced fixed-base combine == unsliced (the 2^16 slice cap exists only
    to bound the gather tensor; exercised here with a tiny slice size)."""
    from gkr_msm_tpu.commitments import kzg as kzgm2
    from gkr_msm_tpu.ops.curve import bandersnatch as bs

    ks = [rng.randrange(1, bs.Host.order) for _ in range(7)]
    full = np.asarray(kzgm2.fixed_base_batch(bs.Host.gen, ks, curve="te"))
    monkeypatch.setattr(kzgm2, "_FB_CHUNK", 4)
    sliced = np.asarray(kzgm2.fixed_base_batch(bs.Host.gen, ks, curve="te"))
    got = bs.decode_proj_points(sliced)
    expect = bs.decode_proj_points(full)
    assert got == expect


def test_packed_affine_bases_roundtrip(rng):
    """Pack -> unpack roundtrip preserves points (incl identity slots)."""
    pts = [g1.Host.random_point(rng) for _ in range(5)] + [None]
    bases = msm.PackedAffineBases(pts)
    proj = msm._unpack_to_proj(bases._np)
    got = g1.decode_proj(proj[:-1])
    assert got == pts
    assert g1.decode_proj(proj[-1:]) == [None]  # pad slot is identity


def test_msm_packed_matches_host(rng):
    """Packed-affine MSM (fast path on TPU, unpack fallback elsewhere)."""
    n = 24
    pts = [g1.Host.random_point(rng) for _ in range(n)]
    pts[5] = None  # identity base is handled via the validity word
    scalars = [rng.randrange(1 << 64) for _ in range(n)]
    bases = msm.PackedAffineBases(pts)
    out = msm.msm_packed(bases, msm.scalars_ints_to_limbs(scalars), n_bits=64)
    got = g1.decode_proj(np.asarray(out)[None])[0]
    assert got == g1.Host.msm(scalars, pts)


def test_msm_packed_prefix(rng):
    """A scalar vector shorter than the packed table uses the table prefix
    (KZG commits slice the SRS; the pad sentinel must stay the table's own
    pad row, not a live point)."""
    pts = [g1.Host.random_point(rng) for _ in range(16)]
    bases = msm.PackedAffineBases(pts)
    scalars = [rng.randrange(1 << 32) for _ in range(9)]
    out = msm.msm_packed(bases, msm.scalars_ints_to_limbs(scalars), n_bits=32)
    got = g1.decode_proj(np.asarray(out)[None])[0]
    assert got == g1.Host.msm(scalars, pts[:9])


def test_packed_bases_from_device_proj(rng):
    """Device batch-normalization constructor == host-affine constructor."""
    pts = [g1.Host.random_point(rng) for _ in range(6)] + [None]
    dev = msm.encode_points_device(pts)
    a = msm.PackedAffineBases(pts)
    b = msm.PackedAffineBases.from_device_proj(dev)
    assert np.array_equal(a._np, b._np)


def test_signed_digit_recoding(rng):
    """Signed base-2^c recoding recomposes to the scalar (make_digits,
    msm_nonaffine.rs:275-314) for window sizes that need not divide 16."""
    for c in (4, 8, 9, 12):
        for n_bits in (16, 128):
            scalars = [rng.randrange(1 << n_bits) for _ in range(20)] + [
                0, 1, (1 << n_bits) - 1
            ]
            limbs = msm.scalars_ints_to_limbs(scalars)
            ab, ng = msm.scalars_to_signed_digits(limbs, c, n_bits)
            half = 1 << (c - 1)
            assert int(ab.max()) <= half
            for i, s in enumerate(scalars):
                digs = [
                    int(ab[w, i]) * (-1 if ng[w, i] else 1)
                    for w in range(ab.shape[0])
                ]
                assert all(-half <= d <= half - 1 for d in digs)
                assert sum(d << (c * w) for w, d in enumerate(digs)) == s


def test_msm_device_signed_matches_unsigned(rng):
    """Signed-digit MSM == unsigned MSM == host model (G1)."""
    n = 24
    pts = [g1.Host.random_point(rng) for _ in range(n)]
    scalars = [rng.randrange(1 << 32) for _ in range(n)]
    dev = msm.encode_points_device(pts)
    limbs = msm.scalars_ints_to_limbs(scalars)
    expected = g1.Host.msm(scalars, pts)
    for c in (4, 8):
        out = msm.msm_device(dev, limbs, c=c, n_bits=32, signed=True)
        got = g1.decode_proj(np.asarray(out)[None])[0]
        assert got == expected, f"c={c}"


def test_msm_device_signed_te(rng):
    """Signed path on the twisted-Edwards curve (negation = -x)."""
    import jax.numpy as jnp

    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FR

    n = 16
    pts = [bs.Host.random_point(rng) for _ in range(n)]
    scalars = [rng.randrange(1 << 16) for _ in range(n)]
    dev = jnp.asarray(bs.encode_affine_to_proj(pts))
    out = msm.msm_device(
        dev, msm.scalars_ints_to_limbs(scalars), n_bits=16, curve="te", signed=True
    )
    xyz = fl.decode_ints(FR, np.asarray(out))
    got = bs.Host.normalize_proj(tuple(xyz)) if xyz[2] != 0 else bs.Host.neutral()
    assert got == bs.Host.msm(scalars, pts)


def test_msm_packed_signed(rng):
    """Signed packed-affine MSM (negated-Y table half) matches the host
    model, including identity bases and table-prefix scalars."""
    pts = [g1.Host.random_point(rng) for _ in range(16)]
    pts[3] = None
    bases = msm.PackedAffineBases(pts)
    scalars = [rng.randrange(1 << 32) for _ in range(11)]
    out = msm.msm_packed(
        bases, msm.scalars_ints_to_limbs(scalars), n_bits=32, signed=True
    )
    got = g1.decode_proj(np.asarray(out)[None])[0]
    assert got == g1.Host.msm(scalars, pts[:11])


def test_neg_packed_coords(rng):
    """Packed-coordinate negation: p - y limbwise, 0 stays 0."""
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FQ

    vals = [rng.randrange(FQ.modulus) for _ in range(8)] + [0]
    limbs = fl.encode_ints(FQ, vals)  # (9, 24) mont
    h = FQ.n_limbs // 2
    packed = limbs[:, :h] | (limbs[:, h:] << np.uint32(16))
    negp = msm._neg_packed_coords(packed)
    out = np.concatenate([negp & np.uint32(0xFFFF), negp >> np.uint32(16)], axis=1)
    got = fl.decode_ints(FQ, out)
    expect = [(FQ.modulus - v) % FQ.modulus for v in vals]
    assert got == expect
