"""Ground-truth vectors independent of the package's own host models.

VERDICT.md round-1 missing #5: all round-1 bit-exactness was asserted
against the repo's own Python-int model.  This file re-derives everything
from first principles INSIDE the test (plain pow/% arithmetic written from
the curve equations — no imports from gkr_msm_tpu's host models inform the
expected values) plus the reference implementation's own hardcoded
constants (COEFF_D Montgomery limbs from
/root/reference/src/utils.rs:34-37; mock SRS construction from
/root/reference/src/commitments/kzg.rs:84-97), and asserts the package's
host AND device paths reproduce them bit-exactly.
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

# ---------------------------------------------------------------------------
# independent constants (standard published values)
# ---------------------------------------------------------------------------

# BLS12-381 scalar field r == Bandersnatch base field
R_MOD = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
# BLS12-381 base field p
P_MOD = int(
    "0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab", 16,
)
# BLS12-381 G1 generator (spec)
G1_X = int(
    "0x17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb", 16,
)
G1_Y = int(
    "0x08b3f481e3aaa0f1a09e30ed741d8ae4fcf5e095d5d00af600db18cb2c04b3ed"
    "d03cc744a2888ae40caa232946c5e7e1", 16,
)
# Bandersnatch TE: a = -5; COEFF_D from the reference's arkworks Montgomery
# BigInt limbs (utils.rs:34-37), decoded here by an independent REDC undo
_ARK_D_LIMBS = [
    12167860994669987632, 4043113551995129031,
    6052647550941614584, 3904213385886034240,
]
# Bandersnatch generator (arkworks ed_on_bls12_381_bandersnatch)
BAND_GX = 0x29C132CC2C0B34C5743711777BBE42F32B79C022AD998465E1E71866A252AE18
BAND_GY = 0x2A6C669EDA123E0F157D8B50BADCD586358CAD81EEE464605E3167B6CC974166


def _ref_coeff_d() -> int:
    v = 0
    for i, l in enumerate(_ARK_D_LIMBS):
        v |= l << (64 * i)
    return v * pow(1 << 256, -1, R_MOD) % R_MOD


# ---------------------------------------------------------------------------
# independent curve models (written from the curve equations, in-test)
# ---------------------------------------------------------------------------

def _te_add(p1, p2, a, d, p):
    (x1, y1), (x2, y2) = p1, p2
    dxy = d * x1 % p * x2 % p * y1 % p * y2 % p
    x3 = (x1 * y2 + x2 * y1) % p * pow(1 + dxy, -1, p) % p
    y3 = (y1 * y2 - a * x1 * x2) % p * pow(1 - dxy, -1, p) % p
    return (x3, y3)


def _sw_add(p1, p2, p):
    """Short-Weierstrass affine addition (y^2 = x^3 + 4), None = infinity."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if p1 == p2:
        lam = 3 * x1 * x1 % p * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


def _scalar_mul(k, pt, add, neutral):
    acc = neutral
    cur = pt
    while k:
        if k & 1:
            acc = add(acc, cur)
        cur = add(cur, cur)
        k >>= 1
    return acc


# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------

def test_fr_field_vectors():
    """Device Montgomery limb arithmetic vs plain pow/% ground truth."""
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FR

    assert FR.modulus == R_MOD  # the published BLS12-381 scalar field
    a = 0x1234567890ABCDEF_FEDCBA0987654321_0011223344556677_8899AABBCCDDEEFF % R_MOD
    b = 0x0F0E0D0C0B0A0908_0706050403020100_1F2E3D4C5B6A7988_97A6B5C4D3E2F100 % R_MOD
    enc = jnp.asarray(fl.encode_ints(FR, [a, b]))
    got_mul = fl.decode_ints(FR, fl.mul(FR, enc[0:1], enc[1:2]))[0]
    got_add = fl.decode_ints(FR, fl.add(FR, enc[0:1], enc[1:2]))[0]
    got_sub = fl.decode_ints(FR, fl.sub(FR, enc[0:1], enc[1:2]))[0]
    got_inv = fl.decode_ints(FR, fl.inv(FR, enc[0:1]))[0]
    assert got_mul == a * b % R_MOD
    assert got_add == (a + b) % R_MOD
    assert got_sub == (a - b) % R_MOD
    assert got_inv == pow(a, -1, R_MOD)


def test_bandersnatch_constants_match_reference():
    """Package curve constants == the reference's hardcoded arkworks values
    (utils.rs:34-37) and generator is on-curve."""
    from gkr_msm_tpu.ops.curve import bandersnatch as bs

    d = _ref_coeff_d()
    assert bs.D_INT == d
    assert bs.A_INT == R_MOD - 5
    assert bs.Host.gen == (BAND_GX, BAND_GY)
    a = R_MOD - 5
    lhs = (a * BAND_GX * BAND_GX + BAND_GY * BAND_GY) % R_MOD
    rhs = (1 + d * BAND_GX * BAND_GX % R_MOD * BAND_GY * BAND_GY) % R_MOD
    assert lhs == rhs


def test_bandersnatch_add_and_msm_vectors():
    """Package host + device TE arithmetic vs the in-test independent model."""
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FR

    a, d = R_MOD - 5, _ref_coeff_d()
    add = lambda p1, p2: _te_add(p1, p2, a, d, R_MOD)
    g = (BAND_GX, BAND_GY)
    # scalar-mul chain vector
    k = 0xDEADBEEF12345678
    expect = _scalar_mul(k, g, add, (0, 1))
    assert bs.Host.scalar_mul(k, g) == expect
    # 16-point MSM vector (points = j*G via the independent model)
    pts = [_scalar_mul(j + 1, g, add, (0, 1)) for j in range(16)]
    scalars = [(j * j + 3) for j in range(16)]
    expect_msm = (0, 1)
    for s, pt in zip(scalars, pts):
        expect_msm = add(expect_msm, _scalar_mul(s, pt, add, (0, 1)))
    assert bs.Host.msm(scalars, pts) == expect_msm
    # device projective chain: sum of all 16 points
    dev = jnp.asarray(bs.encode_affine_to_proj(pts))
    acc = dev[0]
    for i in range(1, 16):
        acc = bs.te_add(acc, dev[i])
    xyz = fl.decode_ints(FR, np.asarray(acc))
    expect_sum = (0, 1)
    for pt in pts:
        expect_sum = add(expect_sum, pt)
    assert bs.Host.normalize_proj(tuple(xyz)) == expect_sum


def test_g1_add_and_generator_vectors():
    """Package G1 vs the in-test short-Weierstrass model + spec generator."""
    from gkr_msm_tpu.ops.curve import bls12381 as g1
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FQ

    assert FQ.modulus == P_MOD
    assert g1.Host.gen == (G1_X, G1_Y)
    assert (G1_Y * G1_Y - (G1_X ** 3 + 4)) % P_MOD == 0
    g = (G1_X, G1_Y)
    add = lambda p1, p2: _sw_add(p1, p2, P_MOD)
    expect5 = _scalar_mul(5, g, add, None)
    assert g1.Host.scalar_mul(5, g) == expect5
    # device complete-formula chain: ((G+G)+G)+... 5 times
    dev = jnp.asarray(g1.encode_affine_to_proj([g]))
    acc = g1.g1_double(dev[0])
    acc = g1.g1_add(acc, dev[0])
    acc = g1.g1_add(acc, g1.g1_double(dev[0]))
    got = g1.decode_proj(np.asarray(acc)[None])[0]
    assert got == expect5


def test_kzg_commit_vector():
    """Device KZG commit vs an independent powers-of-tau + affine MSM model
    (mock setup construction mirrors kzg.rs:84-97)."""
    from gkr_msm_tpu.commitments.kzg import KzgProvingKey
    from gkr_msm_tpu.ops.curve import pairing as pr

    tau = 7
    g = (G1_X, G1_Y)
    add = lambda p1, p2: _sw_add(p1, p2, P_MOD)
    h0 = pr.g2_generator()
    pk = KzgProvingKey.mock_setup(tau, g, h0, size=8)
    # independent ptau check
    for i in range(8):
        assert pk.ptau_host[i] == _scalar_mul(pow(tau, i, R_MOD), g, add, None)
    poly = [3, 1, 4, 1, 5, 9, 2, 6]
    got = pk.commit(poly)
    expect = None
    for c, pt in zip(poly, pk.ptau_host):
        expect = add(expect, _scalar_mul(c, pt, add, None))
    assert got == expect
    # and the Horner identity: commit == (sum c_i tau^i) * G
    s = sum(c * pow(tau, i, R_MOD) for i, c in enumerate(poly)) % R_MOD
    assert got == _scalar_mul(s, g, add, None)
