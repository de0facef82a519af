"""Commitment stack: KZG open/verify, Knuckles identity + opening protocol,
multi-open reduction (kzg.rs/knuckles.rs/opening.rs/multiopen_reduction.rs
test patterns)."""
import pytest

from gkr_msm_tpu.commitments import kzg as kzgm
from gkr_msm_tpu.commitments.knuckles import KnucklesProvingKey
from gkr_msm_tpu.models.opening import (
    KnucklesOpeningProtocol,
    MultiOpenReduction,
    OpeningClaim,
    PointClaim,
)
from gkr_msm_tpu.ops.curve import bls12381 as g1
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.utils.transcript import Transcript

P = FR.modulus


@pytest.fixture(scope="module")
def srs():
    import random

    rng = random.Random(0xBEEF)
    return kzgm.random_kzg_pk(2 * 16 - 1, rng)  # supports num_vars=4 knuckles


def test_div_by_linear(rng):
    poly = [rng.randrange(P) for _ in range(9)]
    pt = rng.randrange(P)
    q, rem = kzgm.div_by_linear(poly, pt)
    assert kzgm.ev(poly, pt) == rem
    z = rng.randrange(P)
    assert kzgm.ev(poly, z) == (kzgm.ev(q, z) * (z - pt) + rem) % P


def test_kzg_open_verify(rng, srs):
    poly = [rng.randrange(P) for _ in range(13)]
    vk = srs.verifying_key()
    comm = srs.commit(poly)
    at = rng.randrange(P)
    qc, opening = srs.open(poly, at)
    assert opening == kzgm.ev(poly, at)
    vk.verify_directly(comm, qc, at, opening)
    vk.verify_pair(vk.verify_reduce_to_pair(comm, qc, at, opening))
    with pytest.raises(AssertionError):
        vk.verify_directly(comm, qc, at, (opening + 1) % P)


def test_knuckles_identity(rng, srs):
    num_vars = 4
    pk = KnucklesProvingKey.new(srs, num_vars, k=2)
    poly = [rng.randrange(P) for _ in range(1 << num_vars)]
    point = [rng.randrange(P) for _ in range(num_vars)]
    t, opening = pk.compute_t(poly, point)
    # opening == evaluate_poly(poly, point) with liblasso vertex ordering:
    # coefficient i = evaluation at vertex(i) with bit j of i <-> point
    # coordinate num_vars-1-j  (dense MLE with our MSB-first convention)
    dense = mle.encode_point  # silence lint
    import jax.numpy as jnp

    poly_dev = jnp.asarray(fl.encode_ints(FR, poly))
    assert mle.evaluate(FR, poly_dev, point) == opening

    # the defining identity at a random x: T(kx) - k^(N-1) T(x) + c x^(N-1)
    #                                       == P(x) E_r(x)
    n = 1 << num_vars
    x = rng.randrange(P)
    exp_e = 1
    xpow = x
    for i in range(num_vars):
        r = point[num_vars - 1 - i]
        exp_e = exp_e * (r + (1 - r) * xpow) % P
        xpow = xpow * xpow % P
    lhs = (kzgm.ev(t, x * pk.k % P) - pow(pk.k, n - 1, P) * kzgm.ev(t, x)
           + opening * pow(x, n - 1, P)) % P
    rhs = kzgm.ev(poly, x) * exp_e % P
    assert lhs == rhs


def test_knuckles_opening_protocol(rng, srs):
    num_vars = 4
    pk = KnucklesProvingKey.new(srs, num_vars, k=2)
    vk = pk.verifying_key()
    poly = [rng.randrange(P) for _ in range(1 << num_vars)]
    point = [rng.randrange(P) for _ in range(num_vars)]
    _, opening = pk.compute_t(poly, point)
    comm = pk.commit(poly)
    claims = OpeningClaim(commitment=comm, point=point, ev=opening)

    proto = KnucklesOpeningProtocol(vk=vk, pk=pk)
    tr = Transcript(b"knuckles")
    pair, _ = proto.prove(tr, claims, poly)
    proof = tr.end()

    tv = Transcript(b"knuckles", proof=proof)
    pair2 = proto.verify(tv, claims)
    tv.assert_end()
    assert pair == pair2
    vk.kzg_vk.verify_pair(pair)

    # wrong ev must fail
    bad = OpeningClaim(commitment=comm, point=point, ev=(opening + 1) % P)
    with pytest.raises(AssertionError):
        tv = Transcript(b"knuckles", proof=proof)
        proto.verify(tv, bad)


def test_multiopen_reduction(rng):
    nvars, nargs = 4, 3
    polys = [mle.random_poly(FR, rng, nvars) for _ in range(nargs)]
    claims = []
    for poly in polys:
        pt = [rng.randrange(P) for _ in range(nvars)]
        claims.append(PointClaim(point=pt, ev=mle.evaluate(FR, poly, pt)))

    proto = MultiOpenReduction(nvars=nvars, nargs=nargs)
    tr = Transcript(b"multiopen")
    out_claims, _ = proto.prove(tr, claims, list(polys))
    proof = tr.end()

    tv = Transcript(b"multiopen", proof=proof)
    ver_claims = proto.verify(tv, claims)
    tv.assert_end()
    assert out_claims == ver_claims
    for poly, e in zip(polys, ver_claims.evs):
        assert mle.evaluate(FR, poly, ver_claims.point) == e


def test_compute_t_device_matches_host(rng):
    """Device staged compute_t (knuckles.rs:111-154 analog) is bit-equal to
    the host-int model at a size above the device switchover."""
    import jax.numpy as jnp

    from gkr_msm_tpu.commitments.knuckles import (
        _DEVICE_T_MIN,
        KnucklesProvingKey,
    )
    from gkr_msm_tpu.ops.field.spec import FR

    num_vars = max(10, _DEVICE_T_MIN.bit_length() - 1)
    n = 1 << num_vars
    # compute_t touches only `inverses`, not the basis points: a zero ptau
    # keeps this in the fast tier (no fixed-base batch setup)
    fake_pk = kzgm.KzgProvingKey(
        ptau_dev=jnp.zeros((2 * n - 1, 3, 24), dtype=jnp.uint32),
        ptau_host=[], h0=None, h1=None,
    )
    key = KnucklesProvingKey.new(fake_pk, num_vars, k=2)
    poly = [rng.randrange(FR.modulus) for _ in range(n)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    t_host, op_host = key.compute_t_host(poly, point)
    t_dev, op_dev = key.compute_t(poly, point)
    assert op_host == op_dev
    assert t_host == t_dev
