"""Logup mainphase + pushforward protocol tests (logup_mainphase.rs:278-338,
pushforward.rs:1050-1189 patterns)."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from gkr_msm_tpu.commitments import kzg as kzgm
from gkr_msm_tpu.commitments.knuckles import KnucklesProvingKey
from gkr_msm_tpu.models.logup import LogupMainphase
from gkr_msm_tpu.models.pushforward import (
    PushForwardState,
    PushforwardProtocol,
)
from gkr_msm_tpu.models.sumcheck import SinglePointClaims
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.utils.transcript import Transcript

P = FR.modulus


def test_logup_mainphase(rng):
    logsizes = [4, 4, 2, 2]
    inputs = []
    dense_inputs = []
    total = 0
    for ls in logsizes:
        quot = [rng.randrange(P) for _ in range(1 << ls)]
        den = [rng.randrange(1, P) for _ in range(1 << ls)]
        num = [q * d % P for q, d in zip(quot, den)]
        total = (total + sum(quot)) % P
        ndev = jnp.asarray(fl.encode_ints(FR, num))
        ddev = jnp.asarray(fl.encode_ints(FR, den))
        inputs.append((ndev, ddev))
        dense_inputs.append((ndev, ddev))

    proto = LogupMainphase(logsizes)
    tr = Transcript(b"logup")
    claims, _ = proto.prove(tr, total, inputs)
    proof = tr.end()

    tv = Transcript(b"logup", proof=proof)
    vclaims = proto.verify(tv, total)
    tv.assert_end()
    assert claims == vclaims

    # first claim covers inputs 0+1 (4 evs), later claims one input each
    c0 = claims[0]
    assert mle.evaluate(FR, dense_inputs[0][0], c0.point) == c0.evs[0]
    assert mle.evaluate(FR, dense_inputs[0][1], c0.point) == c0.evs[1]
    assert mle.evaluate(FR, dense_inputs[1][0], c0.point) == c0.evs[2]
    assert mle.evaluate(FR, dense_inputs[1][1], c0.point) == c0.evs[3]
    for claim, (ndev, ddev) in zip(claims[1:], dense_inputs[2:]):
        assert mle.evaluate(FR, ndev, claim.point) == claim.evs[0]
        assert mle.evaluate(FR, ddev, claim.point) == claim.evs[1]

    # wrong total must fail
    with pytest.raises(AssertionError):
        proto.verify(Transcript(b"logup", proof=proof), (total + 1) % P)


@pytest.fixture(scope="module")
def pf_state():
    rng = random.Random(0xABCD)
    x_logsize, y_logsize, d_logsize = 4, 3, 3
    y_size = 5
    clm = 1
    x_size = 1 << x_logsize
    points = [bs.Host.random_point(rng) for _ in range(x_size)]
    coefs = [rng.randrange(1 << (y_size * d_logsize)) for _ in range(x_size)]
    srs = kzgm.random_kzg_pk(2 * (1 << (x_logsize + clm)) - 1, rng)
    key = KnucklesProvingKey.new(srs, x_logsize + clm, k=2)
    state = PushForwardState(
        points, coefs, y_size, y_logsize, d_logsize, x_logsize, clm, key
    )
    return rng, state, points, coefs


def test_pushforward_image_bijection(pf_state):
    """Every (y, x) entry lands at image[y<<d + digit][counter] exactly once
    (pushforward.rs:990-1048)."""
    rng, state, points, coefs = pf_state
    cfg = state.cfg
    img_x = np.asarray(state.image[0].data)
    img_dom = np.asarray(state.image[2].data)
    seen = np.zeros(img_x.shape[:2], dtype=bool)
    for y in range(cfg.y_size):
        for x in range(1 << cfg.x_logsize):
            row = (y << cfg.d_logsize) + int(state.digits[y][x])
            slot = int(state.counter[y][x])
            assert not seen[row, slot]
            seen[row, slot] = True
            got = fl.decode_ints(FR, img_x[row, slot])[0]
            assert got == points[x][0]
    # all unseen slots are pads (domain 0)
    dom_vals = np.asarray(
        fl.decode_ints(FR, img_dom.reshape(-1, FR.n_limbs))
    ).reshape(img_dom.shape[:2])
    assert (dom_vals[~seen] == 0).all()
    assert (dom_vals[seen] == 1).all()


def test_pushforward_prove_verify(pf_state):
    rng, state, points, coefs = pf_state
    cfg = state.cfg
    r = [rng.randrange(P) for _ in range(cfg.y_logsize + cfg.d_logsize + cfg.x_logsize)]
    image_evals = [img.evaluate(r) for img in state.image]
    state.second_phase(r)

    proto = PushforwardProtocol(
        x_logsize=cfg.x_logsize,
        y_logsize=cfg.y_logsize,
        y_size=cfg.y_size,
        d_logsize=cfg.d_logsize,
    )
    claims = SinglePointClaims(point=r, evs=image_evals)

    tr = Transcript(b"pushforward")
    out_p, _ = proto.prove(tr, claims, state)
    proof = tr.end()

    tv = Transcript(b"pushforward", proof=proof)
    out_v = proto.verify(tv, claims)
    tv.assert_end()
    assert out_p.claims_about_matrix == out_v.claims_about_matrix
    assert out_p.claims_ac_c == out_v.claims_ac_c
    assert out_p.claims_ac_d == out_v.claims_ac_d

    # check final matrix claims against direct evaluations
    out_point = out_p.claims_about_matrix.point
    p_folded_ev, c_pull_ev, d_pull_ev, c_ev, d_ev = out_p.claims_about_matrix.evs
    gamma = out_p.gamma
    msize = 1 << (cfg.x_logsize + cfg.y_logsize)

    def padded(dev):
        n = dev.shape[0]
        if n < msize:
            pad = jnp.zeros((msize - n, FR.n_limbs), dtype=jnp.uint32)
            dev = jnp.concatenate([dev, pad], axis=0)
        return dev

    assert c_ev == mle.evaluate(FR, padded(state.c_dev), out_point)
    assert d_ev == mle.evaluate(FR, padded(state.d_dev), out_point)
    assert c_pull_ev == mle.evaluate(FR, padded(state.c_pull_dev), out_point)
    assert d_pull_ev == mle.evaluate(FR, padded(state.d_pull_dev), out_point)
    x_pt = out_point[cfg.y_logsize :]
    expected_pf = (
        mle.evaluate(FR, state.p0_dev, x_pt)
        + gamma * mle.evaluate(FR, state.p1_dev, x_pt)
        + gamma * gamma
    ) % P
    assert p_folded_ev == expected_pf

    # ac claims
    assert out_p.claims_ac_c.evs[0] == mle.evaluate(
        FR, state.ac_c_dev, out_p.claims_ac_c.point
    )
    assert out_p.claims_ac_d.evs[0] == mle.evaluate(
        FR, state.ac_d_dev, out_p.claims_ac_d.point
    )


def test_witness_gen_vectorized_matches_naive(rng):
    """The vectorized digit-decomposition / scatter-counter pass (numpy,
    whole-matrix) matches a per-element naive model (pushforward.rs:351-429).
    Fast tier: pure host, no device work."""
    from gkr_msm_tpu.models.pushforward import (
        _sorted_bucket_ranks,
        decompose_digits,
        scatter_counters,
    )

    y_size, d_logsize, x_logsize = 7, 4, 7
    x_size = 1 << x_logsize
    coefs = [rng.randrange(1 << (y_size * d_logsize)) for _ in range(x_size)]
    digits = decompose_digits(coefs, y_size, d_logsize)
    counter, orders, ranks = scatter_counters(digits)

    for x in range(0, x_size, 17):
        for y in range(y_size):
            assert digits[y, x] == (coefs[x] >> (y * d_logsize)) & ((1 << d_logsize) - 1)
    # counters: landing slot = number of earlier x with the same digit
    for y in range(y_size):
        seen = {}
        for x in range(x_size):
            d = int(digits[y, x])
            assert counter[y, x] == seen.get(d, 0)
            seen[d] = seen.get(d, 0) + 1
    assert (ranks == counter).all()
    # orders is the stable argsort; ranks invert it
    ord2, sorted_d, rank_sorted = _sorted_bucket_ranks(digits)
    assert (ord2 == orders).all()
    assert (np.take_along_axis(digits, orders, axis=1) == sorted_d).all()


def test_outer_bucket_commits_match_direct():
    """The outer-bucket commitment scheme (phase-1 bit-masked combine +
    phase-2 bucket MSMs, pushforward.rs:398-456,504-524,572-622) must produce
    group elements bit-identical to direct full-matrix MSM commits, on a
    ragged config (y_size=5, clm=1 -> a partial last multirow)."""
    rng = random.Random(0xB0C4)
    x_logsize, y_logsize, d_logsize = 3, 3, 2
    y_size = 5
    clm = 1
    x_size = 1 << x_logsize
    points = [bs.Host.random_point(rng) for _ in range(x_size)]
    coefs = [rng.randrange(1 << (y_size * d_logsize)) for _ in range(x_size)]
    srs = kzgm.random_kzg_pk(2 * (1 << (x_logsize + clm)) - 1, rng)
    key = KnucklesProvingKey.new(srs, x_logsize + clm, k=2)
    state = PushForwardState(
        points, coefs, y_size, y_logsize, d_logsize, x_logsize, clm, key
    )
    assert state._use_outer

    c_bits = max(int(state.counter.max()), 1).bit_length()
    assert state.phase_1_comm.c == state._commit_int_matrix(state.counter, c_bits)
    assert state.phase_1_comm.d == state._commit_int_matrix(
        state.digits, max(d_logsize, 1)
    )

    r = [rng.randrange(P) for _ in range(y_logsize + d_logsize + x_logsize)]
    state.second_phase(r)
    assert state.phase_2_comm.c_pull == state._commit_mont_matrix(state.c_pull_dev)
    assert state.phase_2_comm.d_pull == state._commit_mont_matrix(state.d_pull_dev)
