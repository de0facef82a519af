"""Single-dispatch device prover vs the host round loop: byte-identical.

The fused prover (models/fused_prover.py) must produce the EXACT transcript
bytes of the unfused path — same round messages, same challenges, same final
claims — because downstream protocols keep drawing from the same sponge.
"""
import random

import numpy as np
import pytest

from gkr_msm_tpu.models import fused_prover as fp
from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck, SinglePointClaims
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.ops.poly.algfn import apply_fn
from gkr_msm_tpu.utils.transcript import Transcript


def _setup(fn, num_vars, seed):
    rng = random.Random(seed)
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    eq = mle.eq_table(FR, point)
    outs = apply_fn(fn, polys)
    evs = [
        fl.decode_ints(FR, mle.field_sum(FR, fl.mul(FR, o, eq)))[0] for o in outs
    ]
    return polys, SinglePointClaims(point=point, evs=evs)


@pytest.mark.parametrize("fn", [bs.PROJ_L2, bs.AFFINE_L1], ids=lambda f: f.name)
def test_fused_prover_transcript_identical(fn, monkeypatch):
    num_vars = 5
    polys, claims = _setup(fn, num_vars, 0xFACE)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    tr_ref = Transcript(b"fused-eq")
    ref_claims, _ = proto.prove(tr_ref, claims, [p for p in polys])
    ref_proof = tr_ref.end()

    # force the fused path (pallas kernels stay off on CPU; the device
    # program falls back to XLA round kernels inside the single trace)
    monkeypatch.setattr(fp, "should_use", lambda fn_, nv: fn_.ops_fn is not None)
    tr_dev = Transcript(b"fused-eq")
    dev_claims, _ = proto.prove(tr_dev, claims, [p for p in polys])
    dev_proof = tr_dev.end()

    assert dev_proof == ref_proof
    assert dev_claims.point == ref_claims.point
    assert dev_claims.evs == ref_claims.evs

    # and the proof still verifies
    tv = Transcript(b"fused-eq", proof=dev_proof)
    out = proto.verify(tv, claims)
    tv.assert_end()
    assert out.point == dev_claims.point


def test_sha256_jnp_matches_hashlib():
    import hashlib

    import jax.numpy as jnp

    from gkr_msm_tpu.utils import sha256_jnp as shj

    state = shj.initial_state_host(b"abc")
    # absorb a 96-byte payload
    payload = bytes(range(96))
    words = shj._bytes_to_words_host(payload)
    got = np.asarray(shj.absorb(jnp.asarray(state), jnp.asarray(words), 96))
    ref = hashlib.sha256(state.astype(">u4").tobytes() + payload).digest()
    assert got.astype(">u4").tobytes() == ref

    # squeeze128 + ratchet mirrors Transcript._squeeze(16)
    d4, new_state = shj.squeeze128_and_ratchet(jnp.asarray(state))
    sbytes = state.astype(">u4").tobytes()
    ref16 = hashlib.sha256(
        sbytes + b"squeeze" + (0).to_bytes(4, "little")
    ).digest()[:16]
    refstate = hashlib.sha256(sbytes + b"ratchet").digest()
    assert np.asarray(d4).astype(">u4").tobytes() == ref16
    assert np.asarray(new_state).astype(">u4").tobytes() == refstate


@pytest.mark.parametrize(
    "fn,tail_log",
    [(bs.PROJ_L2, 2), (bs.AFFINE_L1, 3)],
    ids=["te_l2-tail2", "affine_l1-tail3"],
)
def test_fused_prover_halves_pipeline_transcript_identical(
    monkeypatch, fn, tail_log
):
    """The zero-copy bitrev halves pipeline must keep the transcript
    byte-identical to the host round loop.  Runs the kernels in pure-jnp
    EMULATION (same block math; pallas interpret mode takes minutes per
    kernel compile on XLA:CPU) — the pallas lowering itself is anchored by
    tests/test_pallas_sumcheck.py's interpret-mode kernel tests."""
    import gkr_msm_tpu.ops.pallas.field_kernels as fk
    from gkr_msm_tpu.ops.pallas import sumcheck_kernels as sk

    monkeypatch.setattr(sk, "_EMULATE", True)
    num_vars = 6
    polys, claims = _setup(fn, num_vars, 0xA11E + tail_log)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    tr_ref = Transcript(b"fused-halves")
    ref_claims, _ = proto.prove(tr_ref, claims, [p for p in polys])
    ref_proof = tr_ref.end()

    monkeypatch.setattr(fp, "should_use", lambda fn_, nv: fn_.ops_fn is not None)
    monkeypatch.setattr(fp, "TAIL_LOG", tail_log)
    # force ONLY the halves-pipeline decision; ordinary fl.* stays on XLA
    monkeypatch.setattr(sk, "should_use_halves", lambda *a: True)
    tr_dev = Transcript(b"fused-halves")
    dev_claims, _ = proto.prove(tr_dev, claims, [p for p in polys])
    dev_proof = tr_dev.end()

    assert dev_proof == ref_proof
    assert dev_claims.point == ref_claims.point
    assert dev_claims.evs == ref_claims.evs


@pytest.mark.parametrize("tail_log", [0, 3, 10])
def test_fused_prover_unrolled_plus_scan_tail(monkeypatch, tail_log):
    """The unrolled-head + lax.scan-tail split (any threshold) must keep the
    transcript byte-identical to the host round loop."""
    fn = bs.PROJ_L2
    num_vars = 6
    polys, claims = _setup(fn, num_vars, 0xBEEF + tail_log)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    tr_ref = Transcript(b"fused-tail")
    ref_claims, _ = proto.prove(tr_ref, claims, [p for p in polys])
    ref_proof = tr_ref.end()

    monkeypatch.setattr(fp, "should_use", lambda fn_, nv: fn_.ops_fn is not None)
    monkeypatch.setattr(fp, "TAIL_LOG", tail_log)
    tr_dev = Transcript(b"fused-tail")
    dev_claims, _ = proto.prove(tr_dev, claims, [p for p in polys])
    dev_proof = tr_dev.end()

    assert dev_proof == ref_proof
    assert dev_claims.point == ref_claims.point
    assert dev_claims.evs == ref_claims.evs
