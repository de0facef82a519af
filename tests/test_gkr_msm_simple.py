"""Legacy bit-decomposition MSM GKR tests (gkr_msm_simple.rs:86-318,
test at :322-428): witness semantics vs host group arithmetic, prove/verify
transcript roundtrip, tamper rejection, and the round-driven pump shape."""
import random

import numpy as np
import pytest

from gkr_msm_tpu.models import gkr_msm_simple as gms
from gkr_msm_tpu.models.legacy import RoundDrivenProver, RoundDrivenVerifier
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.utils.transcript import Transcript

P = FR.modulus

LP, LB, LC = 3, 2, 1  # log points, log scalar bits, log bit columns


@pytest.fixture(scope="module")
def instance():
    rng = random.Random(0x51)
    num_points = 1 << LP
    nb = 1 << LB
    points = [bs.Host.random_point(rng) for _ in range(num_points)]
    scalars = [[rng.randrange(2) for _ in range(nb)] for _ in range(num_points)]
    ck = gms.CommitmentKey.new(rng, col_size=(num_points * nb) >> LC, gamma=4)
    return points, scalars, ck


def test_witness_outputs_match_group_arithmetic(instance):
    """Pattern §4.3: tree outputs reinterpreted as curve points equal the
    host-model pairwise sums of (bit ? P : neutral)."""
    points, scalars, _ = instance
    bits_flat = np.asarray([b for s in scalars for b in s], dtype=np.uint32)
    _, outputs = gms.build_witness(bits_flat, points, LP, LB)
    nb = 1 << LB
    vals = [
        points[k // nb] if bits_flat[k] else bs.Host.neutral()
        for k in range(len(bits_flat))
    ]
    for _ in range(LP):
        vals = [bs.Host.add(vals[2 * i], vals[2 * i + 1]) for i in range(len(vals) // 2)]
    xs = fl.decode_ints(FR, np.asarray(outputs[0]))
    ys = fl.decode_ints(FR, np.asarray(outputs[1]))
    zs = fl.decode_ints(FR, np.asarray(outputs[2]))
    for i, expected in enumerate(vals):
        assert zs[i] != 0
        got = bs.Host.normalize_proj((xs[i], ys[i], zs[i]))
        assert got == expected


def test_prove_verify_roundtrip(instance):
    points, scalars, ck = instance
    tr = Transcript(b"gkr-msm-simple")
    final_claims, proof = gms.gkr_msm_prove(scalars, points, LP, LB, LC, ck, tr)
    blob = tr.end()

    tv = Transcript(b"gkr-msm-simple", proof=blob)
    v_claims, v_proof = gms.gkr_msm_verify(LP, LB, LC, tv)
    tv.assert_end()
    assert v_claims.point == final_claims.point
    assert v_claims.evs == final_claims.evs
    assert v_proof.output == proof.output
    assert v_proof.point_column == proof.point_column
    assert v_proof.bit_columns == proof.bit_columns

    # final claims are about the base polys [bits, px_rep, py_rep]: check
    # directly against the witness (the reference leaves them unopened)
    bits_flat = np.asarray([b for s in scalars for b in s], dtype=np.uint32)
    advices, _ = gms.build_witness(bits_flat, points, LP, LB)
    base = advices[0]
    for ev, poly in zip(final_claims.evs, base):
        ints = fl.decode_ints(FR, np.asarray(poly))
        assert gms._evaluate_host(ints, final_claims.point) == ev


def test_verify_rejects_tamper(instance):
    points, scalars, ck = instance
    tr = Transcript(b"gkr-msm-simple")
    gms.gkr_msm_prove(scalars, points, LP, LB, LC, ck, tr)
    blob = bytearray(tr.end())
    blob[len(blob) // 2] ^= 1
    with pytest.raises(AssertionError):
        tv = Transcript(b"gkr-msm-simple", proof=bytes(blob))
        gms.gkr_msm_verify(LP, LB, LC, tv)
        tv.assert_end()


def test_round_driven_pump(instance):
    """The legacy `prover.round(challenge)` API over the simple MSM GKR
    (gkr_msm_simple.rs:311-318 pumps BintreeProver the same way)."""
    points, scalars, _ = instance
    bits_flat = np.asarray([b for s in scalars for b in s], dtype=np.uint32)
    advices, outputs = gms.build_witness(bits_flat, points, LP, LB)
    rng = random.Random(0xAB)
    claim_point = [rng.randrange(P) for _ in range(LB)]
    from gkr_msm_tpu.models.sumcheck import SinglePointClaims
    from gkr_msm_tpu.ops.poly import mle

    claims = SinglePointClaims(
        point=claim_point,
        evs=[mle.evaluate(FR, o, claim_point) for o in outputs],
    )
    proto = gms.GkrMsmSimpleProtocol(LP, LB)
    prover = RoundDrivenProver(proto, claims, advices)
    challenges = []
    out = None
    rng2 = random.Random(0xCD)
    while out is None:
        c = rng2.randrange(1 << 128)
        challenges.append(c)
        out = prover.round(c)
    final_claims, proof_bytes = out

    verifier = RoundDrivenVerifier(proto, claims, proof_bytes)
    vout = None
    for c in challenges:
        assert vout is None
        vout = verifier.round(c)
    assert vout.point == final_claims.point
    assert vout.evs == final_claims.evs
