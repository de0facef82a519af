"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed backend (SURVEY.md §2.12); these validate
the TPU-native scaling axis: sharded tables, psum'd round scalars, local
binds, shard->replicated switchover — and that the sharded prover's
transcript is byte-identical to the single-device one."""
import random

import jax
import numpy as np
import pytest

from gkr_msm_tpu.models.sumcheck import (
    DenseDeg2Sumcheck,
    SinglePointClaims,
    _round_sums,
)
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.ops.poly.algfn import apply_fn
from gkr_msm_tpu.parallel import sharded
from gkr_msm_tpu.utils.transcript import Transcript


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return sharded.make_mesh(jax.devices()[:8])


def test_sharded_round_sums_match_local(mesh, rng):
    fn = bs.PROJ_L1
    num_vars = 7
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    eq = mle.eq_table(
        FR, [rng.randrange(FR.modulus) for _ in range(num_vars - 1)]
    )
    ref = np.asarray(_round_sums(FR, polys, fn, eq))
    sh_polys = [sharded.shard_table(mesh, p) for p in polys]
    sh_eq = sharded.shard_table(mesh, eq)
    got = np.asarray(
        sharded.sharded_round_sums(mesh, FR, fn, sh_polys, sh_eq)
    )
    assert np.array_equal(ref, got)


def test_sharded_bind_matches_local(mesh, rng):
    polys = [mle.random_poly(FR, rng, 7) for _ in range(3)]
    t = mle.scalar(FR, rng.randrange(FR.modulus))
    ref = [np.asarray(mle.bind_low(FR, p, t)) for p in polys]
    sh = [sharded.shard_table(mesh, p) for p in polys]
    got = sharded.sharded_bind(mesh, FR, sh, t)
    for r, g in zip(ref, got):
        assert np.array_equal(r, np.asarray(g))


def test_sharded_prove_transcript_identical(mesh, rng):
    """Full sharded sumcheck (incl. shard->replicated switchover) produces
    the same proof bytes as the single-device prover, and verifies."""
    fn = bs.PROJ_L2
    num_vars = 8  # 2^8 table over 8 devices -> switchover mid-protocol
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    eq = mle.eq_table(FR, point)
    outs = apply_fn(fn, polys)
    evs = [
        fl.decode_ints(FR, mle.field_sum(FR, fl.mul(FR, o, eq)))[0]
        for o in outs
    ]
    claims = SinglePointClaims(point=point, evs=evs)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    tr_ref = Transcript(b"sharded")
    ref_claims, _ = proto.prove(tr_ref, claims, polys)
    ref_proof = tr_ref.end()

    tr_sh = Transcript(b"sharded")
    sh_claims, _ = sharded.sharded_prove(
        mesh, tr_sh, fn, num_vars, claims, polys
    )
    sh_proof = tr_sh.end()

    assert sh_proof == ref_proof
    assert sh_claims == ref_claims

    tv = Transcript(b"sharded", proof=sh_proof)
    ver_claims = proto.verify(tv, claims)
    tv.assert_end()
    assert ver_claims == sh_claims


def test_sharded_pippenger_e2e_transcript_identical():
    """FULL Pippenger prove under the ambient mesh == single-device proof
    bytes (VERDICT.md round-1 missing #1: the whole prover, not a demo).
    Slow tier: two full XLA compile sweeps."""
    import random

    from gkr_msm_tpu.models.pippenger import (
        build_pippenger_data,
        run_pippenger,
        verify_pippenger,
    )
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.parallel import context as pctx
    from gkr_msm_tpu.parallel.sharded import make_mesh
    from gkr_msm_tpu.utils.transcript import Transcript

    data = build_pippenger_data(
        random.Random(17), d_logsize=2, x_logsize=4, num_bits=8, clm=1
    )
    tr_ref = Transcript(b"mesh-e2e")
    out_ref = run_pippenger(tr_ref, data)
    proof_ref = tr_ref.end()
    mesh = make_mesh()
    with pctx.use_mesh(mesh):
        tr = Transcript(b"mesh-e2e")
        out = run_pippenger(tr, data)
        proof = tr.end()
    assert proof == proof_ref, "mesh transcript != single-device transcript"
    assert out.claims.evs == out_ref.claims.evs
    expected = bs.Host.msm(data.coefs, data.points)
    tv = Transcript(b"mesh-e2e", proof=proof)
    got = verify_pippenger(tv, data.config, out, expected_msm=expected)
    tv.assert_end()
    assert got == expected


def test_psum_field_binary_reduce(mesh, rng):
    """_psum_field's O(log D) conditional-subtraction ladder is an exact
    mod-p reduction of the cross-device limb sum (values chosen near p so
    the sum spans the full [0, 8p) range)."""
    import functools

    from jax.sharding import PartitionSpec as PSpec

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    p = FR.modulus
    vals = [p - 1 - rng.randrange(3) for _ in range(7)] + [rng.randrange(p)]
    arr = sharded.shard_table(mesh, mle.encode_point(FR, vals))

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(PSpec(sharded.AXIS),), out_specs=PSpec()
    )
    def step(x):
        return sharded._psum_field(FR, x[0], sharded.AXIS, 8)

    got = fl.decode_ints(FR, np.asarray(jax.jit(step)(arr))[None])[0]
    assert got == sum(vals) % p


def test_witness_maps_sharded_match_local(mesh, rng):
    """Witness layer maps under the ambient mesh (row-sharded SPMD) produce
    bit-identical arrays to the single-device maps (VERDICT r3 task 5;
    reference rayon parallelism vecvec.rs:514-529, dense.rs:141-184)."""
    from gkr_msm_tpu.models.gkr import algfn_map, algfn_map_split, LO
    from gkr_msm_tpu.ops.poly.rect import RectPoly, rect_map, rect_map_split
    from gkr_msm_tpu.parallel import context as pctx

    fn = bs.PROJ_L1
    # dense maps: 2^7 rows over 8 devices
    polys = [mle.random_poly(FR, rng, 7) for _ in range(fn.n_ins)]
    ref = [np.asarray(o) for o in algfn_map(polys, fn)]
    ref_split = [np.asarray(o) for o in algfn_map_split(polys, fn, LO(0), 3)]
    with pctx.use_mesh(mesh):
        got = algfn_map(polys, fn)
        got_split = algfn_map_split(polys, fn, LO(0), 3)
    assert all(np.array_equal(r, np.asarray(g)) for r, g in zip(ref, got))
    assert all(
        np.array_equal(r, np.asarray(g)) for r, g in zip(ref_split, got_split)
    )

    # rect maps: 16 bucket rows over 8 devices
    rows = [
        [rng.randrange(FR.modulus) for _ in range(rng.randrange(1, 8))]
        for _ in range(13)
    ]
    rect = [
        RectPoly.from_rows(FR, rows, rp, cp, row_logsize=5, col_logsize=4)
        for rp, cp in ((0, 0), (1, 1), (1, 0), (0, 0), (1, 1), (1, 0))
    ]
    ref_r = [np.asarray(o.data) for o in rect_map(rect, fn)]
    ref_rs = [np.asarray(o.data) for o in rect_map_split(rect, fn, 3)]
    with pctx.use_mesh(mesh):
        got_r = rect_map(rect, fn)
        got_rs = rect_map_split(rect, fn, 3)
    assert all(np.array_equal(r, np.asarray(g.data)) for r, g in zip(ref_r, got_r))
    assert all(
        np.array_equal(r, np.asarray(g.data)) for r, g in zip(ref_rs, got_rs)
    )


def test_sharded_logup_mainphase_transcript_identical():
    """Logup mainphase under the ambient mesh == single-device proof bytes
    (VERDICT r4 missing #6: shard the logup mainphase)."""
    import random

    import jax.numpy as jnp

    from gkr_msm_tpu.models.logup import LogupMainphase
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.parallel import context as pctx
    from gkr_msm_tpu.parallel.sharded import make_mesh
    from gkr_msm_tpu.utils.transcript import Transcript

    P = FR.modulus
    rng = random.Random(0x10C)
    logsizes = [6, 6, 5, 4]
    inputs = []
    total = 0
    for ls in logsizes:
        quot = [rng.randrange(P) for _ in range(1 << ls)]
        den = [rng.randrange(1, P) for _ in range(1 << ls)]
        num = [q * d % P for q, d in zip(quot, den)]
        total = (total + sum(quot)) % P
        inputs.append(
            (jnp.asarray(fl.encode_ints(FR, num)), jnp.asarray(fl.encode_ints(FR, den)))
        )

    proto = LogupMainphase(logsizes)
    tr_ref = Transcript(b"logup-mesh")
    claims_ref, _ = proto.prove(tr_ref, total, inputs)
    proof_ref = tr_ref.end()

    mesh = make_mesh()
    with pctx.use_mesh(mesh):
        tr = Transcript(b"logup-mesh")
        claims, _ = proto.prove(tr, total, inputs)
        proof = tr.end()
    assert proof == proof_ref, "mesh logup transcript != single-device"
    assert [c.evs for c in claims] == [c.evs for c in claims_ref]

    tv = Transcript(b"logup-mesh", proof=proof)
    vclaims = proto.verify(tv, total)
    tv.assert_end()
    assert claims == vclaims
