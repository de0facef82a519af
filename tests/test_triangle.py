"""Triangle-add GKR tests (triangle_add.rs:277-393 patterns): witness
semantics (outputs recombine to sum_i i*P_i) and prover/verifier round-trip."""
import jax.numpy as jnp
import pytest

from gkr_msm_tpu.models import gkr, triangle
from gkr_msm_tpu.models.sumcheck import SinglePointClaims
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.ops.poly.algfn import id_algfn, repeated
from gkr_msm_tpu.utils.transcript import Transcript


def random_proj_inputs(rng, num_vars):
    """Random projective Bandersnatch points -> (3 dense polys, host points)."""
    pts = []
    xs, ys, zs = [], [], []
    for _ in range(1 << num_vars):
        a = bs.Host.random_point(rng)
        z = rng.randrange(1, FR.modulus)
        pts.append(a)
        xs.append(a[0] * z % FR.modulus)
        ys.append(a[1] * z % FR.modulus)
        zs.append(z)
    polys = [jnp.asarray(fl.encode_ints(FR, v)) for v in (xs, ys, zs)]
    return polys, pts


def scalar_mul_host(k, pt):
    return bs.Host.scalar_mul(k, pt)


@pytest.mark.parametrize("num_vars,hi", [(5, 2), (4, 1)])
def test_triangle_witness_and_roundtrip(rng, num_vars, hi):
    split = gkr.HI(hi)
    inputs, host_pts = random_proj_inputs(rng, num_vars)
    inputs = gkr.algfn_map_split(inputs, id_algfn(3), split, 3)
    inputs = gkr.algfn_map_split(inputs, repeated(id_algfn(3), 2), split, 3)

    proto_vars = num_vars - 2
    advices = triangle.witness_build(inputs, proto_vars, split)
    num_layers = proto_vars - split.hi_usize(proto_vars)
    out_polys = triangle.last_step(advices[-1], num_layers)
    assert len(out_polys) == 3 * (num_layers + 3)

    # --- witness semantics (triangle_add.rs:326-349) ---
    n_chunks = 1 << hi
    chunk = 1 << (num_vars - hi)
    out_pts = []
    for b in range(len(out_polys) // 3):
        coords = [fl.decode_ints(FR, out_polys[3 * b + c]) for c in range(3)]
        bundle = []
        for idx in range(len(coords[0])):
            x, y, z = coords[0][idx], coords[1][idx], coords[2][idx]
            bundle.append(
                bs.Host.normalize_proj((x, y, z)) if z != 0 else bs.Host.neutral()
            )
        out_pts.append(bundle)
    for idx in range(n_chunks):
        target = bs.Host.neutral()
        for i in range(chunk):
            target = bs.Host.add(
                target, scalar_mul_host(i, host_pts[idx * chunk + i])
            )
        got = bs.Host.neutral()
        coef = 1
        for i in range(1, len(out_pts)):
            got = bs.Host.add(got, scalar_mul_host(coef, out_pts[i][idx]))
            coef *= 2
        assert got == target

    # --- prove/verify round-trip ---
    point = [rng.randrange(FR.modulus) for _ in range(split.hi_usize(proto_vars))]
    evs = [mle.evaluate(FR, o, point) for o in out_polys]
    claims = SinglePointClaims(point=point, evs=evs)

    proto = triangle.TriangleAdd(proto_vars, split)
    tr = Transcript(b"triangle")
    out_claims = proto.prove(tr, claims, advices)
    proof = tr.end()

    tv = Transcript(b"triangle", proof=proof)
    ver_claims = proto.verify(tv, claims)
    tv.assert_end()
    assert out_claims == ver_claims

    for poly, ev in zip(inputs, ver_claims.evs):
        assert mle.evaluate(FR, poly, ver_claims.point) == ev
