"""GKR composition: SimpleGKR driver, SplitAt / GlueSplit / ZeroCheck layers.

TPU-native re-design of the reference's cleanup GKR plumbing
(/root/reference/src/cleanup/protocols/gkrs/gkr.rs:10-58,
splits.rs:12-202, zero_check.rs:18-34).  A GKR here is a plain Python list
of layer objects; ``prove`` walks the layers in REVERSE order zipped with
the witness advice list consumed from the end (gkr.rs:45-50), threading
``SinglePointClaims`` — claims are O(1) host scalars, layer tables are
device limb arrays.

Variable indexing (splits.rs:12-50): a point is MSB-first; ``SplitIdx``
addresses a variable either from the low end (``lo``) or high end (``hi``).
Splitting a table of 2^k entries at LO(j) de-interleaves sectors of size
2^j; the claims transform folds paired evals with one challenge and inserts
it into the point at the matching position.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from ..ops.poly.algfn import AlgFn, apply_fn
from ..utils.transcript import Transcript
from .sumcheck import SUMCHECK_CHALLENGE_BITS, SinglePointClaims


@dataclasses.dataclass(frozen=True)
class SplitIdx:
    """Variable index from the low ('lo') or high ('hi') end (splits.rs:12)."""

    kind: str  # 'lo' | 'hi'
    idx: int

    def lo_usize(self, num_vars: int) -> int:
        return self.idx if self.kind == "lo" else num_vars - 1 - self.idx

    def hi_usize(self, num_vars: int) -> int:
        return self.idx if self.kind == "hi" else num_vars - 1 - self.idx


def LO(i: int) -> SplitIdx:
    return SplitIdx("lo", i)


def HI(i: int) -> SplitIdx:
    return SplitIdx("hi", i)


# -----------------------------------------------------------------------------
# dense map / map-split witness helpers (dense.rs:115-183)
# -----------------------------------------------------------------------------

def _mesh_place_tables(polys: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Under an ambient mesh, shard the hypercube axis so witness layer maps
    run SPMD across devices (the reference rayon-parallelizes every witness
    map, dense.rs:141-184; elementwise maps need no collectives — XLA just
    executes each shard locally)."""
    from ..parallel import context as _pctx

    polys = list(polys)
    mesh = _pctx.get_mesh()
    if mesh is None or not _pctx.shardable(int(polys[0].shape[0]), mesh):
        return polys
    from ..parallel.sharded import shard_table

    return [shard_table(mesh, p) for p in polys]


def algfn_map(polys: Sequence[jnp.ndarray], fn: AlgFn) -> List[jnp.ndarray]:
    """Columnwise AlgFn application — one fused XLA computation (sharded
    over the ambient mesh when divisible)."""
    return apply_fn(fn, _mesh_place_tables(polys))


def split_poly(poly: jnp.ndarray, var_idx: SplitIdx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """De-interleave sectors of size 2^lo: (even sectors, odd sectors)."""
    n = poly.shape[0]
    num_vars = n.bit_length() - 1
    seg = 1 << var_idx.lo_usize(num_vars)
    r = poly.reshape(n // (2 * seg), 2, seg, *poly.shape[1:])
    half = n // 2
    return (
        r[:, 0].reshape(half, *poly.shape[1:]),
        r[:, 1].reshape(half, *poly.shape[1:]),
    )


def unsplit_poly(left: jnp.ndarray, right: jnp.ndarray, var_idx: SplitIdx) -> jnp.ndarray:
    """Inverse of split_poly (used by witness checks)."""
    half = left.shape[0]
    num_vars = (2 * half).bit_length() - 1
    seg = 1 << var_idx.lo_usize(num_vars)
    l = left.reshape(half // seg, 1, seg, *left.shape[1:])
    r = right.reshape(half // seg, 1, seg, *right.shape[1:])
    return jnp.concatenate([l, r], axis=1).reshape(2 * half, *left.shape[1:])


def algfn_map_split(
    polys: Sequence[jnp.ndarray],
    fn: AlgFn,
    var_idx: SplitIdx,
    bundle_size: int,
) -> List[jnp.ndarray]:
    """Apply fn, split every output at var_idx, arrange interleaved bundles:
    [l_bundle0, r_bundle0, l_bundle1, r_bundle1, ...] (dense.rs:115-139)."""
    outs = apply_fn(fn, _mesh_place_tables(polys))
    ls, rs = zip(*(split_poly(o, var_idx) for o in outs))
    result: List[jnp.ndarray] = []
    for b in range(0, len(outs), bundle_size):
        result.extend(ls[b : b + bundle_size])
        result.extend(rs[b : b + bundle_size])
    return result


# -----------------------------------------------------------------------------
# claim-transform layers
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class SplitAt:
    """Virtual split layer: fold paired evals with one challenge
    (splits.rs:121-148).  Same logic proves and verifies."""

    var_idx: SplitIdx
    bundle_size: int
    p: int  # field modulus

    def _run(self, tr: Transcript, claims: SinglePointClaims) -> SinglePointClaims:
        r = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        evs = claims.evs
        chunks = [
            evs[i : i + self.bundle_size]
            for i in range(0, len(evs), self.bundle_size)
        ]
        evs_l = [x for c in chunks[0::2] for x in c]
        evs_r = [y for c in chunks[1::2] for y in c]
        evs_new = [(x + r * (y - x)) % self.p for x, y in zip(evs_l, evs_r)]
        point = list(claims.point)
        pos = (
            len(point) - self.var_idx.idx
            if self.var_idx.kind == "lo"
            else self.var_idx.idx
        )
        point.insert(pos, r)
        return SinglePointClaims(point=point, evs=evs_new)

    def prove_layer(self, tr, claims, advice=None):
        return self._run(tr, claims)

    def verify_layer(self, tr, claims):
        return self._run(tr, claims)


@dataclasses.dataclass
class GlueSplit:
    """Re-glue (x,y|x,y|1) -> 3 polys claim transform (splits.rs:161-202)."""

    p: int

    @staticmethod
    def witness(polys) -> list:
        """[p0, p1, d] -> [p0_e, p1_e, p0_o, p1_o, d_e, d_o] (splits.rs:172).

        Dispatches on dense arrays vs RectPolys (the reference operates on
        VecVecPolynomial, splits.rs:172-177)."""
        from ..ops.poly.algfn import id_algfn
        from ..ops.poly.rect import RectPoly, rect_map_split

        if isinstance(polys[0], RectPoly):
            out = rect_map_split(polys[0:2], id_algfn(2), 2)
            out.extend(rect_map_split(polys[2:3], id_algfn(1), 1))
            return out
        out = algfn_map_split(polys[0:2], id_algfn(2), LO(0), 2)
        out.extend(algfn_map_split(polys[2:3], id_algfn(1), LO(0), 1))
        return out

    def _run(self, tr: Transcript, claims: SinglePointClaims) -> SinglePointClaims:
        r = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        e = claims.evs
        assert len(e) == 6
        evs_new = [
            (e[0] + r * (e[2] - e[0])) % self.p,
            (e[1] + r * (e[3] - e[1])) % self.p,
            (e[4] + r * (e[5] - e[4])) % self.p,
        ]
        point = list(claims.point) + [r]
        return SinglePointClaims(point=point, evs=evs_new)

    def prove_layer(self, tr, claims, advice=None):
        return self._run(tr, claims)

    def verify_layer(self, tr, claims):
        return self._run(tr, claims)


@dataclasses.dataclass
class ZeroCheck:
    """Append two zero evals (for identically-zero bitcheck outputs)
    (zero_check.rs:18-34)."""

    def prove_layer(self, tr, claims, advice=None):
        return SinglePointClaims(point=list(claims.point), evs=list(claims.evs) + [0, 0])

    def verify_layer(self, tr, claims):
        return self.prove_layer(tr, claims)


# -----------------------------------------------------------------------------
# the GKR driver
# -----------------------------------------------------------------------------

def gkr_prove(
    tr: Transcript,
    layers: Sequence,
    claims: SinglePointClaims,
    advices: Sequence,
) -> SinglePointClaims:
    """Iterate layers in reverse zipped with advices consumed from the end
    (gkr.rs:45-50): layers[-1] gets advices[-1]."""
    assert len(layers) == len(advices), (len(layers), len(advices))
    from ..utils.tracing import span

    for layer, advice in zip(reversed(list(layers)), reversed(list(advices))):
        nv = getattr(layer, "num_vars", None)
        label = type(layer).__name__ + (f"[{nv}v]" if nv is not None else "")
        with span(f"layer {label}"):
            claims = layer.prove_layer(tr, claims, advice)
    return claims


def gkr_verify(tr: Transcript, layers: Sequence, claims: SinglePointClaims) -> SinglePointClaims:
    for layer in reversed(list(layers)):
        claims = layer.verify_layer(tr, claims)
    return claims
