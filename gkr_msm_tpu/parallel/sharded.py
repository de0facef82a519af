"""Multi-chip sharding of the sumcheck/MSM table plane.

The reference is shared-memory rayon only (SURVEY.md §2.12); the TPU-native
scaling axis is a 1-D device mesh over the hypercube-index (point) axis:

  * sumcheck tables shard on the leading axis in contiguous blocks (pairs
    for the LSB bind stay shard-local because block sizes are even);
  * each round a shard computes its partial eq-weighted sums locally and a
    `psum` over the mesh combines the (2, n_outs) round scalars — the
    per-round collective payload is O(deg) field elements (SURVEY.md §5);
  * binds are purely local (table halves in place);
  * once the live table is small (< one shard), gather to replicated and
    continue single-device — the reference's sparse->dense switchover
    (vecvec_eq.rs:227-250) reinterpreted as shard->replicated.

MSM bucket grids shard the same way on the bucket axis with a final psum
of window sums.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..ops.field import limbs as fl
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly.algfn import AlgFn

AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=(AXIS,))


def shard_table(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Place a (N, ...) table with the leading axis sharded over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, PSpec(AXIS)))


def replicate(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(arr, NamedSharding(mesh, PSpec()))


def _local_round_sums(spec: FieldSpec, fn: AlgFn, polys, eq_tbl):
    odds = [p[1::2] for p in polys]
    evens = [p[0::2] for p in polys]
    at2 = [fl.sub(spec, fl.add(spec, o, o), e) for o, e in zip(odds, evens)]
    sums = []
    for vals in (odds, at2):
        outs = fn(vals)
        per = []
        for o in outs:
            w = fl.mul(spec, o, eq_tbl)
            m = w.shape[0]
            while m > 1:
                w = fl.add(spec, w[0::2], w[1::2])
                m //= 2
            per.append(w[0])
        sums.append(jnp.stack(per))
    return jnp.stack(sums)  # (2, n_outs, L)


def _psum_field(spec: FieldSpec, x: jnp.ndarray, axis_name: str, n_devices: int):
    """Modular reduction of a cross-device sum of field elements.

    Limbs are < 2^16, so a psum over <= 2^10 devices keeps columns < 2^26.
    The summed value is < n_devices * p: carry-ripple to n+1 limbs, then
    n_devices-1 conditional subtractions of p restore canonical form.
    """
    cols = jax.lax.psum(x, axis_name)
    v = fl.carry_ripple(cols, spec.n_limbs + 1)
    p_ext = jnp.concatenate(
        [
            jnp.asarray(np.asarray(spec.p_limbs), dtype=jnp.uint32),
            jnp.zeros((1,), dtype=jnp.uint32),
        ]
    )
    p_ext = jnp.broadcast_to(p_ext, v.shape)
    for _ in range(max(1, n_devices - 1)):
        d, borrow = fl._sub_limbs(v, p_ext)
        v = jnp.where((borrow == 0)[..., None], d, v)
    return v[..., : spec.n_limbs]


def sharded_round_step(
    mesh: Mesh,
    spec: FieldSpec,
    fn: AlgFn,
    polys: Sequence[jnp.ndarray],
    eq_tbl: jnp.ndarray,
    t: jnp.ndarray,
):
    """One sumcheck round on a sharded table: psum'd round sums + local bind.

    polys: (N, L) sharded on axis 0; eq_tbl: (N/2, L) sharded; t: (L,)
    replicated bind challenge.  Returns (sums (2, n_outs, L) replicated,
    bound polys (N/2, L) sharded).
    """
    n_dev = mesh.devices.size

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            tuple(PSpec(AXIS) for _ in polys),
            PSpec(AXIS),
            PSpec(),
        ),
        out_specs=(PSpec(), tuple(PSpec(AXIS) for _ in polys)),
    )
    def step(polys_l, eq_l, t_l):
        sums_local = _local_round_sums(spec, fn, list(polys_l), eq_l)
        sums = _psum_field(spec, sums_local, AXIS, n_dev)
        bound = tuple(
            fl.add(
                spec,
                p[0::2],
                fl.mul(spec, t_l[None], fl.sub(spec, p[1::2], p[0::2])),
            )
            for p in polys_l
        )
        return sums, bound

    return jax.jit(step)(tuple(polys), eq_tbl, t)


def sharded_msm_window(
    mesh: Mesh, grid_points: jnp.ndarray, c: int
) -> jnp.ndarray:
    """Bucket-sharded MSM window: tree-reduce capacity locally, psum-free
    (buckets are disjoint across shards), then the running-sum combination
    on replicated bucket sums."""
    from ..ops.curve import bls12381 as g1
    from ..ops.msm.pippenger import _bucket_reduce_and_combine

    grid = shard_table(mesh, grid_points)
    return _bucket_reduce_and_combine(grid, c)
