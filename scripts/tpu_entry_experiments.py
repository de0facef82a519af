"""Entry-conversion experiments on the TPU.

1. Which part of to_halves_bitrev costs: strided evens slice, row gathers,
   final limb-major transpose.
2. Can Mosaic transpose a (block, 16) u32 tile to (16, block) in-VMEM?
   If yes, the whole entry relayout collapses to row gathers.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "GKR_MSM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gkr_msm_tpu.ops.pallas import sumcheck_kernels as sk

LOG = 20
M = 1 << LOG
L = 16


def timeit(label, f, iters=6):
    try:
        r = f()
        jax.block_until_ready(r)
    except Exception as e:  # noqa: BLE001
        print(f"{label:40s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:40s} {dt*1e3:9.3f} ms", flush=True)
    return dt


@jax.jit
def evens_only(x):
    return x[0::2]


@jax.jit
def gathers_only(x):
    e = x[0::2]
    m2, _ = e.shape
    k = (m2 - 1).bit_length()
    a = k // 2
    b = k - a
    ra = jnp.asarray(sk._bitrev_perm(a))
    rb = jnp.asarray(sk._bitrev_perm(b))
    z = e.reshape(1 << a, 1 << b, L)[ra]
    w = z.transpose(1, 0, 2)[rb]
    return w.reshape(m2, L)  # natural-minor, no limb-major transpose


@jax.jit
def full_chain(x):
    return sk._bitrev_rows_t(x[0::2])


@jax.jit
def plain_transpose(x):
    return x[0::2].T


def pallas_tile_transpose(x2d):
    """(m, L) -> (L, m) via per-block in-VMEM transposes."""
    m = x2d.shape[0]
    block = 512

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:].T

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, m), jnp.uint32),
        grid=(m // block,),
        in_specs=[pl.BlockSpec((block, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, block), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(x2d)


def pallas_rowgather(z3d, a, b):
    """stage-1: out[i] = z3d[rev_a(i)] as a pallas copy with index-map bitrev."""

    def rev(i):
        r = jnp.zeros_like(i)
        for bit in range(a):
            r = r | (((i >> bit) & 1) << (a - 1 - bit))
        return r

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(z3d.shape, jnp.uint32),
        grid=(1 << a,),
        in_specs=[
            pl.BlockSpec(
                (1, 1 << b, L), lambda i: (rev(i), 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1 << b, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(z3d)


def main():
    print(f"backend={jax.default_backend()}  M=2^{LOG}", flush=True)
    nprng = np.random.default_rng(2)
    x = jnp.asarray(nprng.integers(0, 1 << 16, (M, L)).astype(np.uint32))
    jax.block_until_ready(x)

    timeit("evens strided slice", lambda: evens_only(x))
    timeit("evens + 2 row-gathers (no .T)", lambda: gathers_only(x))
    timeit("full to_halves chain (1 half)", lambda: full_chain(x))
    timeit("plain (m,L)->(L,m) transpose", lambda: plain_transpose(x))

    x2d = x[0::2]
    jax.block_until_ready(x2d)
    t = timeit("pallas tile transpose (m,L)->(L,m)", lambda: pallas_tile_transpose(x2d))
    if t is not None:
        ref = np.asarray(x2d).T
        got = np.asarray(pallas_tile_transpose(x2d))
        print("  tile transpose correct:", np.array_equal(ref, got), flush=True)

    a = (LOG - 1) // 2
    b = (LOG - 1) - a
    z3 = x2d.reshape(1 << a, 1 << b, L)
    t = timeit("pallas bitrev row-gather (stage1)", lambda: pallas_rowgather(z3, a, b))
    if t is not None:
        ra = sk._bitrev_perm(a)
        ref = np.asarray(z3)[ra]
        got = np.asarray(pallas_rowgather(z3, a, b))
        print("  rowgather correct:", np.array_equal(ref, got), flush=True)


if __name__ == "__main__":
    main()
