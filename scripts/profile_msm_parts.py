"""Profile MSM pipeline pieces on TPU: gather variants + fold kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gkr_msm_tpu.ops.field.spec import FQ
from gkr_msm_tpu.ops.pallas import curve_kernels as ck

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def timeit(name, fn, reps=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    n = 1 << LOGN
    rows = 3 * FQ.n_limbs
    n_buckets = 256
    capacity = ((n // n_buckets + 7) // 8 * 8) + 8
    M = capacity * n_buckets
    rng = np.random.default_rng(0)
    pts_t = jnp.asarray(rng.integers(0, 2**16, (rows, n + 1), dtype=np.uint32))
    pts_nat = jnp.asarray(rng.integers(0, 2**16, (n + 1, rows), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (M,), dtype=np.int32))

    print(f"2^{LOGN}: capacity={capacity} M={M}", flush=True)

    lane_gather = jax.jit(lambda: jnp.take(pts_t, idx, axis=1))
    timeit("lane gather (72,N) take axis=1", lane_gather)

    row_gather = jax.jit(lambda: jnp.take(pts_nat, idx, axis=0))
    timeit("row gather (N,72) take axis=0", row_gather)

    row_gather_t = jax.jit(lambda: jnp.take(pts_nat, idx, axis=0).T)
    timeit("row gather + transpose -> (72,M)", row_gather_t)

    x = jnp.asarray(rng.integers(0, 2**16, (rows, M), dtype=np.uint32))
    fold = jax.jit(lambda: ck.fold_t(FQ, x, n_buckets, "g1"))
    t0 = time.perf_counter()
    jax.block_until_ready(fold())
    print(f"fold compile+1st: {time.perf_counter()-t0:.1f} s", flush=True)
    dt = timeit(f"fold_t K={capacity} n_out=256", fold, reps=1)
    print(f"  -> {capacity/dt:.0f} grid-steps/s, {M/dt/1e6:.2f} M adds/s", flush=True)

    # single big add_t for comparison (one level of a halving tree)
    a = x[:, : M // 2]
    b = x[:, M // 2 :]
    addf = jax.jit(lambda: ck.add_t(FQ, a, b, "g1"))
    dt = timeit("add_t M/2 lanes", addf, reps=1)
    print(f"  -> {(M/2)/dt/1e6:.2f} M adds/s", flush=True)


if __name__ == "__main__":
    main()
