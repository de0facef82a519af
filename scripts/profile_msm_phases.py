"""Phase-level timing of the packed MSM at a given size on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gkr_msm_tpu.ops.field.spec import FQ, FR
from gkr_msm_tpu.ops.msm import pippenger as msm
from gkr_msm_tpu.ops.pallas import curve_kernels as ck

LOGN = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main():
    n = 1 << LOGN
    c = 8
    n_buckets = 256
    rng = np.random.default_rng(5)
    # synthetic packed table (validity all 1) — timing only
    arr = rng.integers(0, 2**32, (n + 1, 25), dtype=np.uint32)
    arr[:, 24] = 1
    arr[n, 24] = 0
    bases = msm.PackedAffineBases.__new__(msm.PackedAffineBases)
    bases.n = n
    bases._np = arr
    import torch

    bases._torch = torch.from_numpy(arr.view(np.int32))

    sc = [int(x) | (int(y) << 63) for x, y in zip(
        rng.integers(0, 2**63, size=(n,)), rng.integers(0, 2**63, size=(n,)))]
    limbs = msm.scalars_ints_to_limbs(sc)
    digits = msm.scalars_to_digit_matrix(limbs, c, 128)
    n_windows = digits.shape[0]
    max_c = max(1, int(max(np.bincount(digits[w], minlength=n_buckets).max()
                           for w in range(n_windows))))
    capacity = msm.grid_capacity(max_c)
    spec = FQ
    print(f"2^{LOGN}: windows={n_windows} capacity={capacity}", flush=True)

    # warm up compiles via one full window + combine
    grid, _ = msm.bucket_index_grid(digits[0], n_buckets, n, capacity)
    idx = grid.T.reshape(-1)
    g = bases.gather(idx)
    pt = msm._transpose_dev(spec, jnp.asarray(g))
    wb = ck.fold_affine_t(spec, pt, n_buckets)
    jax.block_until_ready(wb)
    t0 = time.perf_counter()
    out = msm._combine_windows_t(spec, [wb] * n_windows, c, "g1")
    jax.block_until_ready(out)
    print(f"combine compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)

    # host phases
    t0 = time.perf_counter()
    grids = []
    for w in range(n_windows):
        grid, _ = msm.bucket_index_grid(digits[w], n_buckets, n, capacity)
        grids.append(grid.T.reshape(-1))
    t1 = time.perf_counter()
    print(f"host sort x{n_windows}: {t1-t0:.2f}s", flush=True)
    gs = [bases.gather(ix) for ix in grids]
    t2 = time.perf_counter()
    print(f"host gather x{n_windows}: {t2-t1:.2f}s", flush=True)

    # device phases
    uploads = [jnp.asarray(x) for x in gs]
    jax.block_until_ready(uploads)
    t3 = time.perf_counter()
    print(f"upload x{n_windows}: {t3-t2:.2f}s", flush=True)
    pts = [msm._transpose_dev(spec, u) for u in uploads]
    jax.block_until_ready(pts)
    t4 = time.perf_counter()
    print(f"transpose x{n_windows}: {t4-t3:.2f}s", flush=True)
    wbs = [ck.fold_affine_t(spec, p, n_buckets) for p in pts]
    jax.block_until_ready(wbs)
    t5 = time.perf_counter()
    print(f"fold x{n_windows}: {t5-t4:.2f}s "
          f"({(t5-t4)/n_windows*1e3:.0f} ms/window, K={capacity})", flush=True)
    out = msm._combine_windows_t(spec, wbs, c, "g1")
    jax.block_until_ready(out)
    t6 = time.perf_counter()
    print(f"combine: {t6-t5:.2f}s", flush=True)
    print(f"total devices phases: {t6-t2:.2f}s; points/s incl host "
          f"{n/(t6-t0):,.0f}", flush=True)


if __name__ == "__main__":
    main()
