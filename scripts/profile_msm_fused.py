"""Validate + profile the fused-kernel MSM path on the real TPU.

Usage: python scripts/profile_msm_fused.py [logn ...]
Correctness at small N vs the host integer model, then throughput.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from gkr_msm_tpu.ops.curve import bls12381 as g1
from gkr_msm_tpu.ops.msm import pippenger as msm
from gkr_msm_tpu.ops.field.spec import FR


def main():
    logns = [int(a) for a in sys.argv[1:]] or [9, 16]
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(7)

    # --- correctness at small N ---
    n_small = 512
    gen = g1.Host.gen
    ks = [int(x) for x in rng.integers(1, 2**30, n_small)]
    pts_aff = [g1.Host.scalar_mul(k, gen) for k in ks]
    scalars = [int(x) for x in rng.integers(0, 2**63, n_small)]
    pts_dev = msm.encode_points_device(pts_aff)
    limbs = msm.scalars_ints_to_limbs(scalars)
    t0 = time.time()
    out = msm.msm_host_result(pts_dev, limbs, n_bits=64)
    t1 = time.time()
    exp_scalar = sum(k * s for k, s in zip(ks, scalars)) % FR.modulus
    exp = g1.Host.scalar_mul(exp_scalar, gen)
    ok = out == exp
    print(f"correctness N={n_small} 64-bit: {'OK' if ok else 'FAIL'} ({t1-t0:.1f}s incl compile)", flush=True)
    if not ok:
        print("  got:", out)
        print("  exp:", exp)
        sys.exit(1)

    # --- packed-affine fast path: correctness vs the device path ---
    bases = msm.PackedAffineBases(pts_aff)
    outp = msm.msm_packed(bases, limbs, n_bits=64)
    got = g1.decode_proj(np.asarray(outp)[None])[0]
    print(f"msm_packed N={n_small}: {'OK' if got == exp else 'FAIL'}", flush=True)
    if got != exp:
        sys.exit(1)

    # --- throughput (packed path, 128-bit scalars: canonical config) ---
    for logn in logns:
        n = 1 << logn
        reps = (n + n_small - 1) // n_small
        big_aff = (pts_aff * reps)[:n]
        bases_b = msm.PackedAffineBases(big_aff)
        sc = [int(x) | (int(y) << 63) for x, y in zip(
            rng.integers(0, 2**63, size=(n,)), rng.integers(0, 2**63, size=(n,)))]
        limbs_b = msm.scalars_ints_to_limbs(sc)
        t0 = time.time()
        r = msm.msm_packed(bases_b, limbs_b, n_bits=128)
        jax.block_until_ready(r)
        t1 = time.time()
        r = msm.msm_packed(bases_b, limbs_b, n_bits=128)
        jax.block_until_ready(r)
        t2 = time.time()
        print(
            f"packed 2^{logn}: first={t1-t0:.2f}s warm={t2-t1:.2f}s "
            f"-> {n/(t2-t1):,.0f} points/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
