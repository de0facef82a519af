"""Criterion-equivalent scaling-grid benchmark (VERDICT r3 missing #4).

The reference sweeps criterion grids (benches/pippenger.rs:40-72: num_vars
10..16 x d_logsize 2..10 x clm 1..3; benches/sumcheck.rs; benches/
polynomial.rs).  This script records the TPU equivalents as ONE JSON
artifact with scaling curves:

  * sumcheck rounds/s at num_vars in {14, 16, 18, 20}   (hot GKR loop)
  * MSM points/s at 2^{14, 16, 18, 20}, signed + unsigned
  * pippenger e2e prove at (x, d) in {(10,4), (12,6)}   (--e2e flag)

Usage:   python scripts/bench_grid.py [--e2e] [--out artifacts/bench_grid.json]
Each measurement runs in-process (shared compile cache); timings are
steady-state (one warmup, one measured run).
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.environ.setdefault("GKR_MSM_JAX_CACHE", os.path.join(repo, ".jax_cache"))

platform = os.environ.get("GKR_MSM_PLATFORM")
import jax  # noqa: E402

if platform:
    jax.config.update("jax_platforms", platform)

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(repo, "artifacts", "bench_grid.json"))
    ap.add_argument("--e2e", action="store_true", help="include pippenger e2e points")
    ap.add_argument("--sumcheck-sizes", default="14,16,18,20")
    ap.add_argument("--msm-sizes", default="14,16,18,20")
    args = ap.parse_args(argv)

    from gkr_msm_tpu.commitments.kzg import fixed_base_batch
    from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck, claims_for_map
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.curve import bls12381 as g1
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.ops.msm import pippenger as msm
    from gkr_msm_tpu.ops.poly import mle
    from gkr_msm_tpu.utils.transcript import Transcript

    t_all = time.perf_counter()
    points: list = []

    def record(metric, value, unit, **config):
        points.append(
            {"metric": metric, "value": round(value, 2), "unit": unit, **config}
        )
        print(
            f"[{time.perf_counter()-t_all:7.1f}s] {metric} {config}: "
            f"{value:.2f} {unit}",
            flush=True,
        )

    # ---- sumcheck scaling curve (benches/sumcheck.rs analog) ----------------
    rng = random.Random(0xBE7C)
    nprng = np.random.default_rng(0xBE7C)
    fn = bs.PROJ_L2
    for nv in [int(s) for s in args.sumcheck_sizes.split(",") if s]:
        polys = [mle.random_poly_fast(FR, nprng, nv) for _ in range(fn.n_ins)]
        point = [rng.randrange(FR.modulus) for _ in range(nv)]
        claims = claims_for_map(FR, fn, polys, point)
        proto = DenseDeg2Sumcheck(fn=fn, num_vars=nv)
        tw = time.perf_counter()
        proto.prove(Transcript(b"grid-warm"), claims, polys)
        warm_s = time.perf_counter() - tw
        t0 = time.perf_counter()
        proto.prove(Transcript(b"grid"), claims, polys)
        dt = time.perf_counter() - t0
        record(
            "sumcheck_rounds_per_sec", nv / dt, "rounds/s",
            num_vars=nv, warmup_s=round(warm_s, 1),
        )

    # ---- MSM scaling curve (benches/pippenger.rs grid analog) ---------------
    nbits = 128
    for ls in [int(s) for s in args.msm_sizes.split(",") if s]:
        n = 1 << ls
        base = g1.Host.random_point(rng)
        ks = [rng.randrange(1, FR.modulus) for _ in range(n)]
        pts = fixed_base_batch(base, ks)
        pts.block_until_ready()
        scalars = np.asarray(
            msm.scalars_ints_to_limbs([rng.randrange(1 << nbits) for _ in range(n)])
        )
        for signed in (False, True):
            out = msm.msm_device(pts, scalars, n_bits=nbits, signed=signed)
            out.block_until_ready()  # warm
            t0 = time.perf_counter()
            out = msm.msm_device(pts, scalars, n_bits=nbits, signed=signed)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            record(
                "msm_points_per_sec", n / dt, "points/s",
                logsize=ls, nbits=nbits, signed=signed,
            )

    # ---- pippenger e2e (examples/pippenger.rs grid analog) ------------------
    if args.e2e:
        from gkr_msm_tpu.models.pippenger import (
            build_pippenger_data,
            run_pippenger,
            verify_pippenger,
        )

        for x, d in ((10, 4), (12, 6)):
            data = build_pippenger_data(random.Random(17), d, x, 128, 0)
            t0 = time.perf_counter()
            tr = Transcript(b"grid-e2e")
            out = run_pippenger(tr, data)
            proof = tr.end()
            dt = time.perf_counter() - t0
            tv = Transcript(b"grid-e2e", proof=proof)
            verify_pippenger(tv, data.config, out)
            tv.assert_end()
            record(
                "pippenger_prove_s", dt, "s",
                x_logsize=x, d_logsize=d, nbits=128, proof_bytes=len(proof),
            )

    result = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "total_s": round(time.perf_counter() - t_all, 1),
        "points": points,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"artifact: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
