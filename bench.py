"""Benchmark: standalone eq-weighted deg-2 sumcheck prover throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The workload is the 2^BENCH_LOGSIZE (default 2^20) dense deg-2 eq sumcheck
over the twisted-Edwards L1 layer — the hot loop of every GKR layer in the
Pippenger prover (BASELINE.md: "sumcheck rounds/sec at 2^20").
vs_baseline is reported against the driver north-star of matching the
reference CPU prover; the reference publishes no numbers (BASELINE.md), so
the recorded reference value is 1.0 (parity target).
"""
from __future__ import annotations

import json
import os
import random
import sys
import time


def main():
    platform = os.environ.get("GKR_MSM_PLATFORM")
    if platform:  # axon sitecustomize re-pins the platform; env alone is moot
        import jax

        jax.config.update("jax_platforms", platform)
    logsize = int(os.environ.get("BENCH_LOGSIZE", "20"))
    try:
        value, unit = run_sumcheck_bench(logsize)
    except Exception as e:  # noqa: BLE001 - report a diagnosable failure line
        print(json.dumps({
            "metric": f"sumcheck_rounds_per_sec_2^{logsize}",
            "value": 0.0,
            "unit": "rounds/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        return 1
    print(json.dumps({
        "metric": f"sumcheck_rounds_per_sec_2^{logsize}",
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(value, 3),
    }))
    return 0


def run_sumcheck_bench(logsize: int):
    import jax

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
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(0xBE7C)
    fn = bs.PROJ_L2  # 4 inputs, 4 outputs, deg 2
    num_vars = logsize
    polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]

    # claims: computed with the same device kernels (cheap single pass)
    eq = mle.eq_table(FR, point)
    outs = apply_fn(fn, polys)
    evs = [
        fl.decode_ints(FR, mle.field_sum(FR, fl.mul(FR, o, eq)))[0] for o in outs
    ]
    claims = SinglePointClaims(point=point, evs=evs)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    # warmup run compiles every round shape
    tr = Transcript(b"bench-warmup")
    proto.prove(tr, claims, polys)

    t0 = time.perf_counter()
    tr = Transcript(b"bench")
    proto.prove(tr, claims, polys)
    dt = time.perf_counter() - t0
    return num_vars / dt, "rounds/s"


if __name__ == "__main__":
    sys.exit(main())
