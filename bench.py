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
    import jax

    if platform:  # axon sitecustomize re-pins the platform; env alone is moot
        jax.config.update("jax_platforms", platform)
    # On TPU, the single-dispatch fused-prover program is expensive to compile
    # (once); default the persistent compilation cache on (repo-local) so the
    # compile is paid at most once per machine. XLA:CPU AOT cache loading is
    # unreliable (machine-feature mismatch -> SIGILL), so CPU stays opt-in.
    if "GKR_MSM_JAX_CACHE" not in os.environ:
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if backend != "cpu":
            os.environ["GKR_MSM_JAX_CACHE"] = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
            )
    logsize = int(os.environ.get("BENCH_LOGSIZE", "20"))
    try:
        value, unit, warmup_s = run_sumcheck_bench(logsize)
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
        "warmup_s": round(warmup_s, 1),
    }))
    return 0


def run_sumcheck_bench(logsize: int):
    import jax

    from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.ops.poly import mle
    from gkr_msm_tpu.utils.transcript import Transcript

    import numpy as np

    from gkr_msm_tpu.models.sumcheck import claims_for_map

    rng = random.Random(0xBE7C)
    nprng = np.random.default_rng(0xBE7C)
    fn = bs.PROJ_L2  # 4 inputs, 4 outputs, deg 2
    num_vars = logsize
    # vectorized host sampling + ONE jitted device pass for the claims: the
    # remote-TPU tunnel makes every extra compile minutes-expensive
    polys = [mle.random_poly_fast(FR, nprng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    claims = claims_for_map(FR, fn, polys, point)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    # warmup run compiles every round shape
    tw = time.perf_counter()
    tr = Transcript(b"bench-warmup")
    proto.prove(tr, claims, polys)
    warmup_s = time.perf_counter() - tw

    t0 = time.perf_counter()
    tr = Transcript(b"bench")
    proto.prove(tr, claims, polys)
    dt = time.perf_counter() - t0
    return num_vars / dt, "rounds/s", warmup_s


if __name__ == "__main__":
    sys.exit(main())
