"""Driver benchmark: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric: eq-weighted deg-2 sumcheck prover rounds/sec at 2^20 — the
hot loop of every GKR layer in the Pippenger prover (BASELINE.md: "sumcheck
rounds/sec at 2^20").  A second metric (MSM points/sec at 2^20, BASELINE's
first-listed number) rides in the "extra" field of the same line.

Robustness (rounds 1 and 3 recorded timeouts, VERDICT.md weak#1): the
parent process runs each measurement in a SUBPROCESS with its own timeout
under a global deadline (BENCH_DEADLINE, default 1350 s), falling back to
smaller workloads if the preferred one cannot finish in budget.  Something
valid is printed in every outcome.  The XLA compilation cache (.jax_cache)
IS COMMITTED to the repo (it was gitignored through round 3 — the root
cause of the zero records): with it warm, the full bench (sumcheck 2^20 +
MSM 2^20) measured 4m49s end-to-end on v5e this round, of which ~150-200 s
is Python tracing/lowering of the fused-prover program (not covered by the
XLA cache).  Cold compile is ~280 s per rung on top of that.

vs_baseline: the reference publishes no numbers (BASELINE.md) — the
recorded reference value is 1.0 (parity target), so vs_baseline == value.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


# -----------------------------------------------------------------------------
# parent orchestrator
# -----------------------------------------------------------------------------

def run_worker(kind: str, logsize: int, timeout_s: float):
    """Run one measurement in a subprocess; return its parsed JSON or None."""
    if timeout_s < 30:
        return None
    env = dict(os.environ)
    env.setdefault("GKR_MSM_JAX_CACHE", os.path.join(REPO, ".jax_cache"))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", kind,
             "--logsize", str(logsize)],
            capture_output=True, text=True, timeout=timeout_s, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> int:
    deadline = time.monotonic() + float(os.environ.get("BENCH_DEADLINE", "1350"))

    def remaining():
        return deadline - time.monotonic()

    logsize = int(os.environ.get("BENCH_LOGSIZE", "20"))
    # sumcheck ladder: preferred logsize, then progressively cheaper configs
    result = None
    attempts = []
    for ls in [logsize, max(logsize - 4, 10), max(logsize - 8, 10)]:
        if ls in attempts:
            continue
        attempts.append(ls)
        # leave room for at least one fallback + the final print
        budget = remaining() - (60 if len(attempts) < 3 else 10)
        result = run_worker("sumcheck", ls, min(budget, 1100))
        if result is not None:
            break

    extra = {}
    # MSM metric (BASELINE's first-listed): attempted with leftover budget
    for ls in [int(os.environ.get("BENCH_MSM_LOGSIZE", "20")), 16]:
        msm = run_worker("msm", ls, min(remaining() - 15, 700))
        if msm is not None:
            extra[msm["metric"]] = msm["value"]
            extra[msm["metric"] + "_unit"] = msm["unit"]
            break
    # signed-digit MSM (wNAF recoding): recorded so the at-scale signed
    # path has an official driver-visible number (VERDICT r4 weak#7)
    if remaining() > 120:
        msm_s = run_worker("msm_signed", ls, min(remaining() - 15, 600))
        if msm_s is not None and msm_s.get("unit") != "error":
            extra[msm_s["metric"]] = msm_s["value"]
            extra[msm_s["metric"] + "_unit"] = msm_s["unit"]

    if result is None:
        print(json.dumps({
            "metric": f"sumcheck_rounds_per_sec_2^{logsize}",
            "value": 0.0,
            "unit": "rounds/s",
            "vs_baseline": 0.0,
            "error": "all sumcheck workers timed out",
            "extra": extra,
        }))
        return 1
    out = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["value"],
    }
    if "warmup_s" in result:
        out["warmup_s"] = result["warmup_s"]
    if extra:
        out["extra"] = extra
    print(json.dumps(out))
    return 0


# -----------------------------------------------------------------------------
# workers (each runs in its own process: one JAX init, own timeout)
# -----------------------------------------------------------------------------

def _init_jax():
    platform = os.environ.get("GKR_MSM_PLATFORM")
    import jax

    if platform:  # axon sitecustomize re-pins the platform; env alone is moot
        jax.config.update("jax_platforms", platform)
    # Persistent compilation cache (repo-local, committed): the fused-prover
    # program costs ~260 s to compile cold on v5e — paid at most once per
    # machine.  XLA:CPU AOT cache loading is unreliable (machine-feature
    # mismatch -> SIGILL), so CPU stays opt-in.
    if "GKR_MSM_JAX_CACHE" not in os.environ:
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if backend != "cpu":
            os.environ["GKR_MSM_JAX_CACHE"] = os.path.join(REPO, ".jax_cache")
    return jax


def worker_sumcheck(logsize: int) -> int:
    """Deg-2 eq sumcheck prover throughput at 2^logsize (rounds/s)."""
    import random

    import numpy as np

    _init_jax()
    from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck, claims_for_map
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.ops.poly import mle
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(0xBE7C)
    nprng = np.random.default_rng(0xBE7C)
    fn = bs.PROJ_L2  # 4 inputs, 4 outputs, deg 2
    num_vars = logsize
    polys = [mle.random_poly_fast(FR, nprng, num_vars) for _ in range(fn.n_ins)]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    claims = claims_for_map(FR, fn, polys, point)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)

    tw = time.perf_counter()
    tr = Transcript(b"bench-warmup")
    proto.prove(tr, claims, polys)  # compiles every round shape
    warmup_s = time.perf_counter() - tw

    t0 = time.perf_counter()
    tr = Transcript(b"bench")
    proto.prove(tr, claims, polys)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"sumcheck_rounds_per_sec_2^{logsize}",
        "value": round(num_vars / dt, 3),
        "unit": "rounds/s",
        "warmup_s": round(warmup_s, 1),
    }))
    return 0


def worker_msm(logsize: int, signed: bool = False) -> int:
    """BLS12-381 G1 commitment-MSM throughput at 2^logsize points
    (reference harness: benches/pippenger.rs:40-72, msm_nonaffine.rs).
    signed=True measures the wNAF signed-digit recoding path."""
    import random

    import numpy as np

    jax = _init_jax()
    from gkr_msm_tpu.commitments.kzg import fixed_base_batch
    from gkr_msm_tpu.ops.curve import bls12381 as g1
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.ops.msm import pippenger as msm

    rng = random.Random(0x1137)
    n = 1 << logsize
    # random device bases k_i * G via fixed-base windowed batch (device)
    base = g1.Host.random_point(rng)
    ks = [rng.randrange(1, FR.modulus) for _ in range(n)]
    points = fixed_base_batch(base, ks)
    points.block_until_ready()
    nbits = 128  # canonical pippenger config scalar width (README.md:5)
    scalars = np.asarray(
        msm.scalars_ints_to_limbs([rng.randrange(1 << nbits) for _ in range(n)])
    )

    # warmup (compiles)
    out = msm.msm_device(points, scalars, n_bits=nbits, signed=signed)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = msm.msm_device(points, scalars, n_bits=nbits, signed=signed)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    tag = "_signed" if signed else ""
    print(json.dumps({
        "metric": f"msm{tag}_points_per_sec_2^{logsize}",
        "value": round(n / dt, 1),
        "unit": "points/s",
    }))
    return 0


if __name__ == "__main__":
    if "--worker" in sys.argv:
        kind = sys.argv[sys.argv.index("--worker") + 1]
        logsize = int(sys.argv[sys.argv.index("--logsize") + 1])
        try:
            if kind == "sumcheck":
                sys.exit(worker_sumcheck(logsize))
            sys.exit(worker_msm(logsize, signed=(kind == "msm_signed")))
        except Exception as e:  # noqa: BLE001 - a diagnosable line beats a crash
            print(json.dumps({"metric": kind, "value": 0.0, "unit": "error",
                              "error": f"{type(e).__name__}: {e}"[:300]}))
            sys.exit(1)
    sys.exit(main())
