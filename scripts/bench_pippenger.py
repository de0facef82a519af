"""Full-pipeline Pippenger benchmark at the reference's headline config.

Mirrors the reference CLI run (README.md:5 of /root/reference):
  cargo run --example pippenger -- --x-logsize 16 --d-logsize 8 --nbits 128
and prints one JSON line with the prove wall time, proof size and
points/sec, plus per-phase timings from the tracer.

Usage:  python scripts/bench_pippenger.py [x_logsize] [d_logsize] [nbits]
(defaults 16 8 128; pass smaller values for smoke runs).
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "GKR_MSM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


def main():
    x_logsize = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    d_logsize = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nbits = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from gkr_msm_tpu.models.pippenger import (
        build_pippenger_data,
        run_pippenger,
        verify_pippenger,
    )
    from gkr_msm_tpu.utils.tracing import TRACER
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(0xB17C0)
    t0 = time.perf_counter()
    data = build_pippenger_data(rng, d_logsize, x_logsize, nbits, 1)
    t1 = time.perf_counter()
    print(f"setup: {t1-t0:.1f}s", file=sys.stderr, flush=True)

    tr = Transcript(b"gkr-msm-tpu/pippenger")
    output = run_pippenger(tr, data)
    proof = tr.end()
    t2 = time.perf_counter()
    tree = TRACER.render()
    if tree:
        print(tree, file=sys.stderr, flush=True)

    tv = Transcript(b"gkr-msm-tpu/pippenger", proof=proof)
    verify_pippenger(tv, data.config, output, expected_msm=None)
    tv.assert_end()
    t3 = time.perf_counter()

    prove_s = t2 - t1
    print(json.dumps({
        "metric": f"pippenger_points_per_sec_2^{x_logsize}_d{d_logsize}_b{nbits}",
        "value": round((1 << x_logsize) / prove_s, 1),
        "unit": "points/s",
        "prove_s": round(prove_s, 2),
        "verify_s": round(t3 - t2, 2),
        "proof_bytes": len(proof),
    }))


if __name__ == "__main__":
    main()
