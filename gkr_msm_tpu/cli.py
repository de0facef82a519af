"""CLI: prove + verify a Pippenger MSM proof (examples/pippenger.rs parity).

Flags mirror the reference CLI (/root/reference/examples/pippenger.rs:20-73):
--x-logsize/-N, --d-logsize, --nbits, --commitment-log-multiplicity, --log.
Prints phase wall-times and the proof size, then verifies and checks the
recombined result against the host-model MSM.
"""
from __future__ import annotations

import argparse
import logging
import random
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="gkr-msm-tpu", description=__doc__)
    ap.add_argument("-N", "--x-logsize", type=int, default=10,
                    help="log2 number of points (reference default 16)")
    ap.add_argument("--d-logsize", type=int, default=4,
                    help="Pippenger window bits")
    ap.add_argument("--nbits", type=int, default=32,
                    help="scalar bit width (reference default 128)")
    ap.add_argument("--commitment-log-multiplicity", type=int, default=1,
                    help="log rows per commitment column")
    ap.add_argument("--log", default="info", help="logging level")
    ap.add_argument("--seed", type=int, default=0x5EED)
    ap.add_argument("--skip-msm-check", action="store_true",
                    help="skip the host-model MSM cross-check (slow for large N)")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu). NOTE: the env var "
                         "JAX_PLATFORMS alone is NOT enough in axon images — "
                         "sitecustomize re-pins the platform after import, so "
                         "this flag (or GKR_MSM_PLATFORM) must be used instead")
    args = ap.parse_args(argv)

    import os

    platform = args.platform or os.environ.get("GKR_MSM_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    logging.basicConfig(level=args.log.upper(), format="%(message)s")
    log = logging.getLogger("gkr-msm-tpu")

    from .models.pippenger import (
        build_pippenger_data,
        run_pippenger,
        verify_pippenger,
    )
    from .ops.curve import bandersnatch as bs
    from .utils.transcript import Transcript

    rng = random.Random(args.seed)

    t0 = time.perf_counter()
    data = build_pippenger_data(
        rng, args.d_logsize, args.x_logsize, args.nbits,
        args.commitment_log_multiplicity,
    )
    t1 = time.perf_counter()
    log.info("setup + data gen: %.3fs", t1 - t0)

    expected = None
    if not args.skip_msm_check:
        expected = bs.Host.msm(data.coefs, data.points)
        t2 = time.perf_counter()
        log.info("host ground-truth MSM: %.3fs", t2 - t1)

    t2 = time.perf_counter()
    tr = Transcript(b"gkr-msm-tpu/pippenger")
    output = run_pippenger(tr, data)
    proof = tr.end()
    t3 = time.perf_counter()
    log.info("prove (witness + proof): %.3fs", t3 - t2)
    from .utils.tracing import TRACER
    tree = TRACER.render()
    if tree:
        log.info("phase timings:\n%s", tree)
    print(f"proof size: {len(proof)} bytes")

    tv = Transcript(b"gkr-msm-tpu/pippenger", proof=proof)
    got = verify_pippenger(tv, data.config, output, expected_msm=expected)
    tv.assert_end()
    t4 = time.perf_counter()
    log.info("verify: %.3fs", t4 - t3)
    if expected is not None:
        print("MSM check: OK (proof output matches host-model MSM)")
    print("verification: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
