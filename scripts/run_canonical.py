"""Canonical-config end-to-end run on real hardware (VERDICT.md task 2).

Mirrors the reference's canonical entry point
(/root/reference/README.md:5, examples/pippenger.rs:20-73):
x_logsize=16, d_logsize=8, nbits=128, commitment_log_multiplicity=0.
Proves, verifies, checks the recombined output against a device-computed
Bandersnatch MSM of the same (points, coefs), and writes a JSON artifact
with the phase span tree + proof size.

Usage (TPU):
    python scripts/run_canonical.py                 # full canonical config
    python scripts/run_canonical.py -N 13           # smaller smoke
    GKR_MSM_FUSED_PROVER=0 is set by default here: the single-dispatch
    prover would compile one giant program per (layer fn, shape) — dozens of
    multi-minute compiles for a one-shot sweep.  Pass --fused to re-enable.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-N", "--x-logsize", type=int, default=16)
    ap.add_argument("--d-logsize", type=int, default=8)
    ap.add_argument("--nbits", type=int, default=128)
    ap.add_argument("--clm", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0xCA90)
    ap.add_argument("--out", default=None, help="JSON artifact path")
    ap.add_argument("--fused", action="store_true",
                    help="use the single-dispatch fused prover (many big compiles)")
    ap.add_argument("--skip-msm-check", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if not args.fused:
        os.environ.setdefault("GKR_MSM_FUSED_PROVER", "0")
    # Tunneled devices: packed-affine commits upload ~25 u32/point per
    # window through the tunnel and dominated phase 1 (30+ min); the
    # device-gather route needs no host I/O (SRS resident in HBM).  Export
    # GKR_MSM_PACKED=1 to re-enable on a local-PCIe TPU host.
    os.environ.setdefault("GKR_MSM_PACKED", "0")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("GKR_MSM_JAX_CACHE", os.path.join(repo, ".jax_cache"))
    sys.path.insert(0, repo)

    platform = args.platform or os.environ.get("GKR_MSM_PLATFORM")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    # cache EVERY compile (default threshold skips sub-second ones; the
    # canonical sweep is hundreds of small kernels paid through the tunnel)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    def tick(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    import random

    import jax.numpy as jnp
    import numpy as np

    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.models.pippenger import (
        build_pippenger_data,
        run_pippenger,
        verify_pippenger,
    )
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.ops.msm import pippenger as msm
    from gkr_msm_tpu.utils.tracing import TRACER, span
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(args.seed)
    stamp = {}
    t_all = time.perf_counter()

    tick(f"start x={args.x_logsize} d={args.d_logsize} nbits={args.nbits} clm={args.clm}")
    with span("build data (points + SRS)"):
        data = build_pippenger_data(
            rng, args.d_logsize, args.x_logsize, args.nbits, args.clm
        )
    stamp["build_s"] = time.perf_counter() - t_all
    tick(f"data built in {stamp['build_s']:.1f}s")

    expected = None
    if not args.skip_msm_check:
        t0 = time.perf_counter()
        with span("device expected MSM (bandersnatch)"):
            pts_dev = jnp.asarray(bs.encode_affine_to_proj(data.points))
            limbs = msm.scalars_ints_to_limbs(data.coefs)
            out = msm.msm_device(pts_dev, limbs, n_bits=args.nbits, curve="te")
            xyz = fl.decode_ints(FR, np.asarray(out))
            expected = bs.Host.normalize_proj(tuple(xyz))
        stamp["expected_msm_s"] = time.perf_counter() - t0
        tick(f"expected MSM in {stamp['expected_msm_s']:.1f}s")

    t0 = time.perf_counter()
    tr = Transcript(b"canonical")
    output = run_pippenger(tr, data)
    proof = tr.end()
    stamp["prove_s"] = time.perf_counter() - t0
    stamp["proof_bytes"] = len(proof)
    tick(f"proved in {stamp['prove_s']:.1f}s ({len(proof)} bytes)")

    t0 = time.perf_counter()
    tv = Transcript(b"canonical", proof=proof)
    got = verify_pippenger(tv, data.config, output, expected_msm=expected)
    tv.assert_end()
    stamp["verify_s"] = time.perf_counter() - t0
    tick(f"verified in {stamp['verify_s']:.1f}s")
    stamp["msm_equality"] = (expected is None) or (got == expected)
    stamp["total_s"] = time.perf_counter() - t_all

    spans = TRACER.render()
    print(spans)
    result = {
        "config": {
            "x_logsize": args.x_logsize,
            "d_logsize": args.d_logsize,
            "nbits": args.nbits,
            "clm": args.clm,
            "fused_prover": bool(args.fused),
        },
        "platform": None,
        **{k: (round(v, 3) if isinstance(v, float) else v) for k, v in stamp.items()},
        "span_tree": spans.splitlines(),
    }
    try:
        import jax

        result["platform"] = jax.default_backend()
        result["device"] = str(jax.devices()[0])
    except Exception:
        pass
    print(json.dumps({k: v for k, v in result.items() if k != "span_tree"}))
    out_path = args.out or os.path.join(
        repo, "artifacts", f"canonical_x{args.x_logsize}_d{args.d_logsize}_n{args.nbits}.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"artifact: {out_path}")
    assert stamp["msm_equality"], "recombined MSM != expected"
    return 0


if __name__ == "__main__":
    sys.exit(main())
