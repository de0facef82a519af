"""Multi-host (DCN) dryrun: 2 jax.distributed processes, one global mesh.

The reference has no distributed layer at all (SURVEY.md §2.12); the
TPU-native framework's multi-host model is: every host holds the SAME
Fiat-Shamir transcript (host ints; challenges derive from identical bytes,
so they agree with zero communication), table shards live on each host's
devices, and the only cross-host traffic is the per-round psum of O(deg)
field scalars riding the jax.distributed backend (SURVEY.md §5).

Parent mode spawns two worker processes (4 virtual CPU devices each ->
one 8-device global mesh), runs the sharded deg-2 sumcheck prover on both,
and asserts the two proofs are byte-identical and equal to a single-device
reference prove.

Usage:  python scripts/multihost_dryrun.py            # parent (spawns 2)
        python scripts/multihost_dryrun.py --pipeline  # full Pippenger prove
        python scripts/multihost_dryrun.py --worker 0 --port 9911
"""
from __future__ import annotations

import argparse
import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICES_PER_PROC = 4
NUM_PROCS = 2


def _cpu_env() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    # oversubscribed virtual devices: raise XLA:CPU's 40 s collective
    # rendezvous deadline (sibling device threads may be compiling)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    ).strip()


def worker(process_id: int, port: int) -> int:
    _cpu_env()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROC)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NUM_PROCS,
        process_id=process_id,
    )
    assert jax.device_count() == NUM_PROCS * DEVICES_PER_PROC
    assert jax.process_count() == NUM_PROCS

    import random

    import numpy as np

    sys.path.insert(0, REPO)
    from gkr_msm_tpu.models.sumcheck import (
        DenseDeg2Sumcheck,
        SinglePointClaims,
        claims_for_map,
    )
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.ops.field.spec import FR
    from gkr_msm_tpu.ops.poly import mle
    from gkr_msm_tpu.parallel import sharded
    from gkr_msm_tpu.utils.transcript import Transcript

    # identical inputs on every host (replicated-witness model)
    rng = random.Random(0xD15C)
    nprng = np.random.default_rng(0xD15C)
    fn = bs.PROJ_L2
    num_vars = 7
    polys_host = [
        np.asarray(mle.random_poly_fast(FR, nprng, num_vars))
        for _ in range(fn.n_ins)
    ]
    point = [rng.randrange(FR.modulus) for _ in range(num_vars)]
    claims = claims_for_map(FR, fn, [np.asarray(p) for p in polys_host], point)

    # single-device reference prove (local to this host)
    proto = DenseDeg2Sumcheck(fn=fn, num_vars=num_vars)
    tr_ref = Transcript(b"multihost")
    proto.prove(tr_ref, claims, [np.asarray(p) for p in polys_host])
    ref_proof = tr_ref.end()

    # sharded prove over the GLOBAL mesh (both hosts participate)
    mesh = sharded.make_mesh(jax.devices())
    tr = Transcript(b"multihost")
    sharded.sharded_prove(mesh, tr, fn, num_vars, claims, polys_host)
    proof = tr.end()

    assert proof == ref_proof, "multi-host proof != single-device proof"
    print(f"proc{process_id} proof sha256={hashlib.sha256(proof).hexdigest()}",
          flush=True)
    jax.distributed.shutdown()
    return 0


def worker_pipeline(process_id: int, port: int) -> int:
    """Full (tiny) Pippenger prove across 2 jax.distributed processes
    (VERDICT r3 task 7): every host holds the same witness (replicated-
    transcript model), the global mesh spans both hosts, and the resulting
    proof bytes must match the single-process prover bit-for-bit."""
    _cpu_env()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVICES_PER_PROC)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NUM_PROCS,
        process_id=process_id,
    )
    import random

    import numpy as np

    sys.path.insert(0, REPO)
    from gkr_msm_tpu.models.pippenger import (
        build_pippenger_data,
        run_pippenger,
        verify_pippenger,
    )
    from gkr_msm_tpu.ops.curve import bandersnatch as bs
    from gkr_msm_tpu.parallel import context as pctx
    from gkr_msm_tpu.parallel import sharded
    from gkr_msm_tpu.utils.transcript import Transcript

    data = build_pippenger_data(
        random.Random(7), d_logsize=2, x_logsize=4, num_bits=4, clm=1
    )
    # NOTE: no in-worker single-process reference prove — the parent asserts
    # the two processes' proofs are byte-identical, and mesh-vs-single-device
    # byte identity is covered by tests/test_sharded.py::
    # test_sharded_pippenger_e2e_transcript_identical.  Re-proving locally
    # here doubled each worker's cold compile sweep and pushed the test past
    # its timeout on 4-core hosts (round-5 measurement).
    mesh = sharded.make_mesh(jax.devices())  # global: spans both processes
    with pctx.use_mesh(mesh):
        tr = Transcript(b"mh-pipe")
        out = run_pippenger(tr, data)
        proof = tr.end()
    # the mesh prove leaves the output tables as GLOBAL arrays (shards on
    # the other process are non-addressable); gather them to host so the
    # verifier's decode can read them — all hosts participate in the
    # collective, then only proc 0 runs the host-side verification
    from jax.experimental import multihost_utils as mhu

    out.output = [
        np.asarray(mhu.process_allgather(o, tiled=True))
        if isinstance(o, jax.Array) and not o.is_fully_addressable
        else np.asarray(o)
        for o in out.output
    ]
    if process_id == 0:  # verify once (host-side; identical on both)
        expected = bs.Host.msm(data.coefs, data.points)
        tv = Transcript(b"mh-pipe", proof=proof)
        verify_pippenger(tv, data.config, out, expected_msm=expected)
        tv.assert_end()
    print(
        f"proc{process_id} proof sha256={hashlib.sha256(proof).hexdigest()}",
        flush=True,
    )
    jax.distributed.shutdown()
    return 0


def parent(pipeline: bool = False) -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    extra = ["--pipeline"] if pipeline else []
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--port", str(port)] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(NUM_PROCS)
    ]
    outs = []
    rc = 0
    for p in procs:
        out, _ = p.communicate(timeout=3000 if pipeline else 600)
        outs.append(out)
        rc |= p.returncode
    digests = []
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if "sha256=" in line:
                digests.append(line.split("sha256=")[1].strip())
    if rc != 0 or len(digests) != NUM_PROCS or len(set(digests)) != 1:
        for i, out in enumerate(outs):
            sys.stderr.write(f"--- worker {i} ---\n{out}\n")
        print("MULTIHOST DRYRUN FAILED")
        return 1
    print(f"multihost dryrun OK: {NUM_PROCS} hosts, identical proofs "
          f"(sha256={digests[0][:16]}…)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--pipeline", action="store_true",
                    help="run the full (tiny) Pippenger prove across hosts")
    args = ap.parse_args()
    if args.worker is not None:
        fn = worker_pipeline if args.pipeline else worker
        sys.exit(fn(args.worker, args.port))
    sys.exit(parent(pipeline=args.pipeline))
