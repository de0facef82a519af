"""Multi-host (jax.distributed, 2 processes) sharded-prover dryrun
(SURVEY.md §5 distributed backend; VERDICT.md round-1 missing #6)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_proofs_identical():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # workers pin cpu themselves
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_dryrun.py")],
        capture_output=True, text=True, timeout=540, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost dryrun OK" in out.stdout


def test_two_process_pipeline_proofs_identical():
    """Full (tiny) Pippenger prove across 2 jax.distributed processes:
    the two processes' proof bytes must be identical, and process 0
    verifies (incl. the recombined-MSM equality check).  Slow tier: the
    mesh-pipeline compile sweep runs in both workers concurrently.
    Recorded pass: 26:06 min cold on the 4-core round-5 builder host
    (2026-08-21), after the sharded-program memoization + all_gather
    deadlock fixes; it had never completed before those."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_dryrun.py"),
         "--pipeline"],
        capture_output=True, text=True, timeout=3100, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost dryrun OK" in out.stdout
