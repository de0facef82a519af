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
    proof bytes must equal the single-process prover's (VERDICT r3 task 7).
    Slow tier: the pipeline compile sweep runs twice (once per process)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_dryrun.py"),
         "--pipeline"],
        capture_output=True, text=True, timeout=3100, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost dryrun OK" in out.stdout
