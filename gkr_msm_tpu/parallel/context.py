"""Mesh context: one switch that turns the whole prover multi-chip.

The reference's rayon parallelism is ambient (a global thread pool); the
TPU-native analog is an ambient 1-D device mesh.  Entering ``use_mesh``
makes every dispatch point in the pipeline (dense/rect sumcheck provers,
Pippenger MSM commitments) route to its sharded implementation in
``parallel.sharded`` — all of which are transcript/value-identical to the
single-device paths (asserted in tests/test_sharded.py and
__graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import contextlib
from typing import Optional

_MESH = None


def get_mesh():
    """The ambient mesh, or None (single-device)."""
    return _MESH


def set_mesh(mesh) -> None:
    global _MESH
    _MESH = mesh


@contextlib.contextmanager
def use_mesh(mesh):
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        yield mesh
    finally:
        _MESH = prev


def shardable(n: int, mesh=None, min_per_device: int = 2) -> bool:
    """Can a leading axis of size n shard evenly over the mesh?"""
    mesh = mesh if mesh is not None else _MESH
    if mesh is None:
        return False
    d = mesh.devices.size
    return n % d == 0 and n >= min_per_device * d
