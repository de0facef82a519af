"""Triangle-add GKR: weighted-by-bucket-index combination (sum_i i*B_i).

TPU-native equivalent of the reference's TriangleAdd
(/root/reference/src/cleanup/protocols/gkrs/triangle_add.rs).  The circuit
is a "triangle" of doublings + additions over dense tables: layer ``l``
applies ``Stacked(triangle_l1, Repeated(proj_l1, l))`` then repeated L2/L3
over ``l+3`` 3-coordinate bundles, splitting at ``HI(multirow)`` between
layers.  Inputs are 12 dense polys (4 coordinate bundles from two
HI-splits); outputs are ``3*(num_layers+3)`` coordinate polys whose points
recombine as ``result = sum_i 2^(i-1) * out_i`` (triangle_add.rs:326-349).

All layers run on fully dense tables (DenseDeg2Sumcheck), exactly like the
reference (triangle_add.rs:195-233).
"""
from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp

from ..ops.curve import bandersnatch as bs
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly.algfn import AlgFn, repeated, stacked
from ..utils.transcript import Transcript
from . import gkr
from .gkr import SplitAt, SplitIdx, algfn_map, algfn_map_split
from .sumcheck import DenseDeg2Sumcheck, SinglePointClaims

_L1_CACHE = {}
_L2_CACHE = {}
_L3_CACHE = {}


def _l1_fn(layer_idx: int) -> AlgFn:
    """Stacked(triangle_l1, Repeated(proj_l1, layer_idx)) — cached so jit
    caches stay warm across protocol instances."""
    if layer_idx not in _L1_CACHE:
        _L1_CACHE[layer_idx] = (
            bs.TRIANGLE_L1
            if layer_idx == 0
            else stacked(bs.TRIANGLE_L1, repeated(bs.PROJ_L1, layer_idx))
        )
    return _L1_CACHE[layer_idx]


def _l2_fn(layer_idx: int) -> AlgFn:
    if layer_idx not in _L2_CACHE:
        _L2_CACHE[layer_idx] = repeated(bs.PROJ_L2, layer_idx + 3)
    return _L2_CACHE[layer_idx]


def _l3_fn(layer_idx: int) -> AlgFn:
    if layer_idx not in _L3_CACHE:
        _L3_CACHE[layer_idx] = repeated(bs.PROJ_L3, layer_idx + 3)
    return _L3_CACHE[layer_idx]


def witness_build(
    advice: List[jnp.ndarray],
    num_vars: int,
    split_idx: SplitIdx,
) -> List:
    """Forward witness pass (triangle_add.rs:100-160).  advice: 12 dense polys."""
    hi = split_idx.hi_usize(num_vars)
    split = SplitIdx("hi", hi)
    num_layers = num_vars - hi
    advices: List = []
    for layer_idx in range(num_layers + 1):
        for step in (1, 2, 3):
            if step == 1:
                nxt = algfn_map(advice, _l1_fn(layer_idx))
            elif step == 2:
                nxt = algfn_map(advice, _l2_fn(layer_idx))
            elif layer_idx == num_layers:
                nxt = None
            else:
                nxt = algfn_map_split(advice, _l3_fn(layer_idx), split, 3)
            advices.append(advice)
            advice = nxt
        if layer_idx < num_layers:
            advices.append(None)
    return advices


def last_step(advice: List[jnp.ndarray], layer_idx: int) -> List[jnp.ndarray]:
    """Final L3 map -> output coordinate polys (triangle_add.rs:88-98)."""
    return algfn_map(advice, _l3_fn(layer_idx))


def protocol_build(
    num_vars: int, split_idx: SplitIdx, spec: FieldSpec = FR
) -> List:
    """Layer list (triangle_add.rs:176-233)."""
    hi = split_idx.hi_usize(num_vars)
    split = SplitIdx("hi", hi)
    num_layers = num_vars - hi
    p = spec.modulus
    layers: List = []
    for layer_idx in range(num_layers + 1):
        layers.append(
            DenseDeg2Sumcheck(_l1_fn(layer_idx), num_vars - layer_idx, spec)
        )
        layers.append(
            DenseDeg2Sumcheck(_l2_fn(layer_idx), num_vars - layer_idx, spec)
        )
        layers.append(
            DenseDeg2Sumcheck(_l3_fn(layer_idx), num_vars - layer_idx, spec)
        )
        if layer_idx < num_layers:
            layers.append(SplitAt(split, 3, p))
    return layers


@dataclasses.dataclass
class TriangleAdd:
    """Composed protocol (triangle_add.rs:52-74)."""

    num_vars: int
    split_idx: SplitIdx
    spec: FieldSpec = FR

    def __post_init__(self):
        self.layers = protocol_build(self.num_vars, self.split_idx, self.spec)

    def prove(self, tr: Transcript, claims: SinglePointClaims, advices):
        return gkr.gkr_prove(tr, self.layers, claims, advices)

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        return gkr.gkr_verify(tr, self.layers, claims)
