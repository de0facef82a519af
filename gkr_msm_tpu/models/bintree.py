"""Bintree-add GKR: bucket accumulation by layered twisted-Edwards additions.

TPU-native equivalent of the reference's VecVecBintreeAdd
(/root/reference/src/cleanup/protocols/gkrs/bintree_add.rs): ``num_adds``
rounds of [L1, L2, L3] degree-2 TE-addition layers halve each bucket row,
the first addition in affine coordinates, later ones projective; an optional
bitcheck (x^2-x on the two domain polys) is stacked onto the first L1 layer
with a ZeroCheck claim transform.  Sumcheck layers run on RectPoly (jagged
equivalent) while row variables remain (bintree_add.rs protocol builder
condition ``i + 1 < row_logsize``), then on dense column tables.

Advice convention (gkr.rs:45-50): ``advices[k]`` is the INPUT polys of
``layers[k]``; claim-transform layers get ``None``.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp

from ..ops.curve import bandersnatch as bs
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly.algfn import AlgFn, bitcheck, repeated, stacked
from ..ops.poly.rect import (
    RectPoly,
    rect_map,
    rect_map_split,
    rect_map_split_to_dense,
)
from ..utils.transcript import Transcript
from . import gkr
from .gkr import LO, SplitAt, ZeroCheck, algfn_map, algfn_map_split
from .sumcheck import DenseDeg2Sumcheck, RectDeg2Sumcheck, SinglePointClaims

# module-level AlgFns (stable identities => stable jit caches)
BITCHECK2 = repeated(bitcheck(FR, 1), 2)
AFFINE_L1_BITCHECK = stacked(bs.AFFINE_L1, BITCHECK2)

Advice = Union[None, List[RectPoly], List[jnp.ndarray]]


def _is_rect(advice) -> bool:
    return isinstance(advice[0], RectPoly)


def _advice_map(advice, fn: AlgFn):
    if _is_rect(advice):
        return rect_map(advice, fn)
    return algfn_map(list(advice)[: fn.n_ins], fn)


def _advice_map_split(advice, fn: AlgFn, add_idx: int, row_logsize: int):
    if _is_rect(advice):
        if add_idx + 2 == row_logsize:
            return rect_map_split_to_dense(advice, fn, 3)
        return rect_map_split(advice, fn, 3)
    return algfn_map_split(list(advice)[: fn.n_ins], fn, LO(0), 3)


def _step_fn(add_idx: int, step: int) -> AlgFn:
    if add_idx == 0:
        return {1: bs.AFFINE_L1, 2: bs.AFFINE_L2, 3: bs.AFFINE_L3}[step]
    return {1: bs.PROJ_L1, 2: bs.PROJ_L2, 3: bs.PROJ_L3}[step]


def _make_step(advice, add_idx, row_logsize, num_adds, step):
    fn = _step_fn(add_idx, step)
    if step in (1, 2):
        return _advice_map(advice, fn)
    if add_idx + 1 == num_adds:
        return None
    return _advice_map_split(advice, fn, add_idx, row_logsize)


def witness_build(
    advice,
    row_logsize: int,
    num_adds: int,
    do_bitcheck: bool,
) -> List[Advice]:
    """Forward witness pass (bintree_add.rs:137-171)."""
    assert num_adds > 0
    advices: List[Advice] = []
    for add_idx in range(num_adds):
        for step in (1, 2, 3):
            nxt = _make_step(advice, add_idx, row_logsize, num_adds, step)
            advices.append(advice)
            if add_idx == 0 and step == 1 and do_bitcheck:
                advices.append(None)
            advice = nxt
        if add_idx + 1 != num_adds:
            advices.append(None)
    return advices


def last_step(advice, layer_idx: int):
    """Final L3 map (not part of the advice list) -> output polys
    (bintree_add.rs:124-133)."""
    fn = bs.AFFINE_L3 if layer_idx == 0 else bs.PROJ_L3
    return _advice_map(advice, fn)


def protocol_build(
    num_vars: int,
    num_adds: int,
    row_logsize: int,
    do_bitcheck: bool,
    spec: FieldSpec = FR,
) -> List:
    """Layer list (bintree_add.rs:242-376)."""
    layers: List = []
    num_vertical = num_vars - row_logsize
    p = spec.modulus
    for i in range(num_adds):
        for step in (1, 2, 3):
            if i == 0 and step == 1 and do_bitcheck:
                fn = AFFINE_L1_BITCHECK
            else:
                fn = _step_fn(i, step)
            if i + 1 < row_logsize:
                layers.append(
                    RectDeg2Sumcheck(fn, num_vars - i - 1, num_vertical, spec)
                )
            else:
                layers.append(DenseDeg2Sumcheck(fn, num_vars - i - 1, spec))
            if i == 0 and step == 1 and do_bitcheck:
                layers.append(ZeroCheck())
        if i != num_adds - 1:
            layers.append(SplitAt(LO(0), 3, p))
    return layers


@dataclasses.dataclass
class BintreeAdd:
    """The composed protocol (bintree_add.rs:85-118)."""

    num_adds: int
    num_vars: int
    row_logsize: int
    do_bitcheck: bool
    spec: FieldSpec = FR

    def __post_init__(self):
        self.layers = protocol_build(
            self.num_vars,
            self.num_adds,
            self.row_logsize,
            self.do_bitcheck,
            self.spec,
        )

    def prove(self, tr: Transcript, claims: SinglePointClaims, advices):
        self._pin_kernel_cap(advices)
        return gkr.gkr_prove(tr, self.layers, claims, advices)

    def _pin_kernel_cap(self, advices) -> None:
        """Pin ONE round-kernel capacity across every rect layer: zero-padded
        lanes are exact (eq weight 0), and a single compiled round program
        per step fn replaces one per (fn, capacity) — the dominant compile
        cost of the canonical x=16 prove (GKR_MSM_RECT_FIXCAP=0 disables)."""
        import os

        if os.environ.get("GKR_MSM_RECT_FIXCAP", "1") == "0":
            return
        caps = [
            a[0].capacity
            for a in advices
            if a is not None and _is_rect(a)
        ]
        if not caps:
            return
        fix = max(caps)
        for layer in self.layers:
            if isinstance(layer, RectDeg2Sumcheck):
                layer.kernel_cap = fix

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        return gkr.gkr_verify(tr, self.layers, claims)
