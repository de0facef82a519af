"""Pippenger "ending": bintree bucket accumulation -> relayout splits ->
triangle weighted combination.

Port of /root/reference/src/cleanup/protocols/pippenger_ending.rs:
PippengerEndingWG composes the bintree witness (over horizontal_vars with
bitcheck) with two identity HI-splits and the triangle witness; the
protocol proves in reverse order: triangle -> SplitAt x2 -> bintree.
"""
from __future__ import annotations

import dataclasses
from typing import List

from ..ops.field.spec import FR
from ..ops.poly.algfn import id_algfn, repeated
from ..utils.transcript import Transcript
from . import bintree as bintree_mod
from . import gkr
from . import triangle as triangle_mod
from .gkr import HI, SplitAt
from .sumcheck import SinglePointClaims

P = FR.modulus

_ID3 = id_algfn(3)
_ID3X2 = repeated(id_algfn(3), 2)


class PippengerEndingWG:
    """Witness for the ending (pippenger_ending.rs:30-100)."""

    def __init__(self, multirow_vars, bucket_vars, horizontal_vars, inputs):
        assert len(inputs) == 6
        self.bintree_advices = bintree_mod.witness_build(
            inputs, horizontal_vars, horizontal_vars, True
        )
        last = bintree_mod.last_step(self.bintree_advices[-1], horizontal_vars - 1)
        split_l1 = gkr.algfn_map_split(last, _ID3, HI(multirow_vars), 3)
        split_l2 = gkr.algfn_map_split(split_l1, _ID3X2, HI(multirow_vars), 3)
        self.triangle_advices = triangle_mod.witness_build(
            split_l2, multirow_vars + bucket_vars - 2, HI(multirow_vars)
        )

    def last(self):
        return self.triangle_advices[-1]


@dataclasses.dataclass
class PippengerBucketed:
    """The composed ending protocol (pippenger_ending.rs:103-158)."""

    multirow_vars: int
    bucket_vars: int
    horizontal_vars: int

    def __post_init__(self):
        self.bintree = bintree_mod.BintreeAdd(
            num_adds=self.horizontal_vars,
            num_vars=self.multirow_vars + self.bucket_vars + self.horizontal_vars,
            row_logsize=self.horizontal_vars,
            do_bitcheck=True,
        )
        self.splits = SplitAt(HI(self.multirow_vars), 3, P)
        self.triangle = triangle_mod.TriangleAdd(
            self.multirow_vars + self.bucket_vars - 2, HI(self.multirow_vars)
        )

    def prove(self, tr: Transcript, claims: SinglePointClaims, wg: PippengerEndingWG):
        claims = self.triangle.prove(tr, claims, wg.triangle_advices)
        claims = self.splits.prove_layer(tr, claims, None)
        claims = self.splits.prove_layer(tr, claims, None)
        claims = self.bintree.prove(tr, claims, wg.bintree_advices)
        return claims

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        claims = self.triangle.verify(tr, claims)
        claims = self.splits.verify_layer(tr, claims)
        claims = self.splits.verify_layer(tr, claims)
        claims = self.bintree.verify(tr, claims)
        return claims
