"""Field-ops adapter: one algebra, two execution contexts.

GKR layer maps (the circuit gates, ops/curve/bandersnatch.py) are written
once against this small protocol and then executed either

* on standard-layout ``uint32[..., n_limbs]`` arrays via :class:`StdOps`
  (delegates to ops/field/limbs.py — XLA or per-op Pallas dispatch), or
* on transposed ``uint32[n_limbs, B]`` VMEM values inside fused Pallas
  kernels via ``ops.pallas.field_kernels.TOps``.

This is the TPU answer to the reference's AlgFn-over-Index trait
(/root/reference/src/cleanup/utils/algfn.rs:11-34): the formula is shared,
the layout/executor is swappable.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from . import limbs as fl
from .spec import FieldSpec


@dataclasses.dataclass(frozen=True)
class StdOps:
    """Standard-layout executor (arrays ``uint32[..., n_limbs]``)."""

    spec: FieldSpec

    def mul(self, a, b):
        return fl.mul(self.spec, a, b)

    def add(self, a, b):
        return fl.add(self.spec, a, b)

    def sub(self, a, b):
        return fl.sub(self.spec, a, b)

    def square(self, a):
        return fl.mul(self.spec, a, a)

    def double(self, a):
        return fl.add(self.spec, a, a)

    def neg(self, a):
        return fl.neg(self.spec, a)

    def mul_const(self, a, c_mont: np.ndarray):
        return fl.mul_const(self.spec, a, c_mont)

    def one_like(self, a):
        return fl.ones_mont(self.spec, a.shape[:-1])


@dataclasses.dataclass(frozen=True)
class IntOps:
    """Exact host-int executor: the same layer formulas on Python ints mod p
    (the legacy protocol generation and verifier-side cross-checks run on
    the scalar plane — models/legacy_protocols.py)."""

    spec: FieldSpec

    @property
    def p(self) -> int:
        return self.spec.modulus

    def mul(self, a, b):
        return a * b % self.p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def square(self, a):
        return a * a % self.p

    def double(self, a):
        return 2 * a % self.p

    def neg(self, a):
        return (-a) % self.p

    def mul_const(self, a, c_mont: np.ndarray):
        c = 0
        for k, limb in enumerate(np.asarray(c_mont).reshape(-1)):
            c |= int(limb) << (16 * k)
        return a * self.spec.from_mont_int(c) % self.p

    def one_like(self, a):
        return 1
