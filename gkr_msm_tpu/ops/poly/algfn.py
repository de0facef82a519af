"""Algebraic-function abstraction: the GKR circuit "gate" layer maps.

A TPU-native reimagining of the reference's ``AlgFn`` trait
(/root/reference/src/cleanup/utils/algfn.rs:11-34) and its combinators
(algfn.rs:129-292).  An AlgFn here is a pure JAX function mapping a list of
field-element arrays (each ``uint32[..., n_limbs]``, broadcastable shapes)
to a list of output arrays, annotated with (deg, n_ins, n_outs) so sumcheck
provers know how many evaluation points a round needs.

No Index<usize> trickery needed: lists of jnp arrays + Python-level
composition, traced once under jit — the whole layer map fuses into one XLA
computation over the batch.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

from ..field import limbs as fl
from ..field.spec import FieldSpec


@dataclasses.dataclass(frozen=True)
class AlgFn:
    """deg/n_ins/n_outs-annotated pure map: List[arr] -> List[arr].

    ``ops_fn``, when present, is the same formula written against the
    field-ops protocol (ops/field/fieldops.py) — fused Pallas kernels call
    it with a transposed-layout executor to run the map inside VMEM.
    """

    fn: Callable[[Sequence[jnp.ndarray]], List[jnp.ndarray]]
    deg: int
    n_ins: int
    n_outs: int
    name: str = "algfn"
    ops_fn: "Callable | None" = None

    def __call__(self, args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(args) == self.n_ins, (self.name, len(args), self.n_ins)
        outs = self.fn(args)
        assert len(outs) == self.n_outs, (self.name, len(outs), self.n_outs)
        return outs

    def describe(self) -> str:
        return f"{self.name} {self.n_ins}->{self.n_outs} deg {self.deg}"


@functools.partial(jax.jit, static_argnums=(0,))
def _apply_fn_jit(fn: "AlgFn", args):
    return tuple(fn(list(args)))


def apply_fn(fn: AlgFn, args: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Jitted AlgFn application (one compile per (fn identity, shape))."""
    return list(_apply_fn_jit(fn, tuple(args)))


def id_algfn(n: int) -> AlgFn:
    """Identity on n polys (reference IdAlgFn, algfn.rs:129-165)."""
    return AlgFn(
        fn=lambda args: list(args),
        deg=1,
        n_ins=n,
        n_outs=n,
        name="id",
        ops_fn=lambda o, args: list(args),
    )


def repeated(f: AlgFn, count: int) -> AlgFn:
    """Apply f to `count` consecutive blocks of inputs (algfn.rs:186-224)."""

    def fn(args):
        outs = []
        for c in range(count):
            outs.extend(f(args[c * f.n_ins : (c + 1) * f.n_ins]))
        return outs

    ops_fn = None
    if f.ops_fn is not None:
        def ops_fn(o, args, _f=f.ops_fn, _n=f.n_ins):
            outs = []
            for c in range(count):
                outs.extend(_f(o, args[c * _n : (c + 1) * _n]))
            return outs

    return AlgFn(
        fn=fn,
        deg=f.deg,
        n_ins=f.n_ins * count,
        n_outs=f.n_outs * count,
        name=f"repeat[{count}]({f.name})",
        ops_fn=ops_fn,
    )


def stacked(f: AlgFn, g: AlgFn) -> AlgFn:
    """Concatenate two fns over a shared-prefix-free input split
    (algfn.rs:226-259): first f.n_ins inputs go to f, next g.n_ins to g."""

    def fn(args):
        return f(args[: f.n_ins]) + g(args[f.n_ins :])

    ops_fn = None
    if f.ops_fn is not None and g.ops_fn is not None:
        def ops_fn(o, args, _f=f.ops_fn, _g=g.ops_fn, _n=f.n_ins):
            return list(_f(o, args[:_n])) + list(_g(o, args[_n:]))

    return AlgFn(
        fn=fn,
        deg=max(f.deg, g.deg),
        n_ins=f.n_ins + g.n_ins,
        n_outs=f.n_outs + g.n_outs,
        name=f"stack({f.name},{g.name})",
        ops_fn=ops_fn,
    )


def bitcheck(spec: FieldSpec, n: int) -> AlgFn:
    """x^2 - x per input (zero iff x is a bit) — reference BitCheckFn
    (algfn.rs:261-292)."""

    def fn(args):
        return [fl.sub(spec, fl.square(spec, x), x) for x in args]

    return AlgFn(
        fn=fn,
        deg=2,
        n_ins=n,
        n_outs=n,
        name="bitcheck",
        ops_fn=lambda o, args: [o.sub(o.square(x), x) for x in args],
    )
