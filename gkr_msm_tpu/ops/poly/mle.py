"""Dense multilinear-extension toolkit over limb arrays.

A dense MLE over k variables is ``uint32[2^k, n_limbs]`` (Montgomery form),
index bit (k-1) — the MSB — pairing with coordinate 0 of an evaluation
point.  This matches the reference's convention where ``evaluate`` binds
point coordinates in reverse (/root/reference/src/cleanup/polys/dense.rs:21-30)
and eq tables index the poly's high bits with point prefixes
(sumchecks/dense_eq.rs:85-131).

All heavy entry points are jitted (one compile per shape); host int points
are encoded to Montgomery limb arrays at the call boundary.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..field import limbs as fl
from ..field.spec import FieldSpec


def scalar(spec: FieldSpec, v: int) -> jnp.ndarray:
    """Host int -> Montgomery limb vector (constant)."""
    return jnp.asarray(fl.encode_ints(spec, [v])[0])


def encode_point(spec: FieldSpec, point: Sequence[int]) -> jnp.ndarray:
    """Host ints -> uint32[k, n_limbs] Montgomery."""
    return jnp.asarray(fl.encode_ints(spec, list(point)))


@functools.partial(jax.jit, static_argnums=(0,))
def _field_sum(spec: FieldSpec, arr: jnp.ndarray) -> jnp.ndarray:
    m = arr.shape[0]
    assert m & (m - 1) == 0, "field_sum requires power-of-two length"
    while m > 1:
        arr = fl.add(spec, arr[0 : m // 2 * 2 : 2], arr[1 : m // 2 * 2 : 2])
        m //= 2
    return arr[0]


def field_sum(spec: FieldSpec, arr: jnp.ndarray, flat_len: int | None = None) -> jnp.ndarray:
    """Sum over leading axis (power-of-two) by halving tree."""
    return _field_sum(spec, arr)


@functools.partial(jax.jit, static_argnums=(0,))
def bind_low(spec: FieldSpec, poly: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Bind the lowest variable: p'[i] = p[2i] + t*(p[2i+1] - p[2i])."""
    even = poly[0::2]
    odd = poly[1::2]
    return fl.add(spec, even, fl.mul(spec, t, fl.sub(spec, odd, even)))


@functools.partial(jax.jit, static_argnums=(0,))
def _evaluate(spec: FieldSpec, poly: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    cur = poly
    k = point.shape[0]
    for i in range(k - 1, -1, -1):
        even = cur[0::2]
        odd = cur[1::2]
        cur = fl.add(spec, even, fl.mul(spec, point[i], fl.sub(spec, odd, even)))
    return cur[0]


def evaluate(spec: FieldSpec, poly: jnp.ndarray, point: Sequence[int]) -> int:
    """Exact evaluation at a host point (reverse-order binds, dense.rs:21-30)."""
    if len(point) == 0:
        return fl.decode_ints(spec, poly[0])[0]
    pt = encode_point(spec, point)
    return fl.decode_ints(spec, _evaluate(spec, poly, pt))[0]


@functools.partial(jax.jit, static_argnums=(0,))
def _eq_table(spec: FieldSpec, point: jnp.ndarray, init: jnp.ndarray) -> jnp.ndarray:
    t = init.reshape(1, spec.n_limbs)
    for i in range(point.shape[0]):
        hi = fl.mul(spec, t, point[i])  # bit = 1 branch
        lo = fl.sub(spec, t, hi)  # bit = 0 branch: t*(1-c)
        t = jnp.stack([lo, hi], axis=1).reshape(-1, spec.n_limbs)
    return t


def eq_table(spec: FieldSpec, point: Sequence[int], init: int = 1) -> jnp.ndarray:
    """eq-poly evaluation table: table[i] = init * prod_j eq(point[j], bit_j(i)),
    point[0] at the MSB (utils.rs:222-254 eq_poly_sequence semantics)."""
    pt = encode_point(spec, list(point))
    return _eq_table(spec, pt, scalar(spec, init))


@functools.partial(jax.jit, static_argnums=(0,))
def _eq_table_seq(spec: FieldSpec, point: jnp.ndarray):
    t = _eq_table(spec, point[:0], jnp.asarray(np.asarray(spec.one_mont)))
    tables = [t]
    for i in range(point.shape[0]):
        hi = fl.mul(spec, t, point[i])
        lo = fl.sub(spec, t, hi)
        t = jnp.stack([lo, hi], axis=1).reshape(-1, spec.n_limbs)
        tables.append(t)
    return tuple(tables)


def eq_table_sequence(spec: FieldSpec, point: Sequence[int]) -> List[jnp.ndarray]:
    """All prefix eq tables [[1], eq(p0), eq(p0,p1), ...] (utils.rs:222-254).

    Table k covers point[0..k]; the dense-eq sumcheck pops one per round.
    """
    pt = encode_point(spec, list(point))
    return list(_eq_table_seq(spec, pt))


def random_poly(spec: FieldSpec, rng, num_vars: int) -> jnp.ndarray:
    vals = [rng.randrange(spec.modulus) for _ in range(1 << num_vars)]
    return jnp.asarray(fl.encode_ints(spec, vals))


def random_poly_fast(spec: FieldSpec, nprng, num_vars: int) -> jnp.ndarray:
    """Uniform random Montgomery table via vectorized numpy rejection
    sampling (a uniform residue IS a uniform Montgomery encoding); avoids
    the per-element Python-int path of random_poly for big benches."""
    n = 1 << num_vars
    nl = spec.n_limbs
    pl = np.array(spec.p_limbs, dtype=np.uint32)
    out = np.zeros((n, nl), dtype=np.uint32)
    need = np.ones(n, dtype=bool)
    top_bits = spec.modulus.bit_length() - 16 * (nl - 1)
    top_mask = (1 << min(16, max(top_bits, 1))) - 1
    while need.any():
        k = int(need.sum())
        cand = nprng.integers(0, 1 << 16, size=(k, nl)).astype(np.uint32)
        cand[:, nl - 1] &= top_mask  # cheap cut: halves the rejection rate
        # lexicographic cand < p, most-significant limb first
        lt = np.zeros(k, dtype=bool)
        decided = np.zeros(k, dtype=bool)
        for i in range(nl - 1, -1, -1):
            is_lt = ~decided & (cand[:, i] < pl[i])
            is_gt = ~decided & (cand[:, i] > pl[i])
            lt |= is_lt
            decided |= is_lt | is_gt
        idx = np.flatnonzero(need)
        ok = lt  # undecided == equal to p -> reject
        out[idx[ok]] = cand[ok]
        need[idx[ok]] = False
    return jnp.asarray(out)


def split_lo(poly: jnp.ndarray) -> tuple:
    """Split on the LOWEST variable: (p|x0=0, p|x0=1) = (evens, odds)."""
    return poly[0::2], poly[1::2]


def split_hi(poly: jnp.ndarray) -> tuple:
    """Split on the HIGHEST variable: (first half, second half)."""
    m = poly.shape[0] // 2
    return poly[:m], poly[m:]


def interleave_lo(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inverse of split_lo."""
    return jnp.stack([a, b], axis=1).reshape(-1, *a.shape[1:])


def concat_hi(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inverse of split_hi."""
    return jnp.concatenate([a, b], axis=0)
