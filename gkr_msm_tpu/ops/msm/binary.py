"""Binary MSM: scalars are bits; precomputed subset-sum tables.

Port of /root/reference/src/binary_msm.rs: bases are chunked into groups of
gamma; all 2^gamma - 1 subset sums are precomputed (prepare_bases,
binary_msm.rs:32-49); bit-coefficients pack into per-chunk indices
(prepare_coefs, :51-53); the MSM is then one table lookup + add per chunk
(binary_msm, :19-29).  On device the lookups are a single gather and the
adds a log-tree reduction.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import bls12381 as g1


def prepare_bases_host(bases: Sequence, gamma: int) -> List:
    """Host subset-sum tables: for each chunk of gamma bases, entries
    table[m] = sum of bases[i] where bit i of m is set (m in 0..2^gamma);
    entry 0 is the identity (binary_msm.rs:32-49)."""
    tables = []
    for off in range(0, len(bases), gamma):
        chunk = bases[off : off + gamma]
        entries = [None]
        for m in range(1, 1 << gamma):
            low = m & (m - 1)
            bit = (m ^ low).bit_length() - 1
            entries.append(
                g1.Host.add(entries[low], chunk[bit])
                if bit < len(chunk)
                else entries[low]
            )
        tables.append(entries)
    return tables


def prepare_bases(bases: Sequence, gamma: int) -> jnp.ndarray:
    """-> device (n_chunks, 2^gamma, 3, L) projective subset-sum tables."""
    tables = prepare_bases_host(bases, gamma)
    return jnp.asarray(
        np.stack([g1.encode_affine_to_proj(t) for t in tables])
    )


def prepare_coefs(bits: Sequence[int], gamma: int) -> np.ndarray:
    """Pack bit coefficients into per-chunk table indices (binary_msm.rs:51-53)."""
    n_chunks = (len(bits) + gamma - 1) // gamma
    out = np.zeros(n_chunks, dtype=np.int64)
    for i, b in enumerate(bits):
        if b:
            out[i // gamma] |= 1 << (i % gamma)
    return out


@jax.jit
def _binary_msm_device(tables: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    sel = tables[jnp.arange(tables.shape[0]), idx]  # (n_chunks, 3, L)
    m = sel.shape[0]
    while m > 1:
        if m % 2 == 1:
            sel = jnp.concatenate([sel, g1.g1_neutral((1,))], axis=0)
            m += 1
        sel = g1.g1_add(sel[0::2], sel[1::2])
        m //= 2
    return sel[0]


def binary_msm(tables: jnp.ndarray, bits: Sequence[int], gamma: int):
    """MSM of bit-scalars against prepared tables -> host affine."""
    idx = prepare_coefs(bits, gamma)
    assert idx.shape[0] == tables.shape[0]
    out = _binary_msm_device(tables, jnp.asarray(idx))
    return g1.decode_proj(out[None])[0]
