"""One-dispatch Fiat–Shamir sponge round (SHA-256) as a Pallas kernel.

The fused prover's per-round serial floor is the sponge: absorb(96-byte
message) + squeeze128 + ratchet = 5 SHA-256 compressions, which as traced
XLA scalar HLOs cost ~milliseconds per round of pure op-dispatch overhead
(the round-1 breakdown measured ~10 ms/round of serial scalar latency —
scripts/tpu_tail_anatomy.py).  Here the whole round runs as ONE Mosaic
kernel of straight-line uint32 register ops — byte-exact with
utils/sha256_jnp.py (asserted in tests/test_pallas_sumcheck.py).

The reference has no analog (merlin is host-only, proof_transcript.rs:76).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.sha256_jnp import _IV, _K
from . import field_kernels as fk


def _rotr(x, n: int):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def _compress_words(state8, block16):
    """Fully unrolled SHA-256 compression on (1, 1) uint32 values."""
    w = list(block16)
    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> jnp.uint32(3))
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> jnp.uint32(10))
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    a, b, c, d, e, f, g, h = state8
    for t in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + jnp.uint32(int(_K[t])) + w[t]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        mj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + mj
        a, b, c, d, e, f, g, h = t1 + t2, a, b, c, d + t1, e, f, g
    return [x + y for x, y in zip(state8, [a, b, c, d, e, f, g, h])]


def _const(v: int):
    return jnp.full((1, 1), np.uint32(v), jnp.uint32)


def _iv():
    return [_const(int(v)) for v in _IV]


def _pad_block(words, total_bytes: int):
    """words (list of (1,1), any partial last word left-aligned) -> one
    padded 16-word block (static layout; mirrors shj._pad_single_block)."""
    assert total_bytes + 9 <= 64
    blk = list(words) + [_const(0)] * (16 - len(words))
    pad_word_idx = total_bytes // 4
    shift = (3 - (total_bytes % 4)) * 8
    blk[pad_word_idx] = blk[pad_word_idx] | _const(0x80 << shift)
    blk[15] = blk[15] | _const(total_bytes * 8)
    return blk[:16]


def _sponge_round_kernel(state_ref, payload_ref, out_ref):
    st = [state_ref[i : i + 1, :] for i in range(8)]
    pw = [payload_ref[i : i + 1, :] for i in range(24)]
    # absorb: sha256(state || payload) = 128 bytes -> 2 blocks + pad block
    msg = st + pw
    s = _compress_words(_iv(), msg[:16])
    s = _compress_words(s, msg[16:32])
    pad_blk = [_const(0x80000000)] + [_const(0)] * 13 + [_const(0), _const(1024)]
    s2 = _compress_words(s, pad_blk)
    # squeeze: sha256(state' || "squeeze" || ctr0_le) = 43 bytes, one block
    sq_words = s2 + [_const(0x73717565), _const(0x657A6500), _const(0)]
    dig = _compress_words(_iv(), _pad_block(sq_words, 43))
    # ratchet: sha256(state' || "ratchet") = 39 bytes, one block
    # 'ratchet' = 72 61 74 63 | 68 65 74 (w9's low byte is SHA padding)
    ra_words = s2 + [_const(0x72617463), _const(0x68657400)]
    ra = _compress_words(_iv(), _pad_block(ra_words, 39))
    out = dig[:4] + ra
    for i in range(12):
        out_ref[i : i + 1, :] = out[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sponge_round(state: jnp.ndarray, payload: jnp.ndarray, interpret: bool | None = None):
    """(state (8,), payload (24,) BE words) -> (digest4 (4,), state' (8,)).

    Byte-exact mirror of shj.absorb(state, payload, 96) followed by
    shj.squeeze128_and_ratchet — one Pallas dispatch."""
    if interpret is None:
        interpret = fk._INTERPRET
    full = lambda k: pl.BlockSpec((k, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _sponge_round_kernel,
        out_shape=jax.ShapeDtypeStruct((12, 1), jnp.uint32),
        in_specs=[full(8), full(24)],
        out_specs=full(12),
        interpret=interpret,
    )(state.reshape(8, 1), payload.reshape(24, 1))
    return out[:4, 0], out[4:, 0]


def should_use() -> bool:
    import os

    from . import sumcheck_kernels as sk

    if os.environ.get("GKR_MSM_PALLAS_SPONGE", "1") == "0":
        return False
    return sk.should_use_algebra()
