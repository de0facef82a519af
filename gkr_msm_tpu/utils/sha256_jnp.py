"""SHA-256 in jnp — the device-resident Fiat–Shamir sponge.

Byte-exact mirror of utils/transcript.py's host sponge (absorb =
``sha256(state || data)``, squeeze = ``sha256(state || b"squeeze" || ctr_le4)``
blocks + ratchet), so a prover can run its entire round loop in ONE jitted
device program and the host can replay the returned messages through its own
transcript with identical challenges.  This kills the per-round host↔device
dispatch latency that otherwise dominates sumcheck proving on remote TPU
runtimes (~20 ms/dispatch through a tunnel; two dispatches per round).

Everything is uint32 lane math on tiny (8,)/(16,) vectors — negligible device
time, and `lax.fori_loop` keeps the traced graph small.

The reference uses merlin/STROBE host-side (proof_transcript.rs:76-147);
a device sponge has no analog there — it is a TPU-native design choice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

_IV = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _compress(state: jnp.ndarray, block: jnp.ndarray) -> jnp.ndarray:
    """One SHA-256 compression: state (8,) uint32, block (16,) uint32 BE words."""

    def sched_body(t, w):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        return w.at[t].set(w[t - 16] + s0 + w[t - 7] + s1)

    w = jnp.zeros((64,), jnp.uint32).at[:16].set(block)
    w = jax.lax.fori_loop(16, 64, sched_body, w, unroll=16)
    k = jnp.asarray(_K)

    def round_body(t, v):
        a, b, c, d, e, f, g, h = v
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + k[t] + w[t]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        mj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + mj
        return (t1 + t2, a, b, c, d + t1, e, f, g)

    v = jax.lax.fori_loop(
        0, 64, round_body, tuple(state[i] for i in range(8)), unroll=16
    )
    return state + jnp.stack(v)


def sha256_words(words: jnp.ndarray, total_bytes: int) -> jnp.ndarray:
    """SHA-256 of a message given as BE uint32 words (zero-padded tail).

    words: (ceil(total_bytes/4),) uint32, big-endian packing of the byte
    stream; a final partial word must be left-aligned (high bytes used).
    total_bytes is static.  Returns the digest as (8,) uint32 BE words.
    """
    n_words = (total_bytes + 3) // 4
    assert words.shape[0] >= n_words
    # append the 0x80 terminator into the word stream
    pad_word_idx = total_bytes // 4
    shift = (3 - (total_bytes % 4)) * 8
    n_blocks = (total_bytes + 9 + 63) // 64
    msg = jnp.zeros((n_blocks * 16,), jnp.uint32)
    msg = msg.at[:n_words].set(words[:n_words])
    msg = msg.at[pad_word_idx].set(
        msg[pad_word_idx] | (jnp.uint32(0x80) << shift)
    )
    bitlen = total_bytes * 8
    msg = msg.at[n_blocks * 16 - 2].set(jnp.uint32(bitlen >> 32))
    msg = msg.at[n_blocks * 16 - 1].set(jnp.uint32(bitlen & 0xFFFFFFFF))
    state = jnp.asarray(_IV)
    for b in range(n_blocks):
        state = _compress(state, msg[16 * b : 16 * (b + 1)])
    return state


def _bytes_to_words_host(data: bytes) -> np.ndarray:
    pad = (-len(data)) % 4
    d = data + b"\x00" * pad
    return np.frombuffer(d, dtype=">u4").astype(np.uint32)


# -----------------------------------------------------------------------------
# sponge ops mirroring utils/transcript.py
# -----------------------------------------------------------------------------

_SQUEEZE_TAG = _bytes_to_words_host(b"squeeze")  # 7 bytes -> 2 words (last partial)
_RATCHET_WORDS = _bytes_to_words_host(b"ratchet")  # 7 bytes


def absorb(state: jnp.ndarray, payload_words: jnp.ndarray, payload_bytes: int) -> jnp.ndarray:
    """state' = sha256(state_bytes || payload); payload length must be a
    multiple of 4 bytes (true for all scalar/point messages)."""
    assert payload_bytes % 4 == 0
    words = jnp.concatenate([state, payload_words[: payload_bytes // 4]])
    return sha256_words(words, 32 + payload_bytes)


def squeeze128_and_ratchet(state: jnp.ndarray):
    """Mirror Transcript._squeeze(16): one counter block, then ratchet.

    Returns (digest16_words (4,) uint32 BE of the first 16 bytes,
    new_state (8,)).
    """
    # sha256(state || b"squeeze" || (0).to_bytes(4, "little")): 43 bytes.
    # "squeeze" = 73 71 75 65 65 7a 65; counter LE bytes 00 00 00 00.
    # byte layout after state: words are BE packings of that stream.
    tail = jnp.asarray(
        np.array(
            [
                0x73717565,  # 's q u e'
                0x657A6500,  # 'e z e' 00
                0x00000000,  # 00 00 00 (counter) -> last byte in next word
            ],
            dtype=np.uint32,
        )
    )
    # both messages fit one block; the two compressions are independent, so
    # run them as a single vmapped batch (halves the sponge's serial latency)
    blk_sq = _pad_single_block(jnp.concatenate([state, tail]), 43)
    blk_ra = _pad_single_block(
        jnp.concatenate([state, jnp.asarray(_RATCHET_WORDS)]), 39
    )
    iv = jnp.broadcast_to(jnp.asarray(_IV), (2, 8))
    out = jax.vmap(_compress)(iv, jnp.stack([blk_sq, blk_ra]))
    return out[0, :4], out[1]


def _pad_single_block(words: jnp.ndarray, total_bytes: int) -> jnp.ndarray:
    """SHA padding of a <56-byte message into one 16-word block."""
    assert total_bytes + 9 <= 64
    n_words = (total_bytes + 3) // 4
    pad_word_idx = total_bytes // 4
    shift = (3 - (total_bytes % 4)) * 8
    msg = jnp.zeros((16,), jnp.uint32).at[:n_words].set(words[:n_words])
    msg = msg.at[pad_word_idx].set(msg[pad_word_idx] | (jnp.uint32(0x80) << shift))
    return msg.at[15].set(jnp.uint32(total_bytes * 8))


def initial_state_host(label: bytes) -> np.ndarray:
    """Host-computed initial sponge state (matches Transcript.__init__)."""
    import hashlib

    d = hashlib.sha256(b"gkr-msm-tpu/v1//" + label).digest()
    return np.frombuffer(d, dtype=">u4").astype(np.uint32)


def state_from_host(digest: bytes) -> np.ndarray:
    return np.frombuffer(digest, dtype=">u4").astype(np.uint32)
