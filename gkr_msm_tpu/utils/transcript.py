"""Fiat–Shamir transcript: combined proof byte-stream + hash sponge.

TPU-native analog of the reference's ``ProofTranscript2``
(/root/reference/src/cleanup/proof_transcript.rs:17-147): the prover's
``write_*`` appends bytes to the proof AND absorbs them into the sponge; the
verifier's ``read_*`` consumes the same bytes and re-absorbs, so challenges
agree iff the byte streams agree.  Challenges are drawn at explicit bit
widths (128-bit sumcheck challenges, proof_transcript.rs:8; 512-bit wide
draws reduced mod p, pushforward.rs:689).

The sponge here is SHA-256 in a simple chain/expand construction rather than
merlin's STROBE — the proof format is therefore self-consistent but not
byte-identical to the Rust reference (documented deviation; the protocol
*structure* matches).  In a multi-host deployment every host runs this
identical deterministic state machine, so challenges agree with zero
communication (SURVEY.md §5).

Encoding: field scalars little-endian fixed width (32B for 255-bit fields,
48B for FQ); G1/affine points as x||y with (0,0) = infinity.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence

from ..ops.field.spec import FR, FieldSpec


def _width_bytes(spec: FieldSpec) -> int:
    return (spec.bits + 7) // 8


class Transcript:
    """Prover and verifier transcript (mode chosen by `proof` arg)."""

    def __init__(self, label: bytes, proof: Optional[bytes] = None):
        self._state = hashlib.sha256(b"gkr-msm-tpu/v1//" + label).digest()
        if proof is None:
            self._mode = "prover"
            self._proof = bytearray()
        else:
            self._mode = "verifier"
            self._proof = proof
            self._cursor = 0
        self.time_records: List[float] = []

    # -- sponge core ----------------------------------------------------------
    def _absorb(self, data: bytes) -> None:
        self._state = hashlib.sha256(self._state + data).digest()

    def _squeeze(self, n_bytes: int) -> bytes:
        out = b""
        counter = 0
        while len(out) < n_bytes:
            out += hashlib.sha256(
                self._state + b"squeeze" + counter.to_bytes(4, "little")
            ).digest()
            counter += 1
        self._state = hashlib.sha256(self._state + b"ratchet").digest()
        return out[:n_bytes]

    # -- raw msgs (proof_transcript.rs:115-136) -------------------------------
    def write_raw_msg(self, data: bytes) -> None:
        assert self._mode == "prover"
        self._proof += data
        self._absorb(data)

    def read_raw_msg(self, n_bytes: int) -> bytes:
        assert self._mode == "verifier"
        data = bytes(self._proof[self._cursor : self._cursor + n_bytes])
        assert len(data) == n_bytes, "proof stream exhausted"
        self._cursor += n_bytes
        self._absorb(data)
        return data

    # -- challenges -----------------------------------------------------------
    def challenge(self, bits: int, spec: FieldSpec = FR) -> int:
        """Draw a field element from `bits` sponge bits (reduced mod p)."""
        raw = self._squeeze((bits + 7) // 8)
        v = int.from_bytes(raw, "little")
        if bits % 8:
            v &= (1 << bits) - 1
        return v % spec.modulus

    def challenge_vec(self, n: int, bits: int, spec: FieldSpec = FR) -> List[int]:
        return [self.challenge(bits, spec) for _ in range(n)]

    # -- scalar IO ------------------------------------------------------------
    def write_scalars(self, vals: Sequence[int], spec: FieldSpec = FR) -> None:
        w = _width_bytes(spec)
        data = b"".join(int(v % spec.modulus).to_bytes(w, "little") for v in vals)
        self.write_raw_msg(data)

    def read_scalars(self, n: int, spec: FieldSpec = FR) -> List[int]:
        w = _width_bytes(spec)
        data = self.read_raw_msg(w * n)
        return [
            int.from_bytes(data[i * w : (i + 1) * w], "little") for i in range(n)
        ]

    # -- point IO (affine tuples or None) ------------------------------------
    def write_points(self, pts, spec: FieldSpec) -> None:
        w = _width_bytes(spec)
        blob = bytearray()
        for pt in pts:
            x, y = (0, 0) if pt is None else pt
            blob += int(x).to_bytes(w, "little") + int(y).to_bytes(w, "little")
        self.write_raw_msg(bytes(blob))

    def read_points(self, n: int, spec: FieldSpec):
        w = _width_bytes(spec)
        data = self.read_raw_msg(2 * w * n)
        pts = []
        for i in range(n):
            x = int.from_bytes(data[2 * i * w : (2 * i + 1) * w], "little")
            y = int.from_bytes(data[(2 * i + 1) * w : (2 * i + 2) * w], "little")
            pts.append(None if (x == 0 and y == 0) else (x, y))
        return pts

    # -- finalization ---------------------------------------------------------
    def end(self) -> bytes:
        assert self._mode == "prover"
        return bytes(self._proof)

    def assert_end(self) -> None:
        assert self._mode == "verifier"
        assert self._cursor == len(self._proof), (
            f"proof has {len(self._proof) - self._cursor} unread bytes"
        )

    def record_current_time(self) -> None:
        import time

        self.time_records.append(time.perf_counter())
