"""Legacy round-driven protocol API.

The reference keeps two protocol generations (SURVEY.md §1); the legacy one
(src/protocol/protocol.rs:36-103) drives provers challenge-by-challenge:
the caller owns the transcript and pumps ``prover.round(challenge) ->
Option<(claims, proof)>`` until completion, with ``ProtocolVerifier::round``
mirroring.  Instead of re-implementing every protocol twice, this module
adapts ANY of the framework's one-shot (Protocol2-style) protocols into the
round-driven shape with a transcript pump: the protocol runs on a worker
thread against a transcript whose challenges are injected by the caller and
whose written messages stream back as per-round proof chunks.

PolynomialMapping mirrors protocol.rs:7-13 (an Arc'd dynamic map annotated
with degree/num_i/num_o) as a thin AlgFn wrapper.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Callable, List, Optional, Sequence, Tuple

from ..ops.field.spec import FR, FieldSpec
from ..ops.poly.algfn import AlgFn
from ..utils.transcript import Transcript


@dataclasses.dataclass
class PolynomialMapping:
    """Dynamic polynomial map + (degree, num_i, num_o) (protocol.rs:7-13)."""

    exec_fn: Callable
    degree: int
    num_i: int
    num_o: int

    @classmethod
    def from_algfn(cls, fn: AlgFn) -> "PolynomialMapping":
        return cls(exec_fn=fn.fn, degree=fn.deg, num_i=fn.n_ins, num_o=fn.n_outs)

    def to_algfn(self, name: str = "mapping") -> AlgFn:
        return AlgFn(
            fn=self.exec_fn,
            deg=self.degree,
            n_ins=self.num_i,
            n_outs=self.num_o,
            name=name,
        )


class _PumpProverTranscript(Transcript):
    """Prover transcript whose challenges come from the caller (via queues)
    rather than the sponge — the legacy trust model, where the caller's
    outer transcript supplies randomness (src/transcript.rs:27-68)."""

    def __init__(self, label: bytes, in_q: queue.Queue, out_q: queue.Queue):
        super().__init__(label)
        self._in_q = in_q
        self._out_q = out_q
        self._flushed = 0

    def _flush_chunk(self) -> bytes:
        chunk = bytes(self._proof[self._flushed :])
        self._flushed = len(self._proof)
        return chunk

    def challenge(self, bits: int, spec: FieldSpec = FR) -> int:
        self._out_q.put(("need", self._flush_chunk()))
        v = self._in_q.get()
        return v % spec.modulus


class _PumpVerifierTranscript(Transcript):
    def __init__(self, label: bytes, proof: bytes, in_q: queue.Queue, out_q: queue.Queue):
        super().__init__(label, proof=proof)
        self._in_q = in_q
        self._out_q = out_q

    def challenge(self, bits: int, spec: FieldSpec = FR) -> int:
        self._out_q.put(("need", b""))
        v = self._in_q.get()
        return v % spec.modulus


class RoundDrivenProver:
    """protocol.rs:56-76 ProtocolProver: `round(challenge)` returns None
    while the protocol still wants challenges, and (claims, proof) once
    done.  Proof chunks written between challenges accumulate into the same
    byte stream the one-shot API would produce with those challenges."""

    def __init__(self, protocol, claims, advice, label: bytes = b"legacy"):
        self._in_q: queue.Queue = queue.Queue()
        self._out_q: queue.Queue = queue.Queue()
        self._tr = _PumpProverTranscript(label, self._in_q, self._out_q)
        self.proof_chunks: List[bytes] = []

        def work():
            try:
                out = protocol.prove(self._tr, claims, advice)
                claims_out = out[0] if isinstance(out, tuple) else out
                self._out_q.put(("done", self._tr._flush_chunk(), claims_out))
            except BaseException as e:  # noqa: BLE001 - surfaced in round()
                self._out_q.put(("error", e))

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()
        self._pump_until_wait()
        assert not self.done, "protocol drew no challenges"

    def _pump_until_wait(self):
        tag, *rest = self._out_q.get()
        if tag == "error":
            raise rest[0]
        if tag == "need":
            self.proof_chunks.append(rest[0])
            self.done = False
            self._final = None
        else:
            self.proof_chunks.append(rest[0])
            self.done = True
            self._final = rest[1]

    def round(self, challenge: int) -> Optional[Tuple[object, bytes]]:
        assert not self.done, "protocol already finished"
        self._in_q.put(challenge)
        self._pump_until_wait()
        if self.done:
            return self._final, b"".join(self.proof_chunks)
        return None


class RoundDrivenVerifier:
    """protocol.rs:78-103 ProtocolVerifier over a complete proof stream."""

    def __init__(self, protocol, claims, proof: bytes, label: bytes = b"legacy"):
        self._in_q: queue.Queue = queue.Queue()
        self._out_q: queue.Queue = queue.Queue()
        self._tr = _PumpVerifierTranscript(label, proof, self._in_q, self._out_q)

        def work():
            try:
                out = protocol.verify(self._tr, claims)
                self._tr.assert_end()
                self._out_q.put(("done", out))
            except BaseException as e:  # noqa: BLE001
                self._out_q.put(("error", e))

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()
        self._pump()
        assert not self.done, "protocol drew no challenges"

    def _pump(self):
        tag, *rest = self._out_q.get()
        if tag == "error":
            raise rest[0]
        if tag == "need":
            self.done = False
            self._final = None
        else:
            self.done = True
            self._final = rest[0]

    def round(self, challenge: int) -> Optional[object]:
        assert not self.done, "protocol already finished"
        self._in_q.put(challenge)
        self._pump()
        return self._final if self.done else None
