"""GKR-logup fraction-addition tree (main phase).

Port of /root/reference/src/cleanup/protocols/pushforward/logup_mainphase.rs:
pairs (numerator, denominator) of non-increasing logsizes are merged down a
fraction-addition tree with LogupLayerFn (ad+bc, bd); the prove loop
alternates DenseEqSumcheckNaive layers with SplitAt(HI(0), 2) folds,
emitting side claims whenever a smaller input joins.  Total checked as
num == denom * claim.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly.algfn import AlgFn, apply_fn
from ..utils.transcript import Transcript
from . import gkr
from .gkr import HI, SplitAt
from .sumcheck import DenseEqSumcheckNaive, SinglePointClaims

P = FR.modulus


def _logup_layer(args):
    a, b, c, d = args
    spec = FR
    return [
        fl.add(spec, fl.mul(spec, a, d), fl.mul(spec, b, c)),  # ad + bc
        fl.mul(spec, b, d),  # bd
    ]


LOGUP_LAYER_FN = AlgFn(_logup_layer, deg=2, n_ins=4, n_outs=2, name="logup_layer")


@dataclasses.dataclass
class LogupMainphase:
    """logsizes must be non-increasing, with logsizes[0] == logsizes[1]."""

    logsizes: List[int]
    spec: FieldSpec = FR

    def __post_init__(self):
        assert len(self.logsizes) > 1
        for i in range(len(self.logsizes) - 1):
            assert self.logsizes[i] >= self.logsizes[i + 1]
        assert self.logsizes[0] == self.logsizes[1]

    def make_witness(self, inputs: List[Tuple[jnp.ndarray, jnp.ndarray]]):
        """-> (layers, (num, denom) host ints).  inputs[i] = (num, den) device
        arrays of size 2^logsizes[i] (logup_mainphase.rs:85-137)."""
        for (n, d), ls in zip(inputs, self.logsizes):
            assert n.shape[0] == 1 << ls and d.shape[0] == 1 << ls
        stack = list(reversed(inputs))
        layers: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
        layers.append(stack.pop())
        layers.append(stack.pop())
        i = 0
        while True:
            next_size = stack[-1][0].shape[0] if stack else 1
            curr_size = layers[i][0].shape[0]
            a0, a1 = layers[i], layers[i + 1]
            if curr_size == next_size:
                out = apply_fn(LOGUP_LAYER_FN, [a0[0], a0[1], a1[0], a1[1]])
                layers.append((out[0], out[1]))
                if stack:
                    layers.append(stack.pop())
                else:
                    break
                i += 2
            elif curr_size > next_size:
                out = apply_fn(LOGUP_LAYER_FN, [a0[0], a0[1], a1[0], a1[1]])
                half = out[0].shape[0] // 2
                layers.append((out[0][:half], out[1][:half]))
                layers.append((out[0][half:], out[1][half:]))
                i += 2
            else:
                raise AssertionError("logsizes not non-increasing")
        final = layers.pop()
        assert final[0].shape[0] == 1 and final[1].shape[0] == 1
        num = fl.decode_ints(self.spec, final[0][0])[0]
        den = fl.decode_ints(self.spec, final[1][0])[0]
        return layers, (num, den)

    def prove(self, tr: Transcript, claim: int, inputs):
        """claim: the expected total fraction sum.  Returns side claims
        [cd, ..., smallest] reversed to match input order."""
        witness, (num, den) = self.make_witness(inputs)
        assert den != 0
        assert num == den * claim % P
        tr.write_scalars([num, den])
        return self._main_cycle(tr, num, den, prover_witness=witness), None

    def verify(self, tr: Transcript, claim: int):
        num, den = tr.read_scalars(2)
        assert den != 0
        assert num == den * claim % P
        return self._main_cycle(tr, num, den, prover_witness=None)

    def _main_cycle(self, tr, num, den, prover_witness):
        logsizes = list(self.logsizes)
        curr_logsize = 0
        running = SinglePointClaims(point=[], evs=[num, den])
        accumulated: List[SinglePointClaims] = []
        split = SplitAt(HI(0), 2, P)
        while True:
            incoming = logsizes[-1]
            proto = DenseEqSumcheckNaive(LOGUP_LAYER_FN, curr_logsize, self.spec)
            if prover_witness is not None:
                r0 = prover_witness.pop()
                l0 = prover_witness.pop()
                advice = [l0[0], l0[1], r0[0], r0[1]]
                claim_4, _ = proto.prove(tr, running, advice)
            else:
                claim_4 = proto.verify(tr, running)
            if incoming == curr_logsize:
                if len(logsizes) == 2:
                    final = claim_4
                    break
                running = SinglePointClaims(
                    point=list(claim_4.point), evs=claim_4.evs[:2]
                )
                accumulated.append(
                    SinglePointClaims(point=list(claim_4.point), evs=claim_4.evs[2:])
                )
                logsizes.pop()
            else:
                running = split.prove_layer(tr, claim_4, None)
                curr_logsize += 1
        accumulated.append(final)
        accumulated.reverse()
        return accumulated
