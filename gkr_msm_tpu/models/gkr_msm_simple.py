"""Legacy bit-decomposition MSM GKR ("gkr_msm_simple").

Capability-equivalent rebuild of /root/reference/src/gkr_msm_simple.rs:86-318:
scalars arrive as bit matrices; bit columns are committed with the binary
(subset-sum table) MSM and the packed point column with a regular MSM
(gkr_msm_simple.rs:119-148); the witness is the flattened ``bit ? point :
neutral`` table (``pt_bit_choice``, gkr_msm_simple.rs:82-84), and a bintree
GKR of [base map, split(2), affine L1-L3, then (split(3), proj L1-L3) x
(log_num_points - 1)] (gkr_msm_simple.rs:248-269) reduces output claims to
claims about the committed base polynomials.

TPU-native deviations (documented): layers are the framework's one-shot
DenseDeg2Sumcheck / SplitAt objects driven by the cleanup-style GKR driver
(models/gkr.py) rather than the reference's round-pumped BintreeProver —
the round-driven shape is recovered for API parity by wrapping
``GkrMsmSimpleProtocol`` in ``models.legacy.RoundDrivenProver`` (the
reference pumps rounds at gkr_msm_simple.rs:311-318).  Commitments are
device MSMs (ops/msm/{binary,pippenger}.py).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.curve import bandersnatch as bs
from ..ops.field import limbs as fl
from ..ops.field.spec import FQ, FR
from ..ops.msm import binary as bmsm
from ..ops.msm import pippenger as msm
from ..ops.poly import mle
from ..ops.poly.algfn import AlgFn, apply_fn, id_algfn
from ..utils.transcript import Transcript
from . import gkr
from .sumcheck import (
    SUMCHECK_CHALLENGE_BITS,
    DenseDeg2Sumcheck,
    SinglePointClaims,
)

P = FR.modulus


# -- the base gate: b ? P : neutral  (gkr_msm_simple.rs:82-84) -----------------

def _pt_bit_choice(args):
    b, x, y = args
    one = fl.ones_mont(FR, y.shape[:-1])
    return [
        fl.mul(FR, b, x),
        fl.add(FR, fl.mul(FR, b, fl.sub(FR, y, one)), one),
    ]


PT_BIT_CHOICE = AlgFn(
    _pt_bit_choice, deg=2, n_ins=3, n_outs=2, name="pt_bit_choice",
    ops_fn=lambda o, args: [
        o.mul(args[0], args[1]),
        o.add(o.mul(args[0], o.sub(args[2], o.one())), o.one()),
    ],
)


# -- commitment key (gkr_msm_simple.rs:36-71) -----------------------------------

@dataclasses.dataclass
class CommitmentKey:
    """bases + binary subset-sum tables + gamma (gkr_msm_simple.rs:36-44).
    Unlike the reference (load/dump are todo!(), :51-57) the underlying
    tables can be rebuilt from any host base list deterministically."""

    bases_dev: jnp.ndarray  # (col_size, 3, L) G1 projective
    binary_tables: jnp.ndarray  # (n_chunks, 2^gamma, 3, L)
    gamma: int

    @classmethod
    def new(cls, rng, col_size: int, gamma: int = 6) -> "CommitmentKey":
        from ..ops.curve import bls12381 as g1

        bases = [g1.Host.random_point(rng) for _ in range(col_size)]
        return cls(
            bases_dev=msm.encode_points_device(bases),
            binary_tables=bmsm.prepare_bases(bases, gamma),
            gamma=gamma,
        )

    def commit_vec(self, vals: Sequence[int]):
        limbs = msm.scalars_ints_to_limbs(list(vals))
        return msm.msm_host_result(self.bases_dev[: limbs.shape[0]], limbs)

    def commit_bitvec(self, bits: Sequence[int]):
        return bmsm.binary_msm(self.binary_tables, list(bits), self.gamma)


# -- proof container (gkr_msm_simple.rs:74-80) ----------------------------------

@dataclasses.dataclass
class MSMProof:
    bit_columns: list
    point_column: object
    output: List[List[int]]  # 3 output coordinate polys (standard ints)


def _layer_schedule(log_num_points: int, log_num_scalar_bits: int):
    """[(layer, input_num_vars)] mirroring gkr_msm_simple.rs:248-269."""
    nv = log_num_points + log_num_scalar_bits
    layers = [
        (DenseDeg2Sumcheck(fn=PT_BIT_CHOICE, num_vars=nv), nv),
        (gkr.SplitAt(gkr.LO(0), 2, P), None),
        (DenseDeg2Sumcheck(fn=bs.AFFINE_L1, num_vars=nv - 1), nv - 1),
        (DenseDeg2Sumcheck(fn=bs.AFFINE_L2, num_vars=nv - 1), nv - 1),
        (DenseDeg2Sumcheck(fn=bs.AFFINE_L3, num_vars=nv - 1), nv - 1),
    ]
    for k in range(log_num_points - 1):
        v = nv - 2 - k
        layers.append((gkr.SplitAt(gkr.LO(0), 3, P), None))
        layers.append((DenseDeg2Sumcheck(fn=bs.PROJ_L1, num_vars=v), v))
        layers.append((DenseDeg2Sumcheck(fn=bs.PROJ_L2, num_vars=v), v))
        layers.append((DenseDeg2Sumcheck(fn=bs.PROJ_L3, num_vars=v), v))
    return layers


def build_witness(
    bits_flat: np.ndarray,  # (size,) 0/1
    points: Sequence[Tuple[int, int]],
    log_num_points: int,
    log_num_scalar_bits: int,
):
    """All layer inputs (advice list aligned with _layer_schedule) + outputs.

    Mirrors BintreeProtocol::witness over the legacy layer queue
    (gkr_msm_simple.rs:273, protocol/bintree.rs:168-184)."""
    num_scalar_bits = 1 << log_num_scalar_bits
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    px = jnp.asarray(
        np.repeat(fl.encode_ints(FR, xs), num_scalar_bits, axis=0)
    )
    py = jnp.asarray(
        np.repeat(fl.encode_ints(FR, ys), num_scalar_bits, axis=0)
    )
    # bits are 0/1: Montgomery form is bit * one_mont (no REDC needed)
    one = np.asarray(FR.one_mont, dtype=np.uint32)
    bits_dev = jnp.asarray(bits_flat[:, None].astype(np.uint32) * one[None, :])

    cur = [bits_dev, px, py]
    advices: List[Optional[list]] = []
    advices.append(list(cur))
    cur = apply_fn(PT_BIT_CHOICE, cur)
    advices.append(None)  # split(2)
    cur = gkr.algfn_map_split(cur, id_algfn(2), gkr.LO(0), 2)
    for fn in (bs.AFFINE_L1, bs.AFFINE_L2, bs.AFFINE_L3):
        advices.append(list(cur))
        cur = apply_fn(fn, cur)
    for _ in range(log_num_points - 1):
        advices.append(None)  # split(3)
        cur = gkr.algfn_map_split(cur, id_algfn(3), gkr.LO(0), 3)
        for fn in (bs.PROJ_L1, bs.PROJ_L2, bs.PROJ_L3):
            advices.append(list(cur))
            cur = apply_fn(fn, cur)
    return advices, cur  # outputs: [X, Y, Z] of size 2^log_num_scalar_bits


@dataclasses.dataclass
class GkrMsmSimpleProtocol:
    """One-shot protocol shape (wrap in legacy.RoundDrivenProver/-Verifier
    for the reference's round-pumped API, protocol/protocol.rs:56-103)."""

    log_num_points: int
    log_num_scalar_bits: int

    def prove(self, tr: Transcript, claims: SinglePointClaims, advices):
        layers = [l for l, _ in _layer_schedule(self.log_num_points, self.log_num_scalar_bits)]
        return gkr.gkr_prove(tr, layers, claims, advices), None

    def verify(self, tr: Transcript, claims: SinglePointClaims):
        layers = [l for l, _ in _layer_schedule(self.log_num_points, self.log_num_scalar_bits)]
        return gkr.gkr_verify(tr, layers, claims)


def gkr_msm_prove(
    scalars: Sequence[Sequence[int]],  # bit matrix per point (0/1)
    points: Sequence[Tuple[int, int]],  # affine Bandersnatch
    log_num_points: int,
    log_num_scalar_bits: int,
    log_num_bit_columns: int,
    ck: CommitmentKey,
    tr: Transcript,
):
    """-> (final_claims about [bits, px, py], MSMProof)
    (gkr_msm_simple.rs:86-318)."""
    from ..ops.curve import bls12381 as g1

    num_points = 1 << log_num_points
    num_scalar_bits = 1 << log_num_scalar_bits
    size = num_points * num_scalar_bits
    num_bit_columns = 1 << log_num_bit_columns
    col_size = size >> log_num_bit_columns
    assert len(points) == num_points and len(scalars) == num_points
    assert all(len(s) == num_scalar_bits for s in scalars)
    assert col_size >= 2 * num_points, (
        "Points should fit in a single column. Please reduce the amount of columns."
    )

    bits_flat = np.asarray(
        [b for s in scalars for b in s], dtype=np.uint32
    )
    bit_comms = []
    for i in range(num_bit_columns):
        comm = ck.commit_bitvec(bits_flat[col_size * i : col_size * (i + 1)])
        tr.write_points([comm], FQ)
        bit_comms.append(comm)
    pts_prep = (
        [p[0] for p in points]
        + [p[1] for p in points]
        + [0] * (col_size - 2 * num_points)
    )
    pts_comm = ck.commit_vec(pts_prep)
    tr.write_points([pts_comm], FQ)

    advices, outputs = build_witness(
        bits_flat, points, log_num_points, log_num_scalar_bits
    )
    output_ints = [fl.decode_ints(FR, np.asarray(o)) for o in outputs]
    for o in output_ints:
        tr.write_scalars(o)
    claim_point = tr.challenge_vec(log_num_scalar_bits, SUMCHECK_CHALLENGE_BITS)
    claim_evals = [mle.evaluate(FR, o, claim_point) for o in outputs]
    claims = SinglePointClaims(point=claim_point, evs=claim_evals)

    proto = GkrMsmSimpleProtocol(log_num_points, log_num_scalar_bits)
    final_claims, _ = proto.prove(tr, claims, advices)
    return final_claims, MSMProof(
        bit_columns=bit_comms, point_column=pts_comm, output=output_ints
    )


def _evaluate_host(evals: Sequence[int], point: Sequence[int]) -> int:
    """MLE evaluation over host ints (reverse-order binds, dense.rs:21-30)."""
    cur = [v % P for v in evals]
    for t in reversed(list(point)):
        cur = [
            (cur[2 * i] + t * (cur[2 * i + 1] - cur[2 * i])) % P
            for i in range(len(cur) // 2)
        ]
    return cur[0]


def gkr_msm_verify(
    log_num_points: int,
    log_num_scalar_bits: int,
    log_num_bit_columns: int,
    tr: Transcript,
):
    """Mirror of gkr_msm_prove: re-reads commitments + outputs, replays the
    GKR, returns (final claims about the base polys, MSMProof).  As in the
    reference, the base-poly claims are returned unopened (gkr_msm_simple
    has no PCS-opening phase — the commitments bind the witness)."""
    from ..ops.curve import bls12381 as g1

    num_bit_columns = 1 << log_num_bit_columns
    bit_comms = [tr.read_points(1, FQ)[0] for _ in range(num_bit_columns)]
    pts_comm = tr.read_points(1, FQ)[0]
    nb = 1 << log_num_scalar_bits
    output_ints = [tr.read_scalars(nb) for _ in range(3)]
    claim_point = tr.challenge_vec(log_num_scalar_bits, SUMCHECK_CHALLENGE_BITS)
    claim_evals = [_evaluate_host(o, claim_point) for o in output_ints]
    claims = SinglePointClaims(point=claim_point, evs=claim_evals)
    proto = GkrMsmSimpleProtocol(log_num_points, log_num_scalar_bits)
    final_claims = proto.verify(tr, claims)
    return final_claims, MSMProof(
        bit_columns=bit_comms, point_column=pts_comm, output=output_ints
    )
