"""End-to-end Pippenger MSM proof pipeline.

Port of /root/reference/src/cleanup/protocols/pippenger.rs: witness
(PushForwardState + PippengerEndingWG over the glued image), the Pippenger
protocol (phase-1 comms -> ending GKR -> GlueSplit -> phase-2 comms ->
pushforward -> 4 opening claims -> MultiOpenReduction -> q-fold -> one
Knuckles opening, verified by a single pairing), and benchutils-style
helpers (build data / run / verify with the doubling-ladder MSM check).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..commitments.knuckles import KnucklesProvingKey, KnucklesVerifyingKey
from ..commitments import kzg as kzgm
from ..ops.curve import bandersnatch as bs
from ..ops.curve import bls12381 as g1
from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FQ, FR
from ..ops.poly import mle
from ..utils.tracing import span
from ..utils.transcript import Transcript
from . import gkr, triangle
from .gkr import GlueSplit
from .opening import KnucklesOpeningProtocol, MultiOpenReduction, OpeningClaim, PointClaim
from .pippenger_ending import PippengerBucketed, PippengerEndingWG
from .pushforward import PushForwardState, PushforwardFinalClaims, PushforwardProtocol
from .sumcheck import SUMCHECK_CHALLENGE_BITS, SinglePointClaims
from .verifier_polys import EqPoly

P = FR.modulus


class PippengerWG:
    """Full prover witness (pippenger.rs:30-71)."""

    def __init__(
        self,
        points,
        coefs,
        y_size,
        y_logsize,
        d_logsize,
        x_logsize,
        commitment_log_multiplicity,
        commitment_key: KnucklesProvingKey,
    ):
        with span("compute buckets and commit phase 1"):
            self.beginning = PushForwardState(
                points, coefs, y_size, y_logsize, d_logsize, x_logsize,
                commitment_log_multiplicity, commitment_key,
            )
        with span("ending witness (bintree + triangle)"):
            self.ending = PippengerEndingWG(
                y_logsize, d_logsize, x_logsize,
                GlueSplit.witness(self.beginning.image),
            )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _combine_matrix_witness(
    fold: jnp.ndarray, n_multirow: int, chunk: int, msize_padded: int,
    multirow_evs: jnp.ndarray,
):
    """sum_m multirow_evs[m] * fold[m*chunk : (m+1)*chunk] (pippenger.rs:209-223)."""
    pad = msize_padded - fold.shape[0]
    if pad:
        fold = jnp.concatenate(
            [fold, jnp.zeros((pad, fold.shape[1]), dtype=jnp.uint32)], axis=0
        )
    fold = fold.reshape(n_multirow, chunk, -1)
    w = fl.mul(FR, fold, multirow_evs[:, None, :])
    acc = w[0]
    for m in range(1, n_multirow):
        acc = fl.add(FR, acc, w[m])
    return acc


@dataclasses.dataclass
class Pippenger:
    """The composed protocol (pippenger.rs:115-407)."""

    y_size: int
    y_logsize: int
    d_logsize: int
    x_logsize: int
    vkey: KnucklesVerifyingKey
    commitment_log_multiplicity: int

    def __post_init__(self):
        assert self.x_logsize >= self.d_logsize
        assert self.y_logsize >= self.commitment_log_multiplicity
        self.beginning = PushforwardProtocol(
            x_logsize=self.x_logsize,
            y_logsize=self.y_logsize,
            y_size=self.y_size,
            d_logsize=self.d_logsize,
        )
        self.ending = PippengerBucketed(
            self.y_logsize, self.d_logsize, self.x_logsize
        )

    @property
    def num_matrix_comms(self) -> int:
        comm_mul = 1 << self.commitment_log_multiplicity
        return (self.y_size + comm_mul - 1) // comm_mul

    def _opening_points(self, matrix_pt, ac_c_point, ac_d_point):
        clm = self.commitment_log_multiplicity
        p_folded_point = [0] * clm + list(matrix_pt[self.y_logsize :])
        ac_c_pt = [0] * clm + list(ac_c_point)
        ac_d_pt = [0] * (self.x_logsize + clm - self.d_logsize) + list(ac_d_point)
        combined_pt = list(matrix_pt[self.y_logsize - clm :])
        return p_folded_point, ac_c_pt, ac_d_pt, combined_pt

    def prove(self, tr: Transcript, claims: SinglePointClaims, wg: PippengerWG):
        state = wg.beginning
        clm = self.commitment_log_multiplicity
        pc1 = state.phase_1_comm
        assert len(pc1.c) == self.num_matrix_comms

        tr.write_points(pc1.c, FQ)
        tr.write_points(pc1.d, FQ)
        tr.write_points([pc1.p_0], FQ)
        tr.write_points([pc1.p_1], FQ)
        tr.write_points([pc1.ac_c], FQ)
        tr.write_points([pc1.ac_d], FQ)

        with span("prove image part"):
            claims = self.ending.prove(tr, claims, wg.ending)
            claims = GlueSplit(P).prove_layer(tr, claims, None)

        with span("commit phase 2"):
            state.second_phase(claims.point)
        pc2 = state.phase_2_comm
        tr.write_points(pc2.c_pull, FQ)
        tr.write_points(pc2.d_pull, FQ)

        with span("prove pushforward"):
            final_claims, _ = self.beginning.prove(tr, claims, state)
        gamma = final_claims.gamma
        matrix_pt = final_claims.claims_about_matrix.point
        p_folded_ev, c_pull_ev, d_pull_ev, c_ev, d_ev = final_claims.claims_about_matrix.evs

        opener = KnucklesOpeningProtocol(vk=self.vkey, pk=state.key)

        p_folded_point, ac_c_pt, ac_d_pt, combined_pt = self._opening_points(
            matrix_pt, final_claims.claims_ac_c.point, final_claims.claims_ac_d.point
        )
        multirow_evs = EqPoly(
            self.y_logsize - clm, matrix_pt[: self.y_logsize - clm]
        ).evals()

        def combine_comms(comms):
            acc = None
            for coeff, comm in zip(multirow_evs, comms):
                term = g1.Host.scalar_mul(coeff, comm)
                acc = term if acc is None else g1.Host.add(acc, term)
            return acc

        c_comb = combine_comms(pc1.c)
        d_comb = combine_comms(pc1.d)
        c_pull_comb = combine_comms(pc2.c_pull)
        d_pull_comb = combine_comms(pc2.d_pull)

        u = tr.challenge(512)
        us = fh.make_gamma_pows(u, 4, P)
        combined_matrix_comm = g1.Host.add(
            g1.Host.add(c_comb, g1.Host.scalar_mul(us[1], d_comb)),
            g1.Host.add(
                g1.Host.scalar_mul(us[2], c_pull_comb),
                g1.Host.scalar_mul(us[3], d_pull_comb),
            ),
        )
        combined_evaluation = (
            c_ev + d_ev * us[1] + c_pull_ev * us[2] + d_pull_ev * us[3]
        ) % P

        # combined matrix witness on device
        x_size = 1 << self.x_logsize
        comm_mul = 1 << clm
        chunk = comm_mul * x_size
        n_multirow = self.num_matrix_comms
        u1 = mle.scalar(FR, us[1])
        u2 = mle.scalar(FR, us[2])
        u3 = mle.scalar(FR, us[3])
        fold = fl.add(
            FR,
            fl.add(FR, state.c_dev, fl.mul(FR, state.d_dev, u1[None])),
            fl.add(
                FR,
                fl.mul(FR, state.c_pull_dev, u2[None]),
                fl.mul(FR, state.d_pull_dev, u3[None]),
            ),
        )
        mr_evs_dev = jnp.asarray(fl.encode_ints(FR, multirow_evs[:n_multirow]))
        combined_witness = _combine_matrix_witness(
            fold, n_multirow, chunk, n_multirow * chunk, mr_evs_dev
        )

        # multiopen: 4 witnesses padded to 2^(x_logsize + clm)
        gamma_m = mle.scalar(FR, gamma)
        pfold_w = fl.add(FR, state.p0_dev, fl.mul(FR, state.p1_dev, gamma_m[None]))
        full = 1 << (self.x_logsize + clm)

        def zpad(a):
            n = a.shape[0]
            if n < full:
                a = jnp.concatenate(
                    [a, jnp.zeros((full - n, FR.n_limbs), dtype=jnp.uint32)], axis=0
                )
            return a[:full]

        multiopen_witness = [
            zpad(pfold_w), zpad(state.ac_c_dev), zpad(state.ac_d_dev),
            zpad(combined_witness),
        ]
        multiopen = MultiOpenReduction(nvars=self.x_logsize + clm, nargs=4)
        point_claims = [
            PointClaim(point=p_folded_point, ev=(p_folded_ev - gamma * gamma) % P),
            PointClaim(point=ac_c_pt, ev=final_claims.claims_ac_c.evs[0]),
            PointClaim(point=ac_d_pt, ev=final_claims.claims_ac_d.evs[0]),
            PointClaim(point=combined_pt, ev=combined_evaluation),
        ]
        multiopen_claims, _ = multiopen.prove(tr, point_claims, multiopen_witness)

        q = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        qs = fh.make_gamma_pows(q, 4, P)

        p01_comm = g1.Host.add(pc1.p_0, g1.Host.scalar_mul(gamma, pc1.p_1))
        folded_commitment = None
        for a, b in zip(qs, [p01_comm, pc1.ac_c, pc1.ac_d, combined_matrix_comm]):
            term = g1.Host.scalar_mul(a, b)
            folded_commitment = (
                term if folded_commitment is None else g1.Host.add(folded_commitment, term)
            )

        q0 = mle.scalar(FR, qs[0])
        q1 = mle.scalar(FR, qs[1])
        q2 = mle.scalar(FR, qs[2])
        q3 = mle.scalar(FR, qs[3])
        folded_witness_dev = fl.add(
            FR,
            fl.add(
                FR,
                fl.mul(FR, multiopen_witness[0], q0[None]),
                fl.mul(FR, multiopen_witness[1], q1[None]),
            ),
            fl.add(
                FR,
                fl.mul(FR, multiopen_witness[2], q2[None]),
                fl.mul(FR, multiopen_witness[3], q3[None]),
            ),
        )
        folded_witness = fl.decode_ints_fast(FR, folded_witness_dev)

        with span("open"):
            opener.prove(
                tr,
                OpeningClaim(
                    commitment=folded_commitment,
                    point=multiopen_claims.point,
                    ev=fh.fold_with_gamma(q, multiopen_claims.evs, P),
                ),
                folded_witness,
            )
        return None

    def verify(self, tr: Transcript, claims: SinglePointClaims) -> None:
        clm = self.commitment_log_multiplicity
        n = self.num_matrix_comms
        c = tr.read_points(n, FQ)
        d = tr.read_points(n, FQ)
        p_0 = tr.read_points(1, FQ)[0]
        p_1 = tr.read_points(1, FQ)[0]
        ac_c = tr.read_points(1, FQ)[0]
        ac_d = tr.read_points(1, FQ)[0]

        claims = self.ending.verify(tr, claims)
        claims = GlueSplit(P).verify_layer(tr, claims)

        c_pull = tr.read_points(n, FQ)
        d_pull = tr.read_points(n, FQ)

        final_claims = self.beginning.verify(tr, claims)
        gamma = final_claims.gamma
        matrix_pt = final_claims.claims_about_matrix.point
        p_folded_ev, c_pull_ev, d_pull_ev, c_ev, d_ev = final_claims.claims_about_matrix.evs

        opener = KnucklesOpeningProtocol(vk=self.vkey, pk=None)

        p_folded_point, ac_c_pt, ac_d_pt, combined_pt = self._opening_points(
            matrix_pt, final_claims.claims_ac_c.point, final_claims.claims_ac_d.point
        )
        multirow_evs = EqPoly(
            self.y_logsize - clm, matrix_pt[: self.y_logsize - clm]
        ).evals()

        def combine_comms(comms):
            acc = None
            for coeff, comm in zip(multirow_evs, comms):
                term = g1.Host.scalar_mul(coeff, comm)
                acc = term if acc is None else g1.Host.add(acc, term)
            return acc

        c_comb = combine_comms(c)
        d_comb = combine_comms(d)
        c_pull_comb = combine_comms(c_pull)
        d_pull_comb = combine_comms(d_pull)

        u = tr.challenge(512)
        us = fh.make_gamma_pows(u, 4, P)
        combined_matrix_comm = g1.Host.add(
            g1.Host.add(c_comb, g1.Host.scalar_mul(us[1], d_comb)),
            g1.Host.add(
                g1.Host.scalar_mul(us[2], c_pull_comb),
                g1.Host.scalar_mul(us[3], d_pull_comb),
            ),
        )
        combined_evaluation = (
            c_ev + d_ev * us[1] + c_pull_ev * us[2] + d_pull_ev * us[3]
        ) % P

        multiopen = MultiOpenReduction(nvars=self.x_logsize + clm, nargs=4)
        point_claims = [
            PointClaim(point=p_folded_point, ev=(p_folded_ev - gamma * gamma) % P),
            PointClaim(point=ac_c_pt, ev=final_claims.claims_ac_c.evs[0]),
            PointClaim(point=ac_d_pt, ev=final_claims.claims_ac_d.evs[0]),
            PointClaim(point=combined_pt, ev=combined_evaluation),
        ]
        multiopen_claims = multiopen.verify(tr, point_claims)

        q = tr.challenge(SUMCHECK_CHALLENGE_BITS)
        qs = fh.make_gamma_pows(q, 4, P)
        p01_comm = g1.Host.add(p_0, g1.Host.scalar_mul(gamma, p_1))
        folded_commitment = None
        for a, b in zip(qs, [p01_comm, ac_c, ac_d, combined_matrix_comm]):
            term = g1.Host.scalar_mul(a, b)
            folded_commitment = (
                term if folded_commitment is None else g1.Host.add(folded_commitment, term)
            )

        pair = opener.verify(
            tr,
            OpeningClaim(
                commitment=folded_commitment,
                point=multiopen_claims.point,
                ev=fh.fold_with_gamma(q, multiopen_claims.evs, P),
            ),
        )
        self.vkey.kzg_vk.verify_pair(pair)


# -----------------------------------------------------------------------------
# benchutils equivalents (pippenger.rs:409-607)
# -----------------------------------------------------------------------------

@dataclasses.dataclass
class PippengerConfig:
    y_size: int
    y_logsize: int
    d_logsize: int
    x_logsize: int
    commitment_log_multiplicity: int


@dataclasses.dataclass
class PippengerData:
    points: list
    coefs: list
    config: PippengerConfig
    r: list
    commitment_key: KnucklesProvingKey
    vkey: KnucklesVerifyingKey


@dataclasses.dataclass
class PippengerOutput:
    output: list  # dense output polys (device arrays)
    claims: SinglePointClaims
    vkey: KnucklesVerifyingKey


def random_te_points(rng, n: int) -> list:
    """n random Bandersnatch points as host affine tuples, generated on
    device by fixed-base windowed multiplication (the host double-and-add
    model costs ~250 adds/point — minutes at 2^16)."""
    from ..commitments.kzg import fixed_base_batch

    ks = [rng.randrange(1, bs.Host.order) for _ in range(n)]
    pts_dev = fixed_base_batch(bs.Host.gen, ks, curve="te")
    return bs.decode_proj_points(np.asarray(pts_dev))


def build_pippenger_data(
    rng, d_logsize, x_logsize, num_bits, clm, fast_points: bool | None = None
) -> PippengerData:
    if fast_points is None:
        fast_points = x_logsize >= 10
    if fast_points:
        points = random_te_points(rng, 1 << x_logsize)
    else:
        points = [bs.Host.random_point(rng) for _ in range(1 << x_logsize)]
    coefs = [rng.randrange(1 << num_bits) for _ in range(1 << x_logsize)]
    y_size = (num_bits + d_logsize - 1) // d_logsize
    y_logsize = max(1, (y_size - 1).bit_length())  # ceil log2
    r = [rng.randrange(P) for _ in range(y_logsize)]
    comm_size = 1 << (clm + x_logsize)
    kzg_pk = kzgm.random_kzg_pk(2 * comm_size - 1, rng)
    key = KnucklesProvingKey.new(kzg_pk, clm + x_logsize, k=2)
    return PippengerData(
        points=points,
        coefs=coefs,
        config=PippengerConfig(y_size, y_logsize, d_logsize, x_logsize, clm),
        r=r,
        commitment_key=key,
        vkey=key.verifying_key(),
    )


def run_pippenger(tr: Transcript, data: PippengerData) -> PippengerOutput:
    cfg = data.config
    wg = PippengerWG(
        data.points, data.coefs, cfg.y_size, cfg.y_logsize, cfg.d_logsize,
        cfg.x_logsize, cfg.commitment_log_multiplicity, data.commitment_key,
    )
    num_layers = (
        cfg.y_logsize + cfg.d_logsize - 2
        - gkr.HI(cfg.y_logsize).hi_usize(cfg.y_logsize + cfg.d_logsize - 2)
    )
    dense_output = triangle.last_step(wg.ending.last(), num_layers)
    claims = SinglePointClaims(
        point=list(data.r),
        evs=[mle.evaluate(FR, o, data.r) for o in dense_output],
    )
    pippenger = Pippenger(
        y_size=cfg.y_size,
        y_logsize=cfg.y_logsize,
        d_logsize=cfg.d_logsize,
        x_logsize=cfg.x_logsize,
        vkey=data.vkey,
        commitment_log_multiplicity=cfg.commitment_log_multiplicity,
    )
    pippenger.prove(tr, claims, wg)
    return PippengerOutput(output=dense_output, claims=claims, vkey=data.vkey)


def verify_pippenger(
    tr: Transcript,
    config: PippengerConfig,
    output: PippengerOutput,
    expected_msm=None,
) -> None:
    pippenger = Pippenger(
        y_size=config.y_size,
        y_logsize=config.y_logsize,
        d_logsize=config.d_logsize,
        x_logsize=config.x_logsize,
        vkey=output.vkey,
        commitment_log_multiplicity=config.commitment_log_multiplicity,
    )
    pippenger.verify(tr, output.claims)

    results = output.output
    assert (config.d_logsize + 1) * 3 == len(results)
    # recombine: doubling ladder over (multirow, bundle) points (pippenger.rs:588-606)
    n_bundles = len(results) // 3
    pts = []
    for b in range(n_bundles):
        xs = fl.decode_ints(FR, results[3 * b])
        ys = fl.decode_ints(FR, results[3 * b + 1])
        zs = fl.decode_ints(FR, results[3 * b + 2])
        bundle = []
        for i in range(len(xs)):
            bundle.append(
                bs.Host.normalize_proj((xs[i], ys[i], zs[i]))
                if zs[i] != 0
                else bs.Host.neutral()
            )
        pts.append(bundle)
    transposed = []
    for idx in range(len(pts[0])):
        for i in range(1, n_bundles):
            transposed.append(pts[i][idx])
    acc = bs.Host.neutral()
    for pt in reversed(transposed):
        acc = bs.Host.add(acc, acc)
        acc = bs.Host.add(acc, pt)
    if expected_msm is not None:
        assert acc == expected_msm, "recombined MSM does not match"
    return acc
