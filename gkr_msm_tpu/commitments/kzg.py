"""Non-hiding univariate KZG over BLS12-381.

TPU-native equivalent of /root/reference/src/commitments/kzg.rs: the
powers-of-tau basis lives on device as projective G1 limb arrays and
commitments are device Pippenger MSMs; the O(N)-sequential synthetic
division (kzg.rs:73-81) and the O(1) pairing plane stay on host as exact
Python ints (pairing once per verify — SURVEY.md §7.8).

Setup: ``mock_setup`` mirrors kzg.rs:84-97 (tau powers of a random scalar).
The device basis is built by windowed fixed-base multiplication: a host
precomputed table of g0 multiples per window, then one device gather +
log-tree add per basis point.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.curve import bls12381 as g1
from ..ops.curve import pairing as pr
from ..ops.field import limbs as fl
from ..ops.field.spec import FQ, FR
from ..ops.msm import pippenger as msm

Affine = g1.Affine  # host affine tuple or None


def div_by_linear(poly: Sequence[int], pt: int, p: int = FR.modulus) -> Tuple[List[int], int]:
    """Quotient and remainder of poly(x)/(x - pt) (kzg.rs:73-81)."""
    n = len(poly)
    quotient = [0] * (n - 1)
    rem = poly[n - 1] % p
    for i in range(n - 2, -1, -1):
        quotient[i] = rem
        rem = (poly[i] + rem * pt) % p
    return quotient, rem


def ev(poly: Sequence[int], x: int, p: int = FR.modulus) -> int:
    """Horner evaluation (kzg.rs:142-150)."""
    acc = 0
    for c in reversed(list(poly)):
        acc = (acc * x + c) % p
    return acc


# -- fixed-base batch scalar multiplication (device) ---------------------------

_FB_C = 8  # window bits for the fixed-base table
_FB_CHUNK = 1 << 16  # combine slice size (caps the gather tensor at ~0.6 GB)


@functools.partial(jax.jit, static_argnums=(2,))
def _fixed_base_combine(
    table: jnp.ndarray, digit_grid: jnp.ndarray, curve: str = "g1"
) -> jnp.ndarray:
    """table (n_windows, 2^c, 3, L); digit_grid (N, n_windows) ->
    points (N, 3, L) = sum_w table[w][digit[i][w]]."""
    from ..ops.msm.pippenger import _curve_ops

    add, _dbl, neutral = _curve_ops(curve)
    n_windows = table.shape[0]
    sel = jnp.stack(
        [jnp.take(table[w], digit_grid[:, w], axis=0) for w in range(n_windows)],
        axis=1,
    )  # (N, n_windows, 3, L)
    while sel.shape[1] > 1:
        if sel.shape[1] % 2 == 1:
            pad = neutral((sel.shape[0], 1))
            sel = jnp.concatenate([sel, pad], axis=1)
        sel = add(sel[:, 0::2], sel[:, 1::2])
    return sel[:, 0]


def fixed_base_batch(base: Affine, scalars: Sequence[int], curve: str = "g1") -> jnp.ndarray:
    """[k_i] -> device (N, 3, L) points k_i * base, via host window tables.

    curve='te' runs the same windowed scheme on Bandersnatch (used to
    generate large random point sets on device — the reference relies on
    arkworks' fast rand sampling, pippenger.rs:478)."""
    if curve == "g1":
        host, enc, identity = g1.Host, g1.encode_affine_to_proj, None
    else:
        from ..ops.curve import bandersnatch as bs

        host, enc, identity = bs.Host, bs.encode_affine_to_proj, bs.Host.neutral()
    n_bits = FR.bits
    c = _FB_C
    n_windows = (n_bits + c - 1) // c
    # host window tables: table[w][d] = d * 2^(cw) * base
    tables = []
    step = base
    for w in range(n_windows):
        row = [identity]
        for d in range(1, 1 << c):
            row.append(host.add(row[-1], step) if d > 1 else step)
        tables.append(row)
        for _ in range(c):
            step = host.add(step, step)
    table_dev = jnp.asarray(
        np.stack([enc(row) for row in tables])
    )  # (n_windows, 2^c, 3, L)
    limbs = msm.scalars_ints_to_limbs(scalars)
    digits = msm.scalars_to_digit_matrix(limbs, c, n_bits).T  # (N, n_windows)
    digits = np.ascontiguousarray(digits.astype(np.int32))
    # chunk the combine: the (N, n_windows, 3, L) gather tensor is ~9 GB at
    # N = 2^20 — process 2^16-point slices (one compiled program, reused)
    chunk = _FB_CHUNK
    if digits.shape[0] <= chunk:
        return _fixed_base_combine(table_dev, jnp.asarray(digits), curve)
    outs = []
    for i in range(0, digits.shape[0], chunk):
        part = digits[i : i + chunk]
        if part.shape[0] < chunk:  # pad to the compiled shape (digit 0 = id)
            pad = np.zeros((chunk - part.shape[0], part.shape[1]), np.int32)
            outs.append(
                _fixed_base_combine(
                    table_dev, jnp.asarray(np.concatenate([part, pad])), curve
                )[: part.shape[0]]
            )
        else:
            outs.append(_fixed_base_combine(table_dev, jnp.asarray(part), curve))
    return jnp.concatenate(outs, axis=0)


# -- keys ----------------------------------------------------------------------

@dataclasses.dataclass
class KzgVerifyingKey:
    g0: Affine
    h0: pr.G2Affine
    h1: pr.G2Affine

    def verify_reduce_to_pair(
        self, poly_comm: Affine, quotient_comm: Affine, opening_at: int, opening: int
    ) -> Tuple[Affine, Affine]:
        """-> (A, B) with e(A, h0) == e(B, h1) (kzg.rs:49-60)."""
        a = g1.Host.add(
            g1.Host.add(
                g1.Host.scalar_mul(opening_at, quotient_comm),
                g1.Host.neg(g1.Host.scalar_mul(opening, self.g0)),
            ),
            poly_comm,
        )
        return (a, quotient_comm)

    def verify_pair(self, pair: Tuple[Affine, Affine]) -> None:
        """Check e(pair0, h0) == e(pair1, h1) (kzg.rs:63-68)."""
        assert pr.pairing(pair[0], self.h0) == pr.pairing(pair[1], self.h1), (
            "KZG pairing check failed"
        )

    def verify_directly(self, poly_comm, quotient_comm, opening_at, opening):
        self.verify_pair(
            self.verify_reduce_to_pair(poly_comm, quotient_comm, opening_at, opening)
        )


@dataclasses.dataclass
class KzgProvingKey:
    ptau_dev: jnp.ndarray  # (size, 3, L) projective device basis
    ptau_host: List[Affine]  # host mirror (pushforward basis-bucket commits)
    h0: pr.G2Affine
    h1: pr.G2Affine
    _packed: object = dataclasses.field(default=None, repr=False, compare=False)

    @property
    def size(self) -> int:
        return int(self.ptau_dev.shape[0])

    def packed_bases(self) -> "msm.PackedAffineBases":
        """Lazily-built host-packed affine table for the fast MSM path."""
        if self._packed is None:
            self._packed = msm.PackedAffineBases(self.ptau_host)
        return self._packed

    def packed_table_dev(self) -> jnp.ndarray:
        """Device-resident packed-affine SRS table (size+1, 25) u32; row
        `size` is the validity-0 pad slot.  Gathered at 25 u32/point by the
        msm_table_dev / outer-bucket fold paths (vs 72 for ptau_dev)."""
        if getattr(self, "_packed_dev", None) is None:
            self._packed_dev = jnp.asarray(self.packed_bases()._np)
        return self._packed_dev

    def packed_table2_dev(self) -> jnp.ndarray:
        """Doubled (P | -P) device packed table for the signed-digit path."""
        if getattr(self, "_packed2_dev", None) is None:
            pb = self.packed_bases()
            pb._ensure_signed()
            self._packed2_dev = jnp.asarray(pb._np2)
        return self._packed2_dev

    def commit_limbs(self, limbs: np.ndarray, n_bits: int | None = None) -> Affine:
        """MSM of standard-form scalar limbs against the SRS prefix.

        Routes to the packed-affine fold path on TPU (host torch gather +
        mixed-add fold kernels), the sharded path under an active mesh, and
        the generic device Pippenger elsewhere."""
        import os

        from ..ops.pallas import curve_kernels as ck
        from ..parallel import context as _ctx

        n = limbs.shape[0]
        mesh = _ctx.get_mesh()
        if ck.should_use() and (mesh is None or not _ctx.shardable(n, mesh)):
            # GKR_MSM_COMMIT selects the single-device TPU route:
            #   devgather (default) — SRS resident in HBM as a packed-affine
            #     table; device gather (25 u32/pt) + mixed-add fold, host
            #     uploads only the index vectors.  Best through a tunnel AND
            #     on local PCIe (strictly less HBM traffic + cheaper adds
            #     than the projective device-gather route).
            #   packed   — host torch gather + per-window row uploads
            #     (legacy round-3 path; wins only if HBM cannot hold the SRS).
            #   proj     — projective device-gather (bit-exactness twin).
            route = os.environ.get("GKR_MSM_COMMIT", "devgather")
            if os.environ.get("GKR_MSM_PACKED") == "0" and "GKR_MSM_COMMIT" not in os.environ:
                route = "proj"  # honor the legacy knob
            if route == "devgather":
                signed = os.environ.get("GKR_MSM_SIGNED", "0") == "1"
                out = msm.msm_table_dev(
                    self.packed_table_dev(), limbs, sentinel=self.size,
                    table2_dev=self.packed_table2_dev() if signed else None,
                    n_bits=n_bits, signed=signed,
                )
                return g1.decode_proj(np.asarray(out)[None])[0]
            if route == "packed":
                out = msm.msm_packed(self.packed_bases(), limbs, n_bits=n_bits)
                return g1.decode_proj(np.asarray(out)[None])[0]
        return msm.msm_host_result(self.ptau_dev[:n], limbs, n_bits=n_bits)

    @classmethod
    def mock_setup(cls, tau: int, g0: Affine, h0: pr.G2Affine, size: int) -> "KzgProvingKey":
        powers = [1] * size
        for i in range(1, size):
            powers[i] = powers[i - 1] * tau % FR.modulus
        pts_dev = fixed_base_batch(g0, powers)
        pts_host = g1.decode_proj(np.asarray(pts_dev))
        h1 = pr.g2_scalar_mul(tau, h0)
        return cls(ptau_dev=pts_dev, ptau_host=pts_host, h0=h0, h1=h1)

    def verifying_key(self) -> KzgVerifyingKey:
        return KzgVerifyingKey(g0=self.ptau_host[0], h0=self.h0, h1=self.h1)

    def commit(self, poly: Sequence[int]) -> Affine:
        """MSM of host-int coefficients against the device basis."""
        n = len(poly)
        assert n <= self.size, "Vector is too large."
        limbs = msm.scalars_ints_to_limbs(poly)
        return self.commit_limbs(limbs)

    def open(self, poly: Sequence[int], pt: int) -> Tuple[Affine, int]:
        """Commitment to poly/(x-pt) quotient + the opening (kzg.rs:129-132)."""
        q, rem = div_by_linear(poly, pt)
        return self.commit(q), rem


def dump_kzg_pk(pk: KzgProvingKey, path: str) -> None:
    """Serialize the SRS (the reference stubs this as todo!(), kzg.rs:99-105;
    SURVEY.md §5 names the SRS as the artifact worth persisting)."""
    np.savez_compressed(
        path,
        ptau=np.asarray(pk.ptau_dev),
        h0=np.array([pk.h0[0][0], pk.h0[0][1], pk.h0[1][0], pk.h0[1][1]], dtype=object),
        h1=np.array([pk.h1[0][0], pk.h1[0][1], pk.h1[1][0], pk.h1[1][1]], dtype=object),
    )


def load_kzg_pk(path: str) -> KzgProvingKey:
    f = np.load(path, allow_pickle=True)
    ptau = jnp.asarray(f["ptau"])
    h0v = [int(x) for x in f["h0"]]
    h1v = [int(x) for x in f["h1"]]
    h0 = ((h0v[0], h0v[1]), (h0v[2], h0v[3]))
    h1 = ((h1v[0], h1v[1]), (h1v[2], h1v[3]))
    return KzgProvingKey(
        ptau_dev=ptau,
        ptau_host=g1.decode_proj(np.asarray(ptau)),
        h0=h0,
        h1=h1,
    )


def random_kzg_pk(size: int, rng) -> KzgProvingKey:
    tau = rng.randrange(1, FR.modulus)
    g0 = g1.Host.random_point(rng)
    h0 = pr.g2_scalar_mul(rng.randrange(1, pr.R), pr.g2_generator())
    return KzgProvingKey.mock_setup(tau, g0, h0, size)
