"""Knuckles: multilinear -> univariate KZG opening reduction.

Scheme (/root/reference/src/commitments/knuckles.rs:1-31): a multilinear P
is committed in coefficient-basis-as-evals form; to open at r, the prover
commits T with  T(kx) - k^(N-1) T(x) + c x^(N-1) = P(x) E_r(x)  where
E_r(x) = prod_i (r_i + (1-r_i) x^(2^i)), and the verifier spot-checks the
identity at a random x via two KZG openings.

``compute_t`` is the reference's O(N log N) staged shifted accumulation
(knuckles.rs:111-154) on host ints (numpy-friendly later; the MSM commits
dominate).  ``inverses`` are the batch-inverted (k^s - k^N) diagonal
factors (knuckles.rs:65-81).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import limbs as fl
from ..ops.field.spec import FR
from .kzg import KzgProvingKey, KzgVerifyingKey

P = FR.modulus

# compute_t switches to the device path above this table size; below it the
# host-int loop is faster than a dispatch (and is the bit-exactness model)
_DEVICE_T_MIN = 1 << 10


def batch_inverse_host(vals: Sequence[int], p: int = P) -> List[int]:
    """Montgomery batch inversion: prefix products + one inversion."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % p
    inv_all = pow(prefix[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % p
        inv_all = inv_all * vals[i] % p
    return out


@dataclasses.dataclass
class KnucklesVerifyingKey:
    kzg_vk: KzgVerifyingKey
    num_vars: int
    k: int


@dataclasses.dataclass
class KnucklesProvingKey:
    kzg_pk: KzgProvingKey
    num_vars: int
    k: int
    inverses: List[int]
    _inv_dev: object = None  # cached device Montgomery table of `inverses`

    @classmethod
    def new(cls, kzg_pk: KzgProvingKey, num_vars: int, k: int = 2) -> "KnucklesProvingKey":
        n = 1 << num_vars
        assert kzg_pk.size >= 2 * n - 1, "SRS is too short."
        k_pows = [1] * (2 * n - 1)
        for i in range(1, 2 * n - 1):
            k_pows[i] = k_pows[i - 1] * k % P
        k_n = k_pows[n - 1]
        diag = [(kp - k_n) % P for kp in k_pows]
        diag[n - 1] = 1  # so inversion doesn't fail (slot unused)
        return cls(kzg_pk=kzg_pk, num_vars=num_vars, k=k,
                   inverses=batch_inverse_host(diag))

    def verifying_key(self) -> KnucklesVerifyingKey:
        return KnucklesVerifyingKey(
            kzg_vk=self.kzg_pk.verifying_key(), num_vars=self.num_vars, k=self.k
        )

    def commit(self, poly: Sequence[int]):
        assert len(poly) <= 1 << self.num_vars
        return self.kzg_pk.commit(poly)

    def kzg_basis(self):
        return self.kzg_pk.ptau_host

    def compute_t(self, poly: Sequence[int], point: Sequence[int]) -> Tuple[List[int], int]:
        """T and opening c with T(kx) - k^(N-1)T(x) + c x^(N-1) = P(x)E_r(x)
        (knuckles.rs:111-154: log-staged shifted accumulation).

        Large instances run the staged accumulation on device (num_vars
        batched field ops on the (2n-1)-wide table, bit-equal to the host
        loop — asserted in tests/test_commitments.py); tiny ones stay on
        host ints, which doubles as the reference model."""
        assert len(point) == self.num_vars
        n = 1 << self.num_vars
        assert len(poly) <= n
        if n >= _DEVICE_T_MIN:
            return self._compute_t_device(poly, point)
        return self.compute_t_host(poly, point)

    def compute_t_host(self, poly: Sequence[int], point: Sequence[int]) -> Tuple[List[int], int]:
        """Host-int reference model of compute_t (knuckles.rs:111-154)."""
        assert len(point) == self.num_vars
        pt = list(reversed(point))  # parity with liblasso ordering
        n = 1 << self.num_vars
        assert len(poly) <= n
        t = [c % P for c in poly] + [0] * (2 * n - 1 - len(poly))
        curr_size = n
        for i in range(self.num_vars):
            one_m = (1 - pt[i]) % P
            offset = 1 << i
            scaled = [t[idx] * one_m % P for idx in range(curr_size)]
            curr_size += offset
            for idx in range(curr_size - 1, -1, -1):
                v = t[idx]
                if idx < offset:
                    t[idx] = (v - scaled[idx]) % P
                else:
                    s = scaled[idx] if idx < len(scaled) else 0
                    t[idx] = (v - s + scaled[idx - offset]) % P
        opening = t[n - 1]
        t[n - 1] = 0
        t = [x * inv % P for x, inv in zip(t, self.inverses)]
        return t, opening

    def _compute_t_device(self, poly: Sequence[int], point: Sequence[int]) -> Tuple[List[int], int]:
        n = 1 << self.num_vars
        t0 = np.zeros((2 * n - 1, FR.n_limbs), dtype=np.uint32)
        t0[: len(poly)] = fl.encode_ints(FR, [c % P for c in poly])
        pt = list(reversed(point))
        one_ms = fl.encode_ints(FR, [(1 - v) % P for v in pt])
        if self._inv_dev is None:
            self._inv_dev = jnp.asarray(fl.encode_ints(FR, self.inverses))
        t_dev, opening_dev = _compute_t_stages(
            self.num_vars, jnp.asarray(t0), jnp.asarray(one_ms), self._inv_dev
        )
        opening = fl.decode_ints(FR, np.asarray(opening_dev))[0]
        t = fl.decode_ints_fast(FR, np.asarray(t_dev))
        return t, opening


@functools.partial(jax.jit, static_argnums=(0,))
def _compute_t_stages(
    num_vars: int, t: jnp.ndarray, one_ms: jnp.ndarray, inv_dev: jnp.ndarray
):
    """Device staged shifted accumulation (knuckles.rs:129-145): stage i does
    t <- t - (1-pt_i)*t + shift_{2^i}((1-pt_i)*t) over the whole (2n-1)-wide
    Montgomery table.  Entries beyond the host loop's live window are zero
    and stay zero, so no masking is needed (0 -> 0 through mul/add/sub)."""
    for i in range(num_vars):
        offset = 1 << i
        scaled = fl.mul(FR, t, jnp.broadcast_to(one_ms[i][None], t.shape))
        shifted = jnp.concatenate(
            [jnp.zeros((offset, t.shape[1]), t.dtype), scaled[:-offset]], axis=0
        )
        t = fl.add(FR, fl.sub(FR, t, scaled), shifted)
    n = 1 << num_vars
    opening = t[n - 1]
    t = t.at[n - 1].set(0)
    t = fl.mul(FR, t, inv_dev)
    return t, opening
