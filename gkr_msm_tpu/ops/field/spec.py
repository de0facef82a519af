"""Field specifications for the GKR-MSM TPU framework.

Every prime field used by the pipeline is described by a :class:`FieldSpec`:
a modulus together with precomputed Montgomery constants for a 16-bit-limb
representation laid out as ``uint32[..., n_limbs]`` arrays (limb 0 = least
significant).  16-bit limbs are the TPU-native choice: products of two limbs
fit a uint32 lane exactly (no 64-bit integers exist on TPU), and column sums
of up to ``2*n_limbs`` partial products stay below 2^22 < 2^32, so schoolbook
multiplication needs no intermediate carries.

Fields (reference: morgana-proofs/GKR-MSM uses arkworks equivalents,
Cargo.toml:7-21):
  * FR — BLS12-381 scalar field = Bandersnatch base field
         (reference ``ark_bls12_381::Fr``, src/utils.rs:32).
  * FQ — BLS12-381 base field (KZG G1 commitments, src/commitments/kzg.rs).
  * FS — Bandersnatch scalar field (MSM scalars / digit decomposition,
         src/cleanup/protocols/pushforward/pushforward.rs:351-373).
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# Moduli ----------------------------------------------------------------------
# BLS12-381 scalar field (= Bandersnatch base field).
R_BLS12_381 = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
# BLS12-381 base field.
Q_BLS12_381 = int(
    "0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab",
    16,
)
# Bandersnatch prime-order-subgroup order.
R_BANDERSNATCH = 0x1CFB69D4CA675F520CCE760202687600FF8F87007419047174FD06B52876E7E1


def _to_limbs_int(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in 16-bit-limb Montgomery form.

    Hashable / frozen so it can be a static argument to jitted functions.
    Numpy constant arrays are exposed as cached properties (kept out of the
    dataclass fields so equality/hash stay cheap and value-based).
    """

    name: str
    modulus: int
    n_limbs: int

    # -- derived integer constants -------------------------------------------
    @functools.cached_property
    def bits(self) -> int:
        return self.modulus.bit_length()

    @functools.cached_property
    def mont_r(self) -> int:
        """R = 2^(16*n_limbs), the Montgomery radix."""
        return 1 << (LIMB_BITS * self.n_limbs)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return self.mont_r % self.modulus

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return (self.mont_r * self.mont_r) % self.modulus

    @functools.cached_property
    def r_inv(self) -> int:
        return pow(self.mont_r, -1, self.modulus)

    @functools.cached_property
    def n_prime(self) -> int:
        """-p^{-1} mod R (full-width Montgomery constant)."""
        return (-pow(self.modulus, -1, self.mont_r)) % self.mont_r

    # -- numpy limb constants -------------------------------------------------
    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return _to_limbs_int(self.modulus, self.n_limbs)

    @functools.cached_property
    def np_limbs(self) -> np.ndarray:
        """n_prime as limbs (for the low-half Montgomery multiply)."""
        return _to_limbs_int(self.n_prime, self.n_limbs)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        """Montgomery form of 1 (= R mod p)."""
        return _to_limbs_int(self.r_mod_p, self.n_limbs)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return _to_limbs_int(self.r2_mod_p, self.n_limbs)

    @functools.cached_property
    def zero(self) -> np.ndarray:
        return np.zeros(self.n_limbs, dtype=np.uint32)

    # -- host conversions ------------------------------------------------------
    def to_limbs(self, x: int) -> np.ndarray:
        x %= self.modulus
        return _to_limbs_int(x, self.n_limbs)

    def from_limbs(self, limbs) -> int:
        limbs = np.asarray(limbs)
        return sum(int(l) << (LIMB_BITS * i) for i, l in enumerate(limbs.reshape(-1)))

    def to_mont_int(self, x: int) -> int:
        return (x * self.mont_r) % self.modulus

    def from_mont_int(self, x: int) -> int:
        return (x * self.r_inv) % self.modulus


FR = FieldSpec(name="fr", modulus=R_BLS12_381, n_limbs=16)
FQ = FieldSpec(name="fq", modulus=Q_BLS12_381, n_limbs=24)
FS = FieldSpec(name="fs", modulus=R_BANDERSNATCH, n_limbs=16)
