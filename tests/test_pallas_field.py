"""Pallas field kernels vs the jnp reference path (interpret mode on CPU).

Mirrors the reference's optimized-vs-naive twin-test pattern (SURVEY.md §4.2):
every kernel is asserted bit-exact against ops/field/limbs.py, which itself
is tested against host big-int vectors in test_field.py.
"""
import random

import numpy as np
import pytest
import jax.numpy as jnp

from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FQ, FR
from gkr_msm_tpu.ops.pallas import field_kernels as pk


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "_INTERPRET", True)


@pytest.mark.parametrize("spec", [FR, FQ], ids=["fr", "fq"])
@pytest.mark.parametrize("op", ["mul", "add", "sub"])
def test_binop_bit_exact(spec, op):
    rng = random.Random(0xA11A5 + spec.n_limbs)
    n = 200
    av = [rng.randrange(spec.modulus) for _ in range(n)]
    bv = [rng.randrange(spec.modulus) for _ in range(n)]
    # include edge values that stress carries / conditional subtraction
    av[:3] = [0, spec.modulus - 1, 1]
    bv[:3] = [0, spec.modulus - 1, spec.modulus - 1]
    a = jnp.asarray(fl.encode_ints(spec, av))
    b = jnp.asarray(fl.encode_ints(spec, bv))
    ref = np.asarray(getattr(fl, op)(spec, a, b))
    got = np.asarray(pk.binop(spec, op, a, b))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("op", ["mul", "add", "sub"])
def test_binop_scalar_operand(op):
    rng = random.Random(0x5CA1A7)
    a = jnp.asarray(fl.encode_ints(FR, [rng.randrange(FR.modulus) for _ in range(130)]))
    s = jnp.asarray(fl.encode_ints(FR, [rng.randrange(FR.modulus)]))
    ref = np.asarray(getattr(fl, op)(FR, a, s))
    got = np.asarray(pk.binop(FR, op, a, s))
    assert np.array_equal(ref, got)


def test_mul_scalar_first_operand_commutes():
    rng = random.Random(7)
    a = jnp.asarray(fl.encode_ints(FR, [rng.randrange(FR.modulus) for _ in range(130)]))
    s = jnp.asarray(fl.encode_ints(FR, [rng.randrange(FR.modulus)]))
    assert np.array_equal(
        np.asarray(pk.mul(FR, s, a)), np.asarray(fl.mul(FR, s, a))
    )


def test_should_use_policy_cpu_off():
    a = jnp.zeros((4096, 16), jnp.uint32)
    # on the CPU test platform the dispatch must stay off unless forced
    if pk._FORCE != "1" and not pk._backend_is_tpu():
        assert not pk.should_use(a, a)


def test_multi_dim_batch():
    rng = random.Random(9)
    vals = [rng.randrange(FR.modulus) for _ in range(8 * 33)]
    a = jnp.asarray(fl.encode_ints(FR, vals)).reshape(8, 33, FR.n_limbs)
    ref = np.asarray(fl.mul(FR, a, a))
    got = np.asarray(pk.binop(FR, "mul", a, a))
    assert np.array_equal(ref, got)
