"""Bit-exact tests of limb field arithmetic vs Python-int ground truth.

Mirrors the reference's optimized-vs-naive testing pattern (SURVEY.md §4.2):
every device op is checked against exact integer arithmetic.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR, FQ, FS


SPECS = [FR, FQ, FS]


def rand_ints(rng, spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(rng, spec):
    xs = rand_ints(rng, spec, 8) + [0, 1, spec.modulus - 1]
    enc = fl.encode_ints(spec, xs)
    dec = fl.decode_ints(spec, enc)
    assert dec == [x % spec.modulus for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(rng, spec):
    n = 32
    a = rand_ints(rng, spec, n)
    b = rand_ints(rng, spec, n)
    A = jnp.asarray(fl.encode_ints(spec, a))
    B = jnp.asarray(fl.encode_ints(spec, b))
    assert fl.decode_ints(spec, fl.add(spec, A, B)) == [
        (x + y) % spec.modulus for x, y in zip(a, b)
    ]
    assert fl.decode_ints(spec, fl.sub(spec, A, B)) == [
        (x - y) % spec.modulus for x, y in zip(a, b)
    ]
    assert fl.decode_ints(spec, fl.neg(spec, A)) == [(-x) % spec.modulus for x in a]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(rng, spec):
    n = 32
    a = rand_ints(rng, spec, n) + [0, 1, spec.modulus - 1, spec.modulus - 1]
    b = rand_ints(rng, spec, n) + [1, 0, spec.modulus - 1, 1]
    A = jnp.asarray(fl.encode_ints(spec, a))
    B = jnp.asarray(fl.encode_ints(spec, b))
    got = fl.decode_ints(spec, fl.mul(spec, A, B))
    assert got == [(x * y) % spec.modulus for x, y in zip(a, b)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul_jit_square_pow(rng, spec):
    a = rand_ints(rng, spec, 8)
    A = jnp.asarray(fl.encode_ints(spec, a))
    sq = jax.jit(lambda x: fl.square(spec, x))(A)
    assert fl.decode_ints(spec, sq) == [(x * x) % spec.modulus for x in a]
    p5 = fl.pow_const(spec, A, 5)
    assert fl.decode_ints(spec, p5) == [pow(x, 5, spec.modulus) for x in a]


def test_inv_and_batch_inverse(rng):
    spec = FR
    a = [rng.randrange(1, spec.modulus) for _ in range(16)]
    A = jnp.asarray(fl.encode_ints(spec, a))
    got = fl.decode_ints(spec, fl.inv(spec, A[:2]))
    assert got == [pow(x, -1, spec.modulus) for x in a[:2]]
    binv = fl.decode_ints(spec, fl.batch_inverse(spec, A))
    assert binv == [pow(x, -1, spec.modulus) for x in a]


def test_wide_mul_exact(rng):
    spec = FR
    a = rand_ints(rng, spec, 8)
    b = rand_ints(rng, spec, 8)
    A = jnp.asarray(fl.encode_ints(spec, a, mont=False))
    B = jnp.asarray(fl.encode_ints(spec, b, mont=False))
    wide = np.asarray(fl.mul_wide(A, B))
    for i in range(8):
        v = sum(int(l) << (16 * k) for k, l in enumerate(wide[i]))
        assert v == a[i] * b[i]


def test_geq_select():
    spec = FR
    vals = [0, 1, spec.modulus - 1, 5, 5]
    other = [1, 0, 0, 5, 6]
    A = jnp.asarray(fl.encode_ints(spec, vals, mont=False))
    B = jnp.asarray(fl.encode_ints(spec, other, mont=False))
    assert list(np.asarray(fl.geq(A, B))) == [False, True, True, True, False]
