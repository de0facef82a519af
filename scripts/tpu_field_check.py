"""Validate + bench Pallas field kernels vs the jnp reference path on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp

from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field import host as fh
from gkr_msm_tpu.ops.field.spec import FR, FQ
from gkr_msm_tpu.ops.pallas import field_kernels as pk

rng = np.random.default_rng(42)

def rand_elems(spec, n):
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % spec.modulus for _ in range(n)]
    return vals

def check(spec, name):
    n = 1 << 12
    av = rand_elems(spec, n); bv = rand_elems(spec, n)
    a = jnp.asarray(fl.encode_ints(spec, av))
    b = jnp.asarray(fl.encode_ints(spec, bv))
    for op in ("mul", "add", "sub"):
        ref = np.asarray(getattr(fl, op)(spec, a, b))
        got = np.asarray(pk.binop(spec, op, a, b))
        assert np.array_equal(ref, got), f"{name} {op} mismatch"
        # scalar operand
        refs = np.asarray(getattr(fl, op)(spec, a, b[:1]))
        gots = np.asarray(pk.binop(spec, op, a, b[:1]))
        assert np.array_equal(refs, gots), f"{name} {op} scalar mismatch"
    print(f"{name}: all ops bit-exact", flush=True)

def bench(spec, name, logn=20, iters=10):
    N = 1 << logn
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(N, spec.n_limbs), dtype=np.uint32) % np.asarray(spec.p_limbs + 1))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(N, spec.n_limbs), dtype=np.uint32) % np.asarray(spec.p_limbs + 1))
    for opname, f in (("pallas mul", lambda: pk.mul(spec, a, b)),
                      ("jnp mul", lambda: fl.mul(spec, a, b)),
                      ("pallas add", lambda: pk.add(spec, a, b))):
        g = jax.jit(f)
        r = g(); jax.block_until_ready(r); _ = np.asarray(r[:1])
        t0 = time.time()
        for _ in range(iters):
            r = g()
        _ = np.asarray(r[:1])
        dt = (time.time() - t0) / iters
        print(f"{name} {opname} 2^{logn}: {dt*1e3:.2f} ms -> {N/dt/1e6:.1f} M/s", flush=True)

check(FR, "FR")
check(FQ, "FQ")
bench(FR, "FR")
