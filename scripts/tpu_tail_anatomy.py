"""Time the scan-tail round's components in isolation on the TPU.

The prove breakdown shows ~10 ms per tail round regardless of table size;
this separates (a) the SHA-256 sponge chain, (b) the XLA _round_sums at the
tail size, (c) the from12/interpolation scalar algebra, each as an 8-round
chained scan so per-iteration serial latency is what's measured.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "GKR_MSM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gkr_msm_tpu.models.sumcheck import _round_sums
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.utils import sha256_jnp as shj

T = 8
S_LOG = 8
FN = bs.PROJ_L2


def timeit(label, f, iters=10):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:38s} {dt*1e3:9.3f} ms  ({dt*1e3/T:6.3f} ms/round)", flush=True)


@jax.jit
def sponge_chain(state):
    def body(st, _):
        payload = jnp.tile(st[:8], 3)[:24]  # 96 bytes worth of words
        st = shj.absorb(st, payload, 96)
        d4, st = shj.squeeze128_and_ratchet(st)
        return st, d4

    st, d4s = jax.lax.scan(body, state, None, length=T)
    return st, d4s


@functools.partial(jax.jit, static_argnames=("fn",))
def rounds_chain(fn, polys, eq):
    def body(carry, _):
        pc = carry
        plist = [pc[i] for i in range(fn.n_ins)]
        sums = _round_sums(FR, plist, fn, eq)
        # feed sums back so rounds are serially dependent like the real tail
        pc = pc.at[:, 0].set(sums[0, : fn.n_ins])
        return pc, sums

    pc, sums = jax.lax.scan(body, polys, None, length=T)
    return pc, sums


@jax.jit
def bind_chain(polys, x):
    def body(carry, _):
        pc = carry
        bound = jnp.stack(
            [mle.bind_low(FR, pc[i], x) for i in range(pc.shape[0])]
        )
        pc = pc.at[:, : bound.shape[1]].set(bound)
        return pc, bound[:, 0]

    return jax.lax.scan(body, polys, None, length=T)


def main():
    print(f"backend={jax.default_backend()}  tail={T} rounds @2^{S_LOG}", flush=True)
    nprng = np.random.default_rng(11)
    polys = jnp.stack(
        [mle.random_poly_fast(FR, nprng, S_LOG) for _ in range(FN.n_ins)]
    )
    eq = mle.eq_table(FR, [int(x) for x in nprng.integers(1, 1 << 62, S_LOG - 1)])
    state = jnp.asarray(shj.initial_state_host(b"anatomy"))
    jax.block_until_ready((polys, eq, state))

    timeit("sponge chain (absorb+squeeze)x8", lambda: sponge_chain(state))
    timeit("round_sums chain x8", lambda: rounds_chain(FN, polys, eq))
    x = mle.scalar(FR, 1234567)
    timeit("bind chain x8", lambda: bind_chain(polys, x))


if __name__ == "__main__":
    main()
