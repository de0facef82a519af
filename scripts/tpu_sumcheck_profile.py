"""Per-phase TPU timing of the fused sumcheck prover's building blocks.

Times, at a given table size (default 2^20, PROJ_L2):
  * the legacy per-round pair: fused_round + fused_bind (with their XLA
    relayout prep), and
  * the zero-copy halves pipeline: round_halves / bind_round_halves /
    bind_halves plus the one-time entry conversion,
then the end-to-end DenseDeg2Sumcheck prove both ways (GKR_MSM_HALVES=0/1
would need a code toggle; instead we time prove_rounds_device directly).

Run on the axon TPU:  python scripts/tpu_sumcheck_profile.py [logsize]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "GKR_MSM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp

from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.pallas import sumcheck_kernels as sk
from gkr_msm_tpu.ops.poly import mle

LOG = int(sys.argv[1]) if len(sys.argv) > 1 else 20
FN = bs.PROJ_L2
ITERS = 8


def timeit(label, f, iters=ITERS):
    r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:34s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    nprng = np.random.default_rng(7)
    polys = [mle.random_poly_fast(FR, nprng, LOG) for _ in range(FN.n_ins)]
    point = [int(x) for x in nprng.integers(1, 1 << 63, LOG)]
    eq = mle.eq_table(FR, point[:-1])
    x = mle.scalar(FR, point[0])
    jax.block_until_ready((polys, eq, x))

    print(f"-- table 2^{LOG}, fn={FN.name} ({FN.n_ins} ins) --", flush=True)
    t_round = timeit("fused_round (old)", lambda: sk.fused_round(FR, polys, FN, eq))
    t_bind = timeit("fused_bind (old)", lambda: sk.fused_bind(FR, polys, x))

    los, his = zip(*(sk.to_halves_bitrev(FR, p) for p in polys))
    los, his = list(los), list(his)
    jax.block_until_ready((los, his))
    perm = sk._bitrev_perm(LOG - 1)
    eq_br = jnp.asarray(np.asarray(eq)[perm]).T
    eq_half = jnp.asarray(np.asarray(eq)[perm][: 1 << (LOG - 2)]).T
    jax.block_until_ready((eq_br, eq_half))

    timeit("entry to_halves_bitrev (x1)", lambda: [sk.to_halves_bitrev(FR, p) for p in polys], iters=3)
    t_rh = timeit("round_halves (new)", lambda: sk.round_halves(FR, FN, los, his, eq_br))
    t_brh = timeit(
        "bind_round_halves (new)",
        lambda: sk.bind_round_halves(FR, FN, los, his, x, eq_half),
    )
    timeit("bind_halves (new)", lambda: sk.bind_halves(FR, los, his, x))

    print(
        f"\nold round+bind: {1e3*(t_round+t_bind):.2f} ms | "
        f"new fused bind+round: {1e3*t_brh:.2f} ms "
        f"({(t_round+t_bind)/t_brh:.2f}x)",
        flush=True,
    )

    # ---- end-to-end prove breakdown ----
    import random

    from gkr_msm_tpu.models import fused_prover as fp
    from gkr_msm_tpu.models.sumcheck import DenseDeg2Sumcheck, claims_for_map
    from gkr_msm_tpu.utils.transcript import Transcript

    rng = random.Random(3)
    point_i = [rng.randrange(FR.modulus) for _ in range(LOG)]
    claims = claims_for_map(FR, FN, polys, point_i)
    proto = DenseDeg2Sumcheck(fn=FN, num_vars=LOG)

    pt_enc = jnp.asarray(
        np.asarray(
            __import__("gkr_msm_tpu.ops.field.limbs", fromlist=["x"]).encode_ints(
                FR, [c % FR.modulus for c in point_i[: LOG - 1]]
            )
        )
    )
    timeit("eq_bitrev_table build", lambda: fp._eq_bitrev_table(pt_enc), iters=4)

    def full_prove():
        tr = Transcript(b"prof")
        proto.prove(tr, claims, polys)
        return tr.end()

    full_prove()  # warm
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        full_prove()
    dt = (time.perf_counter() - t0) / n
    print(f"{'FULL prove (e2e)':34s} {dt*1e3:9.3f} ms  "
          f"({LOG/dt:.1f} rounds/s)", flush=True)


if __name__ == "__main__":
    main()
