"""Wall-clock breakdown of prove_rounds_device on the real TPU.

Times host-pre (rc/eq/encode), the single _device_rounds dispatch, the
device->host readback, and the host replay — then separates the unrolled
head from the scan tail by sweeping GKR_MSM_DEVICE_TAIL_LOG.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "GKR_MSM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from gkr_msm_tpu.models import fused_prover as fp
from gkr_msm_tpu.ops.curve import bandersnatch as bs
from gkr_msm_tpu.ops.field import host as fh
from gkr_msm_tpu.ops.field import limbs as fl
from gkr_msm_tpu.ops.field.spec import FR
from gkr_msm_tpu.ops.pallas import field_kernels as fk
from gkr_msm_tpu.ops.pallas import sumcheck_kernels as sk
from gkr_msm_tpu.ops.poly import mle
from gkr_msm_tpu.utils import sha256_jnp as shj
from gkr_msm_tpu.utils.transcript import Transcript

LOG = int(sys.argv[1]) if len(sys.argv) > 1 else 20
FN = bs.PROJ_L2
P = FR.modulus


def run_once(tail_log, polys, point, label):
    fp.TAIL_LOG = tail_log
    import random

    rng = random.Random(9)
    gamma_pows = fh.make_gamma_pows(123456789, FN.n_outs, P)
    claim = rng.randrange(P)

    # warm compile
    tr = Transcript(b"w" + label.encode())
    fp.prove_rounds_device(tr, FN, polys, point, gamma_pows, claim)

    t0 = time.perf_counter()
    tr = Transcript(b"m" + label.encode())
    fp.prove_rounds_device(tr, FN, polys, point, gamma_pows, claim)
    dt = time.perf_counter() - t0
    print(f"tail_log={tail_log:2d}  prove_rounds_device: {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    nprng = np.random.default_rng(5)
    polys = [mle.random_poly_fast(FR, nprng, LOG) for _ in range(FN.n_ins)]
    point = [int(x) % P for x in nprng.integers(1, 1 << 63, LOG)]
    jax.block_until_ready(polys)

    # phase split at the default tail: time the pieces inside one prove
    fp.TAIL_LOG = 10
    import random

    gamma_pows = fh.make_gamma_pows(987654321, FN.n_outs, P)
    claim = random.Random(1).randrange(P)
    tr = Transcript(b"warm")
    fp.prove_rounds_device(tr, FN, polys, point, gamma_pows, claim)

    # manual re-run with timestamps mirroring prove_rounds_device
    t0 = time.perf_counter()
    R = len(point)
    M = polys[0].shape[0]
    U = (M.bit_length() - 1) - 10
    scales = [1] * R
    for r in range(1, U):
        d = (1 - point[R - 1 - r]) % P
        scales[r] = scales[r - 1] * fh.inv(d, P) % P
    rows = []
    for r in range(R):
        pt = point[-1 - r] % P
        eq0 = (1 - pt) % P
        rows.extend([pt, (2 * pt - eq0) % P, (2 * (2 * pt - eq0) - pt) % P,
                     fh.inv(eq0, P), eq0, (2 * pt - 1) % P, scales[r]])
    rc = jnp.asarray(fl.encode_ints(FR, rows).reshape(R, 7, FR.n_limbs))
    pt_enc = jnp.asarray(fl.encode_ints(FR, [c % P for c in point[: R - 1]]))
    eq_big = fp._eq_bitrev_table(pt_enc)
    small = mle.eq_table_sequence(FR, point[: R - 1 - U])
    eq_tables = (eq_big,) * U + tuple(small[R - 1 - r] for r in range(U, R))
    tr2 = Transcript(b"manual")
    gamma = 987654321
    state0 = jnp.asarray(shj.state_from_host(tr2._state))
    gp = jnp.asarray(fl.encode_ints(FR, gamma_pows[: FN.n_outs]))
    claim0 = jnp.asarray(fl.encode_ints(FR, [claim])[0])
    jax.block_until_ready((rc, eq_big, eq_tables, gp, claim0))
    t1 = time.perf_counter()
    print(f"host pre (rc+eq+encodes):        {(t1-t0)*1e3:8.2f} ms", flush=True)

    out = fp._device_rounds(FN, True, 10, True, tuple(polys), eq_tables,
                            state0, claim0, gp, rc)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"_device_rounds (one dispatch):   {(t2-t1)*1e3:8.2f} ms", flush=True)

    msgs = np.asarray(out[0]); xs = np.asarray(out[1]); fin = np.asarray(out[2])
    t3 = time.perf_counter()
    print(f"device->host readback:           {(t3-t2)*1e3:8.2f} ms", flush=True)

    cur = claim
    for r in range(R):
        mi = fl.decode_ints(FR, msgs[r], mont=False)
        tr2.write_scalars(mi)
        x = tr2.challenge(128)
        coeffs = fh.decompress_coefficients(mi, cur, P)
        cur = fh.evaluate_univar(coeffs, x, P)
    t4 = time.perf_counter()
    print(f"host replay:                     {(t4-t3)*1e3:8.2f} ms", flush=True)

    # tail sweep: isolates head vs scan-tail cost
    for tl in (8, 10, 12):
        run_once(tl, polys, point, f"t{tl}")


if __name__ == "__main__":
    main()
