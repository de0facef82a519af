"""Real-TPU kernel smoke check (VERDICT r3 task 8).

Compiles every fused Mosaic kernel family on the actual device at SMALL
shapes and compares bit-exactly against its XLA twin — so a Mosaic/Pallas
regression is caught directly, instead of surfacing as a silent driver-bench
timeout.  Target: < 2 min warm (all programs are in the committed
.jax_cache), a few minutes cold.

Families covered (kernel -> XLA twin):
  * field binop mul/add/sub            (field_kernels.binop vs limbs.*)
  * fused curve add/double/fold/ladder (curve_kernels vs bls12381 jnp ops)
  * mixed-add packed-affine fold       (fold_affine_t vs unpack + fold)
  * fused sumcheck round + bind        (sumcheck_kernels vs _round_sums)
  * signed + unsigned device MSM       (msm_device vs host bigint model)

Writes artifacts/tpu_smoke.json: {"ok": bool, "checks": {...}, timings}.

Usage:  python scripts/tpu_smoke.py            (on the TPU host)
        GKR_MSM_PLATFORM=cpu python scripts/tpu_smoke.py   (CPU rehearsal)
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.environ.setdefault("GKR_MSM_JAX_CACHE", os.path.join(repo, ".jax_cache"))

platform = os.environ.get("GKR_MSM_PLATFORM")
import jax  # noqa: E402

if platform:
    jax.config.update("jax_platforms", platform)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RESULTS: dict = {}
T0 = time.perf_counter()


def check(name):
    def deco(fn):
        t = time.perf_counter()
        try:
            fn()
            RESULTS[name] = {"ok": True, "s": round(time.perf_counter() - t, 2)}
            print(f"[{time.perf_counter()-T0:7.1f}s] OK   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — collect, report, fail at exit
            RESULTS[name] = {
                "ok": False,
                "s": round(time.perf_counter() - t, 2),
                "error": f"{type(e).__name__}: {e}"[:400],
            }
            print(f"[{time.perf_counter()-T0:7.1f}s] FAIL {name}: {e}", flush=True)
        return fn

    return deco


def main() -> int:
    rng = random.Random(0x5310)

    from gkr_msm_tpu.ops.curve import bls12381 as g1
    from gkr_msm_tpu.ops.field import limbs as fl
    from gkr_msm_tpu.ops.field.spec import FQ, FR
    from gkr_msm_tpu.ops.pallas import curve_kernels as ck
    from gkr_msm_tpu.ops.pallas import field_kernels as fk
    from gkr_msm_tpu.ops.msm import pippenger as msm

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

    @check("field_binops")
    def _():
        n = 512
        a_i = [rng.randrange(FR.modulus) for _ in range(n)]
        b_i = [rng.randrange(FR.modulus) for _ in range(n)]
        a = jnp.asarray(fl.encode_ints(FR, a_i))
        b = jnp.asarray(fl.encode_ints(FR, b_i))
        for op, ref in (
            ("mul", lambda x, y: x * y),
            ("add", lambda x, y: x + y),
            ("sub", lambda x, y: x - y),
        ):
            got = fl.decode_ints(FR, fk.binop(FR, op, a, b))
            exp = [ref(x, y) % FR.modulus for x, y in zip(a_i, b_i)]
            assert got == exp, f"binop {op}"

    @check("curve_add_double_t")
    def _():
        m = 256
        pts = [g1.Host.random_point(rng) for _ in range(m)]
        qts = [g1.Host.random_point(rng) for _ in range(m)]
        a = ck.to_rows_t(msm.encode_points_device(pts))
        b = ck.to_rows_t(msm.encode_points_device(qts))
        got = g1.decode_proj(ck.from_rows_t(ck.add_t(FQ, a, b)))
        exp = [g1.Host.add(p, q) for p, q in zip(pts, qts)]
        assert got == exp, "add_t"
        got_d = g1.decode_proj(ck.from_rows_t(ck.double_t(FQ, a)))
        exp_d = [g1.Host.add(p, p) for p in pts]
        assert got_d == exp_d, "double_t"

    @check("fold_ladder_t")
    def _():
        n_out, k = 128, 8
        pts = [g1.Host.random_point(rng) for _ in range(n_out * k)]
        x = ck.to_rows_t(msm.encode_points_device(pts))
        got = g1.decode_proj(ck.from_rows_t(ck.fold_t(FQ, x, n_out)))
        exp = [
            g1.Host.msm([1] * k, [pts[i * n_out + j] for i in range(k)])
            for j in range(n_out)
        ]
        assert got == exp, "fold_t"
        small = [g1.Host.random_point(rng) for _ in range(6)]
        t_g = ck.to_rows_t(msm.encode_points_device(small))
        lad = ck.ladder_t(FQ, t_g)
        exp_l = g1.Host.msm([1 << g for g in range(6)], small)
        assert g1.decode_proj(np.asarray(lad)[None])[0] == exp_l, "ladder_t"

    @check("fold_affine_t")
    def _():
        n_out, k = 128, 6
        pts = [g1.Host.random_point(rng) for _ in range(n_out * k - 3)] + [None] * 3
        bases = msm.PackedAffineBases(pts)
        packed_t = jnp.asarray(bases._np[:-1].T)  # drop pad row: exact grid
        got = g1.decode_proj(
            ck.from_rows_t(ck.fold_affine_t(FQ, packed_t, n_out))
        )
        exp = [
            g1.Host.msm([1] * k, [pts[i * n_out + j] for i in range(k)])
            for j in range(n_out)
        ]
        assert got == exp, "fold_affine_t"

    @check("sumcheck_fused_round_bind")
    def _():
        from gkr_msm_tpu.models.sumcheck import _bind_all, _round_sums
        from gkr_msm_tpu.ops.curve import bandersnatch as bs
        from gkr_msm_tpu.ops.pallas import sumcheck_kernels as sk
        from gkr_msm_tpu.ops.poly import mle

        fn = bs.PROJ_L1
        num_vars = 12
        polys = [mle.random_poly(FR, rng, num_vars) for _ in range(fn.n_ins)]
        eq = mle.eq_table(
            FR, [rng.randrange(FR.modulus) for _ in range(num_vars - 1)]
        )
        ref = np.asarray(_round_sums(FR, polys, fn, eq))
        got = np.asarray(sk.fused_round(FR, polys, fn, eq))
        assert np.array_equal(ref, got), "fused_round"
        t = mle.scalar(FR, rng.randrange(FR.modulus))
        ref_b = [np.asarray(p) for p in _bind_all(FR, polys, t)]
        got_b = [np.asarray(p) for p in sk.fused_bind(FR, polys, t)]
        assert all(np.array_equal(r, g) for r, g in zip(ref_b, got_b)), "fused_bind"

    @check("msm_device_small")
    def _():
        n = 256
        pts = [g1.Host.random_point(rng) for _ in range(n)]
        # top quarter of the range: the signed recoding's top window is
        # carry-only with carry=1, exercising the _carry_sum_t route (the
        # round-4 2^20 signed regression was exactly this window)
        scalars = [(1 << 32) - 1 - rng.randrange(1 << 30) for _ in range(n)]
        dev = msm.encode_points_device(pts)
        limbs = msm.scalars_ints_to_limbs(scalars)
        # validate the configuration msm_device actually selects (auto_c),
        # and guard the no-separation case (grids[3] is None then)
        c_auto = msm.auto_c(n)
        ab, ng = msm.scalars_to_signed_digits(limbs, c_auto, 32)
        g = msm.signed_window_grids(ab, ng, c_auto, n)[3]
        assert g is not None and g.size > 0, "need carries"
        exp = g1.Host.msm(scalars, pts)
        got = g1.decode_proj(
            np.asarray(msm.msm_device(dev, limbs, n_bits=32, signed=False))[None]
        )[0]
        assert got == exp, "unsigned"
        got_s = g1.decode_proj(
            np.asarray(msm.msm_device(dev, limbs, n_bits=32, signed=True))[None]
        )[0]
        assert got_s == exp, "signed"

    @check("msm_packed_small")
    def _():
        n = 256
        pts = [g1.Host.random_point(rng) for _ in range(n)]
        scalars = [rng.randrange(1 << 32) for _ in range(n)]
        bases = msm.PackedAffineBases(pts)
        limbs = msm.scalars_ints_to_limbs(scalars)
        exp = g1.Host.msm(scalars, pts)
        for sgn in (False, True):
            got = g1.decode_proj(
                np.asarray(msm.msm_packed(bases, limbs, n_bits=32, signed=sgn))[None]
            )[0]
            assert got == exp, f"signed={sgn}"

    ok = all(r["ok"] for r in RESULTS.values())
    out = {
        "ok": ok,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "total_s": round(time.perf_counter() - T0, 1),
        "checks": RESULTS,
    }
    path = os.path.join(repo, "artifacts", "tpu_smoke.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "checks"}))
    print(f"artifact: {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
