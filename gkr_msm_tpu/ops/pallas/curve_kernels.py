"""Fused Pallas TPU kernels for batched curve-point arithmetic.

The MSM hot loop is millions of projective point additions.  Composing them
from per-field-op Pallas calls (ops/pallas/field_kernels.py) pays, for every
one of the ~26 field ops in an add, a full HBM round-trip plus a transpose
relayout — the round-2 MSM measured ~30x slower than its field-op count
implies.  These kernels keep the ENTIRE addition formula (RCB15 complete
projective add: 12 muls + 2 const-muls + 12 add/subs) inside VMEM: one
kernel reads two point batches and writes one.

Layout: points live in **stacked-coordinate-row transposed form**
``uint32[3*n_limbs, M]`` — coordinate c's limb l is row ``c*n_limbs + l``,
batch on lanes.  The MSM pipeline (ops/msm/pippenger.py) keeps points in
this layout end-to-end, so there are ZERO relayouts between tree levels.

Reference parity: arkworks projective adds inside Pippenger
(/root/reference/src/msm_nonaffine.rs:123-144); redesigned as batched
complete-formula VPU kernels.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.spec import FieldSpec
from .field_kernels import TOps, _backend_is_tpu

_INTERPRET = os.environ.get("GKR_MSM_PALLAS_INTERPRET", "0") == "1"
_FORCE = os.environ.get("GKR_MSM_PALLAS")  # "1" force-on, "0" force-off

# 256 lanes x (3*24 = 72) sublanes: the add formula keeps ~12 live
# (n, B)/(2n, B) temporaries; 256 lanes bounds peak VMEM well under budget.
DEFAULT_BLOCK = 256


def should_use() -> bool:
    """Trace-time policy: fused curve kernels on TPU (or forced)."""
    if _FORCE == "0":
        return False
    return _FORCE == "1" or _backend_is_tpu()


def _rows(spec: FieldSpec):
    return 3 * spec.n_limbs


def _coords(spec: FieldSpec, ref):
    n = spec.n_limbs
    return ref[0:n], ref[n : 2 * n], ref[2 * n : 3 * n]


def _formula(curve: str):
    """curve tag -> (add_ops, double_ops) executor-parameterized formulas."""
    if curve == "g1":
        from ..curve.bls12381 import g1_add_ops, g1_double_ops

        return g1_add_ops, g1_double_ops
    from ..curve import bandersnatch as bs

    def te_add_ops(o, p_xyz, q_xyz):
        out = bs.proj_l3_ops(
            o, bs.proj_l2_ops(o, bs.proj_l1_ops(o, list(p_xyz) + list(q_xyz)))
        )
        return tuple(out)

    def te_double_ops(o, p_xyz):
        return te_add_ops(o, p_xyz, p_xyz)

    return te_add_ops, te_double_ops


@functools.partial(
    jax.jit, static_argnames=("spec", "curve", "block", "interpret")
)
def _add_t_call(
    spec: FieldSpec,
    curve: str,
    a_t: jnp.ndarray,
    b_t: jnp.ndarray,
    block: int,
    interpret: bool,
):
    rows = _rows(spec)
    M = a_t.shape[1]
    add_ops, _ = _formula(curve)

    def kernel(a_ref, b_ref, o_ref):
        o = TOps(spec)
        x3, y3, z3 = add_ops(o, _coords(spec, a_ref[:]), _coords(spec, b_ref[:]))
        o_ref[:] = jnp.concatenate([x3, y3, z3], axis=0)

    bs_ = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, M), jnp.uint32),
        grid=(M // block,),
        in_specs=[bs_, bs_],
        out_specs=bs_,
        interpret=interpret,
    )(a_t, b_t)


@functools.partial(
    jax.jit, static_argnames=("spec", "curve", "block", "interpret")
)
def _double_t_call(
    spec: FieldSpec, curve: str, a_t: jnp.ndarray, block: int, interpret: bool
):
    rows = _rows(spec)
    M = a_t.shape[1]
    _, double_ops = _formula(curve)

    def kernel(a_ref, o_ref):
        o = TOps(spec)
        x3, y3, z3 = double_ops(o, _coords(spec, a_ref[:]))
        o_ref[:] = jnp.concatenate([x3, y3, z3], axis=0)

    bs_ = pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, M), jnp.uint32),
        grid=(M // block,),
        in_specs=[bs_],
        out_specs=bs_,
        interpret=interpret,
    )(a_t)


@functools.partial(
    jax.jit, static_argnames=("spec", "curve", "n_out", "interpret")
)
def _fold_t_call(
    spec: FieldSpec, curve: str, x_t: jnp.ndarray, n_out: int, interpret: bool
):
    """Grid-sequential lane fold: x (3n, K*n_out) chunk-major -> (3n, n_out).

    out[:, j] = point-sum over chunks i of x[:, i*n_out + j].  The TPU grid
    is sequential, so the output block (constant index_map) stays resident
    in VMEM as an accumulator across all K steps — ONE Mosaic kernel compile
    per (n_out, K) regardless of how tall the reduction is, where a halving
    tree compiles a fresh ~10 s kernel per level width.
    """
    rows = _rows(spec)
    K = x_t.shape[1] // n_out
    add_ops, _ = _formula(curve)

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            o_ref[:] = x_ref[:]

        @pl.when(i > 0)
        def _acc():
            o = TOps(spec)
            x3, y3, z3 = add_ops(
                o, _coords(spec, o_ref[:]), _coords(spec, x_ref[:])
            )
            o_ref[:] = jnp.concatenate([x3, y3, z3], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n_out), jnp.uint32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((rows, n_out), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (rows, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_t)


@functools.partial(jax.jit, static_argnames=("spec", "n_out", "interpret"))
def _fold_affine_call(
    spec: FieldSpec, packed_t: jnp.ndarray, n_out: int, interpret: bool
):
    """Grid-sequential MIXED fold: packed affine chunks -> projective sums.

    packed_t: uint32[2*h+1, K*n_out] chunk-major, h = n_limbs//2.  Per point:
    rows [0,h) pack X limbs (limb r | limb r+h << 16), rows [h,2h) pack Y,
    row 2h is a validity word (0 = identity/pad slot, masked out).  Out:
    uint32[3*n_limbs, n_out] projective bucket sums.

    One complete mixed add (RCB15 Alg 8, bls12381.g1_madd_ops) per chunk per
    lane — 11 muls vs the projective add's 12, and the streamed operand is
    25 rows instead of 72 (3x less HBM/PCIe traffic for host-fed grids).
    """
    from ..curve.bls12381 import g1_madd_ops

    nl = spec.n_limbs
    h = nl // 2
    rows = 3 * nl
    K = packed_t.shape[1] // n_out
    one = [int(x) for x in spec.one_mont]
    neutral_row_consts = [0] * nl + one + [0] * nl  # X=0, Y=1, Z=0

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            o_ref[:] = jnp.concatenate(
                [
                    jnp.full((1, n_out), np.uint32(v), jnp.uint32)
                    for v in neutral_row_consts
                ],
                axis=0,
            )

        v = x_ref[:]
        xp, yp, mask = v[0:h], v[h : 2 * h], v[2 * h : 2 * h + 1]
        X2 = jnp.concatenate([xp & np.uint32(0xFFFF), xp >> 16], axis=0)
        Y2 = jnp.concatenate([yp & np.uint32(0xFFFF), yp >> 16], axis=0)
        o = TOps(spec)
        x3, y3, z3 = g1_madd_ops(o, _coords(spec, o_ref[:]), (X2, Y2))
        new = jnp.concatenate([x3, y3, z3], axis=0)
        o_ref[:] = jnp.where(mask != 0, new, o_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, n_out), jnp.uint32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec(
                (2 * h + 1, n_out), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (rows, n_out), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(packed_t)


# widest lane block a fold kernel may hold resident: the accumulator plus
# the add formula's ~12 live double-width temporaries must fit the ~16 MB
# scoped VMEM (measured: 4096 lanes ~9.4 MB of temps; 24k lanes OOMs)
MAX_FOLD_LANES = 4096


def fold_affine_t(
    spec: FieldSpec, packed_t: jnp.ndarray, n_out: int
) -> jnp.ndarray:
    """Mixed-add fold of packed affine chunks (see _fold_affine_call).
    Wide folds (> MAX_FOLD_LANES buckets) process in column blocks — one
    kernel dispatch per block, each with its accumulator VMEM-resident."""
    prows, total = packed_t.shape
    assert total % n_out == 0
    K = total // n_out
    if n_out > MAX_FOLD_LANES:
        blocks = []
        x = packed_t.reshape(prows, K, n_out)
        for j in range(0, n_out, MAX_FOLD_LANES):
            w = min(MAX_FOLD_LANES, n_out - j)
            xb = x[:, :, j : j + w].reshape(prows, K * w)
            blocks.append(fold_affine_t(spec, xb, w))
        return jnp.concatenate(blocks, axis=1)
    n_pad = max(128, ((n_out + 127) // 128) * 128)
    if n_pad != n_out:
        packed_t = jnp.pad(
            packed_t.reshape(prows, K, n_out),
            ((0, 0), (0, 0), (0, n_pad - n_out)),
        ).reshape(prows, K * n_pad)
    out = _fold_affine_call(spec, packed_t, n_pad, _INTERPRET)
    return out[:, :n_out]


def fold_t(
    spec: FieldSpec, x_t: jnp.ndarray, n_out: int, curve: str = "g1"
) -> jnp.ndarray:
    """Point-fold chunk-major lanes: (3n, K*n_out) -> (3n, n_out) sums.

    Pads each chunk to a 128-lane multiple (zero lanes stay lane-local
    garbage and are sliced off).  Wide folds process in VMEM-sized column
    blocks (see MAX_FOLD_LANES)."""
    rows, total = x_t.shape
    assert total % n_out == 0
    K = total // n_out
    if n_out > MAX_FOLD_LANES:
        blocks = []
        x = x_t.reshape(rows, K, n_out)
        for j in range(0, n_out, MAX_FOLD_LANES):
            w = min(MAX_FOLD_LANES, n_out - j)
            xb = x[:, :, j : j + w].reshape(rows, K * w)
            blocks.append(fold_t(spec, xb, w, curve))
        return jnp.concatenate(blocks, axis=1)
    n_pad = max(128, ((n_out + 127) // 128) * 128)
    if n_pad != n_out:
        x_t = jnp.pad(
            x_t.reshape(rows, K, n_out), ((0, 0), (0, 0), (0, n_pad - n_out))
        ).reshape(rows, K * n_pad)
    out = _fold_t_call(spec, curve, x_t, n_pad, _INTERPRET)
    return out[:, :n_out]


def _pad_lanes(x: jnp.ndarray, block: int) -> jnp.ndarray:
    r = (-x.shape[1]) % block
    if r:
        x = jnp.pad(x, ((0, 0), (0, r)))
    return x


def add_t(spec: FieldSpec, a_t: jnp.ndarray, b_t: jnp.ndarray, curve: str = "g1") -> jnp.ndarray:
    """Batched point add on stacked-row transposed points uint32[3n, M]."""
    M = a_t.shape[1]
    block = min(DEFAULT_BLOCK, max(128, 1 << (M - 1).bit_length()))
    out = _add_t_call(
        spec, curve, _pad_lanes(a_t, block), _pad_lanes(b_t, block), block,
        _INTERPRET,
    )
    return out[:, :M]


def double_t(spec: FieldSpec, a_t: jnp.ndarray, curve: str = "g1") -> jnp.ndarray:
    """Batched point doubling on stacked-row transposed points."""
    M = a_t.shape[1]
    block = min(DEFAULT_BLOCK, max(128, 1 << (M - 1).bit_length()))
    out = _double_t_call(spec, curve, _pad_lanes(a_t, block), block, _INTERPRET)
    return out[:, :M]


@functools.partial(jax.jit, static_argnames=("spec", "curve", "interpret"))
def _ladder_call(spec: FieldSpec, curve: str, t_g: jnp.ndarray, interpret: bool):
    """Weighted lane sum  S = sum_g 2^g * T[:, g]  in ONE kernel.

    t_g: (3n, G) per-global-bit bucket sums (lane g carries the masked sum
    of all Pippenger buckets whose weight has scalar-bit g set; pad lanes
    must hold NEUTRAL points).  Output: (3n, G) with S replicated across
    lanes (read lane 0).

    Replaces the bit ladder + window Horner chain (~150 separate kernel
    dispatches for c=8 / 16 windows, ruinous through the tunneled device)
    with G-1 masked in-VMEM doublings (lane g ends up doubled g times) and
    a log2(G) circular-shift add-reduce.
    """
    rows = _rows(spec)
    G = t_g.shape[1]
    add_ops, double_ops = _formula(curve)

    def kernel(t_ref, o_ref):
        o = TOps(spec)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

        def body(i, acc):
            d = double_ops(o, acc)
            keep = lane >= i
            return tuple(jnp.where(keep, dv, av) for dv, av in zip(d, acc))

        acc = jax.lax.fori_loop(
            1, G, body, _coords(spec, t_ref[:])
        )
        sh = G // 2
        while sh >= 1:
            rolled = tuple(pltpu.roll(v, G - sh, 1) for v in acc)
            acc = add_ops(o, acc, rolled)
            sh //= 2
        o_ref[:] = jnp.concatenate(list(acc), axis=0)

    bs_ = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, G), jnp.uint32),
        in_specs=[bs_],
        out_specs=bs_,
        interpret=interpret,
    )(t_g)


@functools.partial(jax.jit, static_argnames=("spec", "curve", "interpret"))
def _sum_lanes_call(spec: FieldSpec, curve: str, x_t: jnp.ndarray, interpret: bool):
    """Unweighted point-sum of all lanes in ONE kernel (the ladder's
    circular-shift reduce without the doubling loop).  x_t: (3n, G), G a
    power of two, pad lanes NEUTRAL.  Output (3n, G) with the sum
    replicated across lanes (read lane 0)."""
    rows = _rows(spec)
    G = x_t.shape[1]
    add_ops, _ = _formula(curve)

    def kernel(t_ref, o_ref):
        o = TOps(spec)
        acc = _coords(spec, t_ref[:])
        sh = G // 2
        while sh >= 1:
            rolled = tuple(pltpu.roll(v, G - sh, 1) for v in acc)
            acc = add_ops(o, acc, rolled)
            sh //= 2
        o_ref[:] = jnp.concatenate(list(acc), axis=0)

    bs_ = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, G), jnp.uint32),
        in_specs=[bs_],
        out_specs=bs_,
        interpret=interpret,
    )(x_t)


def sum_lanes_t(spec: FieldSpec, x_t: jnp.ndarray, curve: str = "g1") -> jnp.ndarray:
    """Point-sum of all lanes: (3n, G) -> (3n, 1) in one fused kernel."""
    rows, G = x_t.shape
    g_pad = 1 << max(0, (G - 1)).bit_length()
    if not _INTERPRET:
        g_pad = max(128, g_pad)
    if g_pad != G:
        x_t = jnp.concatenate(
            [x_t, neutral_rows_t(spec, g_pad - G, curve)], axis=1
        )
    return _sum_lanes_call(spec, curve, x_t, _INTERPRET)[:, 0:1]


def ladder_t(spec: FieldSpec, t_g: jnp.ndarray, curve: str = "g1") -> jnp.ndarray:
    """S = sum_g 2^g T[:, g] -> natural-layout point (3, n_limbs).

    Pads to a power-of-two >=128 lane count with neutral points (zero-lane
    padding would be absorbing under the complete formulas)."""
    rows, G = t_g.shape
    g_pad = 1 << max(0, (G - 1)).bit_length()
    if not _INTERPRET:
        g_pad = max(128, g_pad)
    if g_pad != G:
        t_g = jnp.concatenate(
            [t_g, neutral_rows_t(spec, g_pad - G, curve)], axis=1
        )
    out = _ladder_call(spec, curve, t_g, _INTERPRET)
    return from_rows_t(out[:, 0:1])[0]


# -----------------------------------------------------------------------------
# layout converters (natural (M, 3, n) <-> stacked rows (3n, M))
# -----------------------------------------------------------------------------

def to_rows_t(points: jnp.ndarray) -> jnp.ndarray:
    """uint32[M, 3, n] -> uint32[3n, M]."""
    m = points.shape[0]
    return points.reshape(m, -1).T


def from_rows_t(rows: jnp.ndarray) -> jnp.ndarray:
    """uint32[3n, M] -> uint32[M, 3, n]."""
    m = rows.shape[1]
    return rows.T.reshape(m, 3, rows.shape[0] // 3)


def neutral_rows_t(spec: FieldSpec, m: int, curve: str = "g1") -> jnp.ndarray:
    """(3n, m) of neutral points in stacked-row form."""
    if curve == "g1":
        from ..curve.bls12381 import g1_neutral as neutral
    else:
        from ..curve.bandersnatch import te_neutral as neutral

    return to_rows_t(neutral((m,)))
