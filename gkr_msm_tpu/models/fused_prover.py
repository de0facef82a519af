"""Single-dispatch sumcheck prover: all rounds + Fiat–Shamir on device.

The per-round host↔device ping-pong (round kernel → readback → host sponge →
challenge upload → bind) costs two dispatches per round; through a remote
TPU tunnel that is ~40 ms/round of pure latency. This module runs the ENTIRE
deg-2 eq-factored sumcheck — round sums (fused Pallas kernels), the Gruen
`from12` claim algebra, the SHA-256 sponge (utils/sha256_jnp.py), challenge
derivation, and binds — inside ONE jitted device program.  The host then
replays the returned round messages through its own transcript (bit-identical
sponge), so the proof byte stream and all downstream challenges are exactly
those of the unfused path (asserted in tests/test_fused_prover.py).

The reference has no analog (merlin sponge is host-only,
proof_transcript.rs:76-147); this is a TPU-native architecture choice.
All per-round eq-point constants (eq(t) factors, 1/(1-pt)) are host
precomputed and passed as device inputs, so one compile serves every
instance with the same (fn, num_vars).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.field import host as fh
from ..ops.field import limbs as fl
from ..ops.field.spec import FR, FieldSpec
from ..ops.poly.algfn import AlgFn
from ..utils import sha256_jnp as shj

P = FR.modulus


# -----------------------------------------------------------------------------
# scalar <-> sponge-word packing (16-bit LE limbs <-> 32-bit BE words)
# -----------------------------------------------------------------------------

def _std_limbs_to_words(s: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) standard-form 16-bit limbs -> (..., 8) BE uint32 words of
    the 32-byte little-endian scalar encoding (Transcript.write_scalars).
    Vectorized over leading axes (a scalar chain costs ~12 tiny ops/call)."""
    l = s.astype(jnp.uint32)
    lo = l[..., 0::2]
    hi = l[..., 1::2]
    return (
        ((lo & 0xFF) << 24)
        | ((lo >> 8) << 16)
        | ((hi & 0xFF) << 8)
        | (hi >> 8)
    )


_D4_IDX = np.arange(16) // 4
_D4_SHIFT = ((3 - (np.arange(16) % 4)) * 8).astype(np.uint32)


def _digest16_to_limbs(d4: jnp.ndarray) -> jnp.ndarray:
    """(4,) BE words (first 16 digest bytes) -> (16,) 16-bit limbs of the
    128-bit little-endian challenge integer (Transcript.challenge(128))."""
    b = (d4[jnp.asarray(_D4_IDX)] >> jnp.asarray(_D4_SHIFT)) & 0xFF
    limbs = b[0::2] | (b[1::2] << 8)
    return jnp.concatenate([limbs, jnp.zeros((8,), jnp.uint32)])


# -----------------------------------------------------------------------------
# device scalar field helpers ((16,) Montgomery vectors)
# -----------------------------------------------------------------------------

def _smul(a, b):
    return fl.mul(FR, a[None], b[None])[0]


def _sadd(a, b):
    return fl.add(FR, a[None], b[None])[0]


def _ssub(a, b):
    return fl.sub(FR, a[None], b[None])[0]


def _enc(vals: Sequence[int]) -> np.ndarray:
    return fl.encode_ints(FR, list(vals))


# -----------------------------------------------------------------------------
# the fused prover
# -----------------------------------------------------------------------------

# Tail rounds with live tables at or below this size run inside ONE
# lax.scan body at a fixed zero-padded shape (padded lanes carry eq = 0 and
# bind 0 -> 0, so sums are exact).  This collapses the unrolled per-round
# program — the dominant XLA/Mosaic compile cost over the remote tunnel —
# to ~num_vars - TAIL_LOG unrolled bodies plus one scan body.
import os as _os

# default 2^8: the lax.scan tail costs ~10 ms/round of serial scalar latency
# (sponge + claim algebra) regardless of table size, so push the pallas
# halves pipeline down to 256-lane tables (scripts/tpu_prove_breakdown.py)
TAIL_LOG = int(_os.environ.get("GKR_MSM_DEVICE_TAIL_LOG", "8"))


def _zpad0(arr: jnp.ndarray, size: int) -> jnp.ndarray:
    if arr.shape[0] >= size:
        return arr
    pad = jnp.zeros((size - arr.shape[0],) + arr.shape[1:], dtype=arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


def _make_round_algebra(fn: AlgFn, gamma_pows, alg: bool):
    """Shared per-round algebra closure for the device drivers.

    gamma-fold + from12 + interpolation + sponge for one round; returns
    (msg_std (3,16), x_std (16,), x mont, state', claim', multiplier') —
    everything except the bind.

    The from12 algebra (host.py:132-146) is restructured so independent
    scalar multiplies run as BATCHED fl.mul calls: serial tiny-op launch
    latency is the dominant per-round cost (~6 ms/round as a plain chain,
    scripts/tpu_tail_anatomy.py).  rcrow holds precomputed per-round
    constants: [eq1, eq2, 3*eq3, inv(eq0)*eq3, c_a=(1-pt), c_b=(2pt-1),
    eq-prefix rescale] — note e3 = p3*eq3 expands to (t2-t1)*(3 eq3) +
    prod0*(inv(eq0) eq3), eliminating the p0 chain.  With alg=True the
    chain runs as two pallas dispatches (bit-identical)."""
    from ..ops.pallas import sumcheck_kernels as sk

    n_o = fn.n_outs
    inv2 = jnp.asarray(_enc([fh.inv(2, P)])[0])
    inv6 = jnp.asarray(_enc([fh.inv(6, P)])[0])
    r2 = jnp.asarray(np.asarray(FR.r2_limbs, dtype=np.uint32))

    def round_algebra(sums, rcrow, state, claim, multiplier):
        if alg:
            # two-dispatch pallas version of the chain below (bit-identical:
            # all intermediates are canonical field elements)
            c0, c1, c2, c3, msg_std = sk.algebra_pre(
                FR, n_o, sums, claim, multiplier, gamma_pows, rcrow
            )
            payload = _std_limbs_to_words(msg_std).reshape(24)
            state = shj.absorb(state, payload, 96)
            d4, state = shj.squeeze128_and_ratchet(state)
            x_std = _digest16_to_limbs(d4)
            x, multiplier, claim = sk.algebra_post(
                FR, x_std, c0, c1, c2, c3, multiplier, rcrow[4], rcrow[5]
            )
            return msg_std, x_std, x, state, claim, multiplier

        eq1, eq2, eq3_3, inv_eq0_eq3, c_a, c_b, scale = (
            rcrow[i] for i in range(7)
        )

        mult_s = _smul(multiplier, scale)
        w = fl.mul(FR, sums, gamma_pows[None])  # (2, n_o, 16)
        acc = w[:, 0]
        for i in range(1, n_o):
            acc = fl.add(FR, acc, w[:, i])
        totals = fl.mul(FR, acc, mult_s[None])  # (2, 16)
        t1, t2 = totals[0], totals[1]
        l2 = fl.mul(
            FR,
            jnp.stack([t1, t2, _ssub(t2, t1)]),
            jnp.stack([eq1, eq2, eq3_3]),
        )
        prod1, e2, u = l2[0], l2[1], l2[2]
        prod0 = _ssub(claim, prod1)
        e3 = _sadd(u, _smul(prod0, inv_eq0_eq3))
        e0, e1 = prod0, prod1
        # interpolate_at_0123 (host.py:70-85)
        d1 = _ssub(e1, e0)
        d2 = _sadd(_ssub(e2, _sadd(e1, e1)), e0)
        e1_3 = _sadd(_sadd(e1, e1), e1)
        e2_3 = _sadd(_sadd(e2, e2), e2)
        d3 = _sadd(_ssub(e3, e2_3), _ssub(e1_3, e0))
        l4 = fl.mul(
            FR, jnp.stack([d2, d3]), jnp.stack([inv2, inv6])
        )
        w2, w3 = l4[0], l4[1]  # d2/2, d3/6
        c0 = e0
        c3 = w3
        c1 = _sadd(_ssub(d1, w2), _sadd(w3, w3))
        c2 = _ssub(w2, _sadd(_sadd(w3, w3), w3))  # (d2 - d3)/2
        # round message = compressed coeffs [c0, c2, c3] in standard form
        msg_std = fl.from_mont(FR, jnp.stack([c0, c2, c3]))  # (3, 16)
        payload = _std_limbs_to_words(msg_std).reshape(24)
        state = shj.absorb(state, payload, 96)
        d4, state = shj.squeeze128_and_ratchet(state)
        x_std = _digest16_to_limbs(d4)
        x = _smul(x_std, r2)  # to Montgomery (128-bit value < p: no reduction)
        # multiplier *= (1 - pt) + x*(2pt - 1);  claim = evaluate_univar(c, x)
        l7 = fl.mul(FR, jnp.stack([c_b, c3]), jnp.stack([x, x]))
        m1, cx1 = l7[0], l7[1]
        l8 = fl.mul(
            FR,
            jnp.stack([multiplier, _sadd(cx1, c2)]),
            jnp.stack([_sadd(c_a, m1), x]),
        )
        multiplier = l8[0]
        claim = _sadd(_smul(_sadd(l8[1], c1), x), c0)
        return msg_std, x_std, x, state, claim, multiplier

    return round_algebra


@functools.partial(
    jax.jit, static_argnames=("fn", "use_pallas", "tail_log", "halves", "alg")
)
def _device_rounds(
    fn: AlgFn,
    use_pallas: bool,
    tail_log: int,
    halves: bool,
    alg: bool,  # run the per-round scalar algebra as pallas kernels
    polys: Tuple[jnp.ndarray, ...],
    pt_enc: jnp.ndarray,  # (R-1, 16) Montgomery point coords (eq tables are
    # derived in-program: no per-table host dispatches over the tunnel)
    state0: jnp.ndarray,  # (8,) sponge words
    claim0: jnp.ndarray,  # (16,) mont
    mult0: jnp.ndarray,  # (16,) mont initial eq multiplier
    gamma_pows: jnp.ndarray,  # (n_outs, 16) mont
    rc: jnp.ndarray,  # (R, 7, 16) mont per-round constants
):
    return _device_rounds_body(
        fn, use_pallas, tail_log, halves, alg, polys, pt_enc, state0,
        claim0, mult0, gamma_pows, rc,
    )


def _device_rounds_body(
    fn, use_pallas, tail_log, halves, alg, polys, pt_enc, state0, claim0,
    mult0, gamma_pows, rc,
):
    from ..models.sumcheck import _round_sums
    from ..ops.pallas import sumcheck_kernels as sk
    from ..ops.poly import mle

    R = rc.shape[0]
    n_o = fn.n_outs
    # eq tables, built inside the single device program
    if halves:
        M0 = polys[0].shape[0]
        U0 = (M0.bit_length() - 1) - tail_log
        eq_big = _eq_bitrev_table_body(pt_enc)
        tail_len = R - 1 - U0
        small = mle._eq_table_seq(FR, pt_enc[:tail_len]) if U0 < R else ()
        eq_tables = (eq_big,) * U0 + tuple(
            small[R - 1 - r] for r in range(U0, R)
        )
    else:
        eq_seq = mle._eq_table_seq(FR, pt_enc)
        eq_tables = tuple(eq_seq[R - 1 - r] for r in range(R))
    polys = list(polys)
    state = state0
    claim = claim0
    multiplier = mult0
    round_algebra = _make_round_algebra(fn, gamma_pows, alg)

    S = 1 << tail_log
    msgs = []
    challenges = []
    if halves:
        # zero-copy pipeline: bit-reversed transposed residency; each round
        # is ONE pallas_call fusing the previous bind with this round's sums.
        # eq_tables[0] is the single shared bitrev eq table — every round
        # reads its m-lane PREFIX (rescale folded into rc[:, 6]).
        M = polys[0].shape[0]
        U = (M.bit_length() - 1) - tail_log
        eq_big = eq_tables[0]
        los, his = [], []
        for p_ in polys:
            lo, hi = sk.to_halves_bitrev(FR, p_)
            los.append(lo)
            his.append(hi)
        pending_x = None
        for r in range(U):
            if pending_x is None:
                sums = sk.round_halves(FR, fn, los, his, eq_big)
            else:
                sums, los, his = sk.bind_round_halves(
                    FR, fn, los, his, pending_x, eq_big
                )
            msg_std, x_std, x, state, claim, multiplier = round_algebra(
                sums, rc[r], state, claim, multiplier
            )
            msgs.append(msg_std)
            challenges.append(x_std)
            pending_x = x
        b_list = sk.bind_halves(FR, los, his, pending_x)
        polys = [sk.halves_to_natural(FR, bt) for bt in b_list]
        r = U
    else:
        r = 0
        # unrolled big rounds (Pallas fused kernels)
        while r < R and polys[0].shape[0] > S:
            m = polys[0].shape[0]
            if use_pallas and sk.should_use(FR, fn, m):
                sums = sk.fused_round(FR, polys, fn, eq_tables[r])
            else:
                sums = _round_sums(FR, polys, fn, eq_tables[r])
            msg_std, x_std, x, state, claim, multiplier = round_algebra(
                sums, rc[r], state, claim, multiplier
            )
            msgs.append(msg_std)
            challenges.append(x_std)
            if use_pallas and sk.should_use_bind(m):
                polys = sk.fused_bind(FR, polys, x)
            else:
                polys = [mle.bind_low(FR, p_, x) for p_ in polys]
            r += 1

    T = R - r
    if T > 0:
        polys_c = jnp.stack([_zpad0(p_, S) for p_ in polys])  # (n_ins, S, L)
        eqs = jnp.stack([_zpad0(eq_tables[r + i], S // 2) for i in range(T)])

        def body(carry, xs):
            pc, st, cl, mult = carry
            eq_t, rcrow = xs
            plist = [pc[i] for i in range(fn.n_ins)]
            sums = _round_sums(FR, plist, fn, eq_t)
            msg_std, x_std, x, st, cl, mult = round_algebra(
                sums, rcrow, st, cl, mult
            )
            bound = jnp.stack(
                [
                    _zpad0(mle.bind_low(FR, p_, x), S)
                    for p_ in plist
                ]
            )
            return (bound, st, cl, mult), (msg_std, x_std)

        (polys_c, state, claim, multiplier), (m_t, x_t) = jax.lax.scan(
            body, (polys_c, state, claim, multiplier), (eqs, rc[r:])
        )
        final_evals = polys_c[:, 0]  # (n_ins, 16) mont
        if msgs:
            all_msgs = jnp.concatenate([jnp.stack(msgs), m_t])
            all_chal = jnp.concatenate([jnp.stack(challenges), x_t])
        else:
            all_msgs, all_chal = m_t, x_t
    else:
        final_evals = jnp.stack([p_[0] for p_ in polys])
        all_msgs = jnp.stack(msgs)
        all_chal = jnp.stack(challenges)
    # ONE flat output => ONE device->host transfer (3 separate fetches cost
    # ~78 ms of tunnel round-trips): [msgs (R,3,16) | chal (R,16) | fin]
    return jnp.concatenate(
        [all_msgs.reshape(-1, FR.n_limbs), all_chal, final_evals]
    )


def _eq_bitrev_table_body(pt_enc: jnp.ndarray) -> jnp.ndarray:
    """ONE transposed bit-reversed eq table T = eq over the full point with
    storage bit j <-> point[j] (so T[i] = eq_natural[rev(i)]), (L, 2^{R-1}).

    Built by the hi/lo CONCAT recursion (new coordinate at the storage MSB),
    the bitrev dual of mle._eq_table's interleave recursion (utils.rs:222-254).
    Because the recursion appends at the MSB, every smaller round table is a
    PREFIX of this one up to the known scalar  prod_j (1 - point[j])  over the
    dropped coordinates — the prover folds that scalar into the round
    constants, so all rounds share this single resident table (zero per-round
    eq materialization)."""
    t = jnp.asarray(np.asarray(FR.one_mont, dtype=np.uint32))[None]
    for m in range(pt_enc.shape[0]):
        hi = fl.mul(FR, t, pt_enc[m])
        lo = fl.sub(FR, t, hi)
        t = jnp.concatenate([lo, hi], axis=0)
    return t.T


_eq_bitrev_table = jax.jit(_eq_bitrev_table_body)


def prove_rounds_device(
    tr,
    fn: AlgFn,
    polys: Sequence[jnp.ndarray],
    point: List[int],
    gamma_pows: List[int],
    claim: int,
    multiplier0: int = 1,
):
    """Drive all rounds on device, then replay messages through the host
    transcript. Mirrors models/sumcheck.prove_rounds' outputs:
    ((final_claim, reversed challenges), final_evals).

    multiplier0 continues a protocol mid-stream (the rect prover's dense
    phase inherits the sparse phase's eq multiplier)."""
    from ..ops.pallas import field_kernels as fk
    from ..ops.pallas import sumcheck_kernels as sk

    R = len(point)
    n_o = fn.n_outs
    from ..ops.poly import mle

    M = polys[0].shape[0]
    halves = sk.should_use_halves(FR, fn, M, 1 << TAIL_LOG)
    U = (M.bit_length() - 1) - TAIL_LOG if halves else 0
    # per-round rescale of the shared-eq-table prefix: round r's table is
    # eq_big's 2^{R-1-r}-lane prefix = eq_r * prod_{j=R-1-r}^{R-2}(1-point[j])
    scales = [1] * R
    for r in range(1, U):
        d = (1 - point[R - 1 - r]) % P
        if d == 0:
            halves = False  # rescale undefined; fall back to the plain path
            break
        scales[r] = scales[r - 1] * fh.inv(d, P) % P
    # per-round eq-point constants, host side (point[-1] bound first);
    # layout matches round_algebra: [eq1, eq2, 3*eq3, inv(eq0)*eq3,
    # c_a=(1-pt), c_b=(2pt-1), eq-prefix rescale]
    rows = []
    for r in range(R):
        pt = point[-1 - r] % P
        eq1 = pt
        eq0 = (1 - pt) % P
        eq2 = (2 * eq1 - eq0) % P
        eq3 = (2 * eq2 - eq1) % P
        rows.extend(
            [eq1, eq2, 3 * eq3 % P, fh.inv(eq0, P) * eq3 % P, eq0,
             (2 * pt - 1) % P, scales[r] if halves else 1]
        )
    rc = jnp.asarray(_enc(rows).reshape(R, 7, FR.n_limbs))
    if R > 1:
        pt_enc = jnp.asarray(_enc([c % P for c in point[: R - 1]]))
    else:
        pt_enc = jnp.zeros((0, FR.n_limbs), jnp.uint32)
    state0 = jnp.asarray(shj.state_from_host(tr._state))
    gp = jnp.asarray(_enc(gamma_pows[:n_o] + [0] * max(0, n_o - len(gamma_pows))))
    cm = _enc([claim, multiplier0 % P])
    claim0 = jnp.asarray(cm[0])
    mult0 = jnp.asarray(cm[1])

    flat = _device_rounds(
        fn,
        fk._FORCE != "0",
        TAIL_LOG,
        halves,
        sk.should_use_algebra(),
        tuple(polys),
        pt_enc,
        state0,
        claim0,
        mult0,
        gp,
        rc,
    )
    flat = np.asarray(flat)  # ONE transfer: [msgs | challenges | final evals]
    msgs = flat[: 3 * R].reshape(R, 3, FR.n_limbs)
    xs_host = flat[3 * R : 4 * R]
    fin = flat[4 * R :]

    # host replay: identical byte stream + challenges (sponges are twins)
    p = P
    cur = claim
    r_list = []
    for r in range(R):
        msg_ints = fl.decode_ints(FR, msgs[r], mont=False)
        tr.write_scalars(msg_ints)
        x = tr.challenge(128)
        dev_x = fl.decode_ints(FR, xs_host[r], mont=False)[0]
        assert x == dev_x, "device/host sponge mismatch"
        coeffs = fh.decompress_coefficients(msg_ints, cur, p)
        cur = fh.evaluate_univar(coeffs, x, p)
        r_list.append(x)
    r_list.reverse()
    final_evals = fl.decode_ints(FR, fin)
    return (cur, r_list), final_evals


@functools.partial(
    jax.jit,
    static_argnames=(
        "fn", "use_pallas", "tail_log", "alg", "caps", "row_logsize",
    ),
)
def _device_rect_rounds(
    fn: AlgFn,
    use_pallas: bool,
    tail_log: int,
    alg: bool,
    caps: Tuple[int, ...],  # capacity at each sparse round
    row_logsize: int,
    datas: Tuple[jnp.ndarray, ...],  # (rows, cap0, L) per poly
    repads: Tuple[jnp.ndarray, ...],  # (rows, 1, L) re-pad column per poly
    pt_enc: jnp.ndarray,  # (R, 16) FULL point, Montgomery
    pad_scales: jnp.ndarray,  # (R_s, 16) mont prod(1-pad_vars) per round
    tails: jnp.ndarray,  # (R_s, n_outs, 16) mont logical-tail corrections
    row_coefs: jnp.ndarray,  # (rows, 16) eq over the column point
    state0, claim0, mult0, gamma_pows, rc,
):
    """Entire rect sumcheck (sparse rows + dense columns) in ONE device
    program: the sparse phase mirrors RectSumcheckObject.unipoly/bind
    (models/sumcheck.py) with all host scalars precomputed, then the dense
    column phase inlines _device_rounds_body.  Mirrors vecvec_eq.rs's
    Sparse->Dense stage switch as a single dispatch."""
    from ..models.sumcheck import _round_sums
    from ..ops.pallas import sumcheck_kernels as sk
    from ..ops.poly import mle
    from ..models.sumcheck import _rect_eq_flat

    R = rc.shape[0]
    cv = R - row_logsize
    L = FR.n_limbs
    n_rows = datas[0].shape[0]
    state, claim, multiplier = state0, claim0, mult0
    round_algebra = _make_round_algebra(fn, gamma_pows, alg)
    datas = list(datas)
    msgs, chals = [], []
    for r in range(row_logsize):
        cap = caps[r]
        s = cap.bit_length() - 2  # log2(cap) - 1 segment vars
        seg = pt_enc[R - 1 - r - s : R - 1 - r]
        eq_seg = mle._eq_table(FR, seg, pad_scales[r])
        eq_flat = _rect_eq_flat(FR, row_coefs, eq_seg)
        flat = [d.reshape(n_rows * cap, L) for d in datas]
        if use_pallas and sk.should_use(FR, fn, n_rows * cap):
            sums = sk.fused_round(FR, flat, fn, eq_flat)
        else:
            sums = _round_sums(FR, flat, fn, eq_flat)
        vals = fl.add(
            FR, sums, jnp.broadcast_to(tails[r][None], sums.shape)
        )
        msg_std, x_std, x, state, claim, multiplier = round_algebra(
            vals, rc[r], state, claim, multiplier
        )
        msgs.append(msg_std)
        chals.append(x_std)
        if use_pallas and sk.should_use_bind(n_rows * cap):
            bound = sk.fused_bind(FR, flat, x)
        else:
            bound = [mle.bind_low(FR, f_, x) for f_ in flat]
        datas = [b.reshape(n_rows, cap // 2, L) for b in bound]
        if cap // 2 == 1 and r + 1 < row_logsize:
            datas = [
                jnp.concatenate([d, rp], axis=1)
                for d, rp in zip(datas, repads)
            ]
    # dense column phase (vecvec_eq.rs:227-250 stage switch), inlined
    cols = tuple(d[:, 0] for d in datas)
    halves = False  # column tables are far below the halves threshold
    flat_dense = _device_rounds_body(
        fn, use_pallas, tail_log, halves, alg, cols,
        pt_enc[: cv - 1] if cv > 1 else pt_enc[:0],
        state, claim, multiplier, gamma_pows, rc[row_logsize:],
    )
    all_msgs = jnp.concatenate(
        [jnp.stack(msgs).reshape(-1, L), flat_dense[: 3 * cv]]
    )
    all_chals = jnp.concatenate([jnp.stack(chals), flat_dense[3 * cv : 4 * cv]])
    fin = flat_dense[4 * cv :]
    return jnp.concatenate([all_msgs, all_chals, fin])


def prove_rect_rounds_device(tr, fn: AlgFn, polys, point, gamma_pows, claim):
    """Single-dispatch prover for a rect (jagged) deg-2 eq sumcheck.

    polys: RectPoly list; mirrors RectSumcheckObject + prove_rounds outputs:
    ((final_claim, reversed challenges), final_evals)."""
    from ..models.sumcheck import _exec_on_scalars
    from ..ops.pallas import field_kernels as fk
    from ..ops.pallas import sumcheck_kernels as sk

    R = len(point)
    cv = polys[0].col_logsize
    row_logsize = polys[0].row_logsize
    assert R == row_logsize + cv and cv > 0 and row_logsize > 0
    n_o = fn.n_outs
    n_rows = 1 << cv
    n_data = polys[0].n_data_rows
    cap0 = polys[0].capacity
    # capacity schedule (bind halves it; re-padded back to 2 below 2)
    caps = []
    c = cap0
    for _ in range(row_logsize):
        caps.append(c)
        c = c // 2 if c // 2 >= 2 else 2
    # per-round pad scales / logical-tail corrections (host ints)
    row_pads = [p_.row_pad for p_ in polys]
    col_pads = [p_.col_pad for p_ in polys]
    pad_f = _exec_on_scalars(FR, fn, row_pads[: fn.n_ins])
    col_f = _exec_on_scalars(FR, fn, col_pads[: fn.n_ins])
    cols_point = point[:cv]
    coef_data_sum = fh.eq_sum(cols_point, n_data, P)
    coef_pad_sum = (1 - coef_data_sum) % P
    pad_scales_i, tails_i = [], []
    for r in range(row_logsize):
        s = caps[r].bit_length() - 2
        ps = 1
        for v in point[cv : R - 1 - r - s]:
            ps = ps * (1 - v) % P
        pad_scales_i.append(ps)
        trail = (1 - ps) % P
        tails_i.extend(
            trail * (pad_f[o] * coef_data_sum + col_f[o] * coef_pad_sum) % P
            for o in range(n_o)
        )
    # per-round from12 constants over the full point, bind order = low-first
    rows = []
    for r in range(R):
        pt = point[-1 - r] % P
        eq0 = (1 - pt) % P
        eq2 = (2 * pt - eq0) % P
        eq3 = (2 * eq2 - pt) % P
        rows.extend(
            [pt, eq2, 3 * eq3 % P, fh.inv(eq0, P) * eq3 % P, eq0,
             (2 * pt - 1) % P, 1]
        )
    rc = jnp.asarray(_enc(rows).reshape(R, 7, FR.n_limbs))
    repads = tuple(
        jnp.asarray(
            _enc([rp] * n_data + [cp] * (n_rows - n_data)).reshape(
                n_rows, 1, FR.n_limbs
            )
        )
        for rp, cp in zip(row_pads, col_pads)
    )
    from ..ops.poly import mle

    row_coefs = mle.eq_table(FR, cols_point)
    pt_enc = jnp.asarray(_enc([c_ % P for c_ in point]))
    state0 = jnp.asarray(shj.state_from_host(tr._state))
    gp = jnp.asarray(_enc(gamma_pows[:n_o] + [0] * max(0, n_o - len(gamma_pows))))
    cm = _enc([claim, 1])
    flat = _device_rect_rounds(
        fn,
        fk._FORCE != "0",
        TAIL_LOG,
        sk.should_use_algebra(),
        tuple(caps),
        row_logsize,
        tuple(p_.data for p_ in polys),
        repads,
        pt_enc,
        jnp.asarray(_enc(pad_scales_i)),
        jnp.asarray(_enc(tails_i).reshape(row_logsize, n_o, FR.n_limbs)),
        row_coefs,
        state0,
        jnp.asarray(cm[0]),
        jnp.asarray(cm[1]),
        gp,
        rc,
    )
    flat = np.asarray(flat)
    msgs = flat[: 3 * R].reshape(R, 3, FR.n_limbs)
    xs_host = flat[3 * R : 4 * R]
    fin = flat[4 * R :]
    cur = claim
    r_list = []
    for r in range(R):
        msg_ints = fl.decode_ints(FR, msgs[r], mont=False)
        tr.write_scalars(msg_ints)
        x = tr.challenge(128)
        dev_x = fl.decode_ints(FR, xs_host[r], mont=False)[0]
        assert x == dev_x, "device/host sponge mismatch (rect)"
        coeffs = fh.decompress_coefficients(msg_ints, cur, P)
        cur = fh.evaluate_univar(coeffs, x, P)
        r_list.append(x)
    r_list.reverse()
    return (cur, r_list), fl.decode_ints(FR, fin)


# The single-dispatch prover unrolls every round into ONE XLA program —
# fastest steady-state, but each distinct (fn, shape) costs a big compile
# (~260 s at 2^20 on v5e).  Pipelines that sweep many layer shapes once
# (e.g. the canonical x=16 e2e) can set GKR_MSM_FUSED_PROVER=0 to keep the
# per-round pallas kernels (small compiles, reused across layers) instead.
_FUSED = _os.environ.get("GKR_MSM_FUSED_PROVER", "1") != "0"


def should_use(fn: AlgFn, num_vars: int) -> bool:
    from ..ops.pallas import field_kernels as fk

    if not _FUSED or fk._FORCE == "0":
        return False
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    return fn.ops_fn is not None and num_vars >= 12


def should_use_small(fn: AlgFn) -> bool:
    """Policy for SMALL single-dispatch proves (e.g. the rect prover's dense
    phase): a per-round host loop costs 2 dispatches/round — through the
    remote-TPU tunnel ~40 ms/round of latency — so one device program wins
    at any size on TPU."""
    from ..ops.pallas import field_kernels as fk

    if not _FUSED or fk._FORCE == "0":
        return False
    if fk._FORCE != "1" and not fk._backend_is_tpu():
        return False
    return True
