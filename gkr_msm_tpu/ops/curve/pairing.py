"""Host-side BLS12-381 pairing (exact Python ints).

The pipeline needs a pairing exactly once per proof verification
(/root/reference/src/cleanup/protocols/pippenger.rs:405 -> kzg.rs:63) and a
G2 scalar mult once per trusted setup (kzg.rs:92), so a slow exact host
implementation is the right engineering choice on TPU (SURVEY.md §7 hard
part #5); the throughput-critical G1 side lives on device.

Tower: Fq2 = Fq[u]/(u^2+1); Fq6 = Fq2[v]/(v^3 - (u+1)); Fq12 = Fq6[w]/(w^2 - v).
G2: y^2 = x^3 + 4(u+1) over Fq2 (the M-twist).  Pairing: optimal ate with
BLS parameter x = -0xd201000000010000, final exponentiation easy part +
direct pow((p^4 - p^2 + 1) // r) hard part.
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..field.spec import FQ, FR

P = FQ.modulus
R = FR.modulus
BLS_X = 0xD201000000010000  # |x|, parameter is -x
BLS_X_IS_NEG = True


# -----------------------------------------------------------------------------
# Fq2 = Fq[u]/(u^2+1), elements (a, b) = a + b*u
# -----------------------------------------------------------------------------

def fq2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fq2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fq2_mul(a, b):
    t0 = a[0] * b[0] % P
    t1 = a[1] * b[1] % P
    return ((t0 - t1) % P, ((a[0] + a[1]) * (b[0] + b[1]) - t0 - t1) % P)


def fq2_sq(a):
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    return ((a[0] + a[1]) * (a[0] - a[1]) % P, 2 * a[0] * a[1] % P)


def fq2_scalar(a, k: int):
    return (a[0] * k % P, a[1] * k % P)


def fq2_inv(a):
    norm = (a[0] * a[0] + a[1] * a[1]) % P
    ninv = pow(norm, -1, P)
    return (a[0] * ninv % P, (-a[1]) * ninv % P)


def fq2_conj(a):
    return (a[0], (-a[1]) % P)


FQ2_ZERO = (0, 0)
FQ2_ONE = (1, 0)
XI = (1, 1)  # u + 1, the Fq6 non-residue


# -----------------------------------------------------------------------------
# Fq6 = Fq2[v]/(v^3 - xi), elements (c0, c1, c2)
# -----------------------------------------------------------------------------

def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def _mul_xi(a):
    return fq2_mul(a, XI)


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    t2 = fq2_mul(a2, b2)
    c0 = fq2_add(t0, _mul_xi(fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2))))
    c1 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)),
        _mul_xi(t2),
    )
    c2 = fq2_add(fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fq6_sq(a):
    return fq6_mul(a, a)


def fq6_mul_by_v(a):
    """v * (c0, c1, c2) = (xi*c2, c0, c1)."""
    return (_mul_xi(a[2]), a[0], a[1])


def fq6_inv(a):
    a0, a1, a2 = a
    c0 = fq2_sub(fq2_sq(a0), _mul_xi(fq2_mul(a1, a2)))
    c1 = fq2_sub(_mul_xi(fq2_sq(a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_sq(a1), fq2_mul(a0, a2))
    t = fq2_add(
        fq2_add(fq2_mul(a0, c0), _mul_xi(fq2_mul(a2, c1))),
        _mul_xi(fq2_mul(a1, c2)),
    )
    tinv = fq2_inv(t)
    return (fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv))


FQ6_ZERO = (FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
FQ6_ONE = (FQ2_ONE, FQ2_ZERO, FQ2_ZERO)


# -----------------------------------------------------------------------------
# Fq12 = Fq6[w]/(w^2 - v), elements (d0, d1)
# -----------------------------------------------------------------------------

def fq12_mul(a, b):
    t0 = fq6_mul(a[0], b[0])
    t1 = fq6_mul(a[1], b[1])
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    c1 = fq6_sub(
        fq6_mul(fq6_add(a[0], a[1]), fq6_add(b[0], b[1])), fq6_add(t0, t1)
    )
    return (c0, c1)


def fq12_sq(a):
    return fq12_mul(a, a)


def fq12_conj(a):
    """Conjugation = Frobenius^6 (negates the w component)."""
    return (a[0], fq6_neg(a[1]))


def fq12_inv(a):
    t = fq6_inv(fq6_sub(fq6_sq(a[0]), fq6_mul_by_v(fq6_sq(a[1]))))
    return (fq6_mul(a[0], t), fq6_neg(fq6_mul(a[1], t)))


def fq12_pow(a, e: int):
    result = FQ12_ONE
    base = a
    while e:
        if e & 1:
            result = fq12_mul(result, base)
        base = fq12_sq(base)
        e >>= 1
    return result


FQ12_ONE = (FQ6_ONE, FQ6_ZERO)


# -----------------------------------------------------------------------------
# G2 (host affine, None = infinity)
# -----------------------------------------------------------------------------

G2_B = fq2_scalar(XI, 4)  # 4(u+1)

G2Affine = Optional[Tuple[Tuple[int, int], Tuple[int, int]]]


def fq2_sqrt(a):
    """Square root in Fq2 for p = 3 mod 4 (norm-based), or None.

    y = y0 + y1 u with y0^2 = (a0 + sqrt(norm))/2 (or the other sign),
    y1 = a1 / (2 y0)."""
    if a == FQ2_ZERO:
        return FQ2_ZERO
    a0, a1 = a
    if a1 == 0:
        # sqrt in Fq if a0 is a QR, else sqrt(a0) = y1*u with y1^2 = -a0
        cand = pow(a0, (P + 1) // 4, P)
        if cand * cand % P == a0:
            return (cand, 0)
        cand = pow((-a0) % P, (P + 1) // 4, P)
        if cand * cand % P == (-a0) % P:
            return (0, cand)
        return None
    norm = (a0 * a0 + a1 * a1) % P
    sn = pow(norm, (P + 1) // 4, P)
    if sn * sn % P != norm:
        return None
    inv2 = pow(2, -1, P)
    for s in (sn, (-sn) % P):
        y0sq = (a0 + s) * inv2 % P
        y0 = pow(y0sq, (P + 1) // 4, P)
        if y0 * y0 % P == y0sq and y0 != 0:
            y1 = a1 * pow(2 * y0, -1, P) % P
            cand = (y0, y1)
            if fq2_sq(cand) == a:
                return cand
    return None


# E'(Fq2) has order h2 * r; clearing h2 lands in the r-torsion subgroup.
G2_COFACTOR = int(
    "0x5d543a95414e7f1091d50792876a202cd91de4547085abaa68a205b2e5a7ddfa"
    "628f1cb4d9e82ef21537e293a6691ae1616ec6e786f0c70cf1c38e31c7238e5",
    16,
)


def g2_is_on_curve(pt: G2Affine) -> bool:
    if pt is None:
        return True
    x, y = pt
    return fq2_sq(y) == fq2_add(fq2_mul(fq2_sq(x), x), G2_B)


def g2_add(p1: G2Affine, p2: G2Affine) -> G2Affine:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if fq2_add(y1, y2) == FQ2_ZERO:
            return None
        lam = fq2_mul(fq2_scalar(fq2_sq(x1), 3), fq2_inv(fq2_scalar(y1, 2)))
    else:
        lam = fq2_mul(fq2_sub(y2, y1), fq2_inv(fq2_sub(x2, x1)))
    x3 = fq2_sub(fq2_sub(fq2_sq(lam), x1), x2)
    y3 = fq2_sub(fq2_mul(lam, fq2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_neg(pt: G2Affine) -> G2Affine:
    if pt is None:
        return None
    return (pt[0], fq2_neg(pt[1]))


def g2_scalar_mul(k: int, pt: G2Affine) -> G2Affine:
    if k < 0:
        return g2_neg(g2_scalar_mul(-k, pt))
    acc: G2Affine = None
    add = pt
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_add(add, add)
        k >>= 1
    return acc


def _derive_g2_generator() -> G2Affine:
    """Find a curve point by incremental x search, clear the cofactor.

    We only need SOME r-torsion G2 point (the reference's trusted setup uses
    arbitrary group elements, kzg.rs:135-140); deriving one from first
    principles avoids hard-coded constants."""
    x = (1, 1)
    while True:
        rhs = fq2_add(fq2_mul(fq2_sq(x), x), G2_B)
        y = fq2_sqrt(rhs)
        if y is not None:
            q = g2_scalar_mul(G2_COFACTOR, (x, y))
            if q is not None and g2_scalar_mul(R, q) is None:
                return q
        x = (x[0] + 1, x[1])


_G2_GEN_CACHE: list = []


def g2_generator() -> G2Affine:
    if not _G2_GEN_CACHE:
        _G2_GEN_CACHE.append(_derive_g2_generator())
    return _G2_GEN_CACHE[0]


# -----------------------------------------------------------------------------
# Optimal ate pairing
# -----------------------------------------------------------------------------

def _line_eval(t: G2Affine, q: G2Affine, px: int, py: int):
    """Evaluate the line through t, q (or tangent at t if t==q) at the
    G1 point (px, py), as an Fq12 element (sparse embedding).

    Twist embedding: G2 point (x', y') over Fq2 corresponds to
    (x' * w^2, y' * w^3) in the full curve over Fq12 (M-twist, w^2 = v^(..)).
    The line y - (lam*x + c): evaluated at (px, py) gives
    py - lam*x'*w^2 ... we build directly in the tower.
    """
    tx, ty = t
    qx, qy = q
    if t == q:
        lam = fq2_mul(fq2_scalar(fq2_sq(tx), 3), fq2_inv(fq2_scalar(ty, 2)))
    else:
        lam = fq2_mul(fq2_sub(qy, ty), fq2_inv(fq2_sub(qx, tx)))
    # Work entirely on the twist (M-twist): embed the G1 point as
    # P' = (px*w^2, py*w^3) in E'(Fq12) and evaluate the twist line there:
    #   l = (py*w^3 - ty) - lam*(px*w^2 - tx)
    #     = (lam*tx - ty) + (-lam*px)*w^2 + py*w^3.
    # In the tower Fq12 = Fq6[w]/(w^2 - v): w^2 -> slot c1 of d0,
    # w^3 = v*w -> slot c1 of d1.  This computes a fixed bilinear
    # non-degenerate variant of the ate pairing, used consistently on both
    # sides of every product check.
    px_fq2 = (px % P, 0)
    py_fq2 = (py % P, 0)
    d0 = (fq2_sub(fq2_mul(lam, tx), ty), fq2_neg(fq2_mul(lam, px_fq2)), FQ2_ZERO)
    d1 = (FQ2_ZERO, py_fq2, FQ2_ZERO)
    return (d0, d1)


def miller_loop(px: int, py: int, q: G2Affine):
    """Miller loop over the BLS parameter for G1 point (px,py), G2 point q."""
    f = FQ12_ONE
    t = q
    bits = bin(BLS_X)[3:]  # skip the leading 1
    for b in bits:
        f = fq12_sq(f)
        f = fq12_mul(f, _line_eval(t, t, px, py))
        t = g2_add(t, t)
        if b == "1":
            f = fq12_mul(f, _line_eval(t, q, px, py))
            t = g2_add(t, q)
    if BLS_X_IS_NEG:
        f = fq12_conj(f)
    return f


_HARD_EXP = (P**4 - P**2 + 1) // R


def final_exponentiation(f):
    # easy part: f^((p^6-1)(p^2+1))
    f = fq12_mul(fq12_conj(f), fq12_inv(f))  # f^(p^6 - 1)
    f = fq12_mul(fq12_pow(f, P**2), f)  # ^(p^2 + 1)
    # hard part (direct pow; ~1300-bit exponent, host-side once per verify)
    return fq12_pow(f, _HARD_EXP)


def pairing(p1, q2: G2Affine):
    """e(P, Q) for P=(x,y) G1 affine (None=inf), Q G2 affine (None=inf)."""
    if p1 is None or q2 is None:
        return FQ12_ONE
    return final_exponentiation(miller_loop(p1[0], p1[1], q2))


def pairing_eq(pairs_left, pairs_right) -> bool:
    """Check e(a0,b0) == e(a1,b1) (kzg.rs:63-68 verify_pair)."""
    return pairing(*pairs_left) == pairing(*pairs_right)
