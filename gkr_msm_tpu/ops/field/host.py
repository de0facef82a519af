"""Host-side exact scalar algebra (Python ints mod p).

The protocol's *scalar* plane — claims, challenges, round-polynomial
coefficients, gamma powers — is O(rounds) data, so it lives on the host as
exact Python integers while the O(N) table plane lives on device as limb
arrays.  This mirrors the reference's split between transcript scalars and
rayon-parallel tables, and keeps the subtle claim algebra (SURVEY.md hard
part #4) trivially exact.

Reference parity: utils.rs:126-154 (gamma pows, eq_eval),
cleanup/protocols/sumcheck.rs:14-44 (coefficient compression, Horner),
sumchecks/vecvec_eq.rs:193-216 (UnivarFormat::from12 eq-factor trick).
"""
from __future__ import annotations

from typing import List, Sequence


def inv(x: int, p: int) -> int:
    return pow(x, -1, p)


def eq_ev(a: Sequence[int], b: Sequence[int], p: int) -> int:
    """eq(a, b) = prod_i (a_i b_i + (1-a_i)(1-b_i))  (utils.rs:150-154)."""
    assert len(a) == len(b)
    acc = 1
    for x, y in zip(a, b):
        acc = acc * ((x * y + (1 - x) * (1 - y)) % p) % p
    return acc


def make_gamma_pows(gamma: int, n: int, p: int) -> List[int]:
    out = [1]
    for _ in range(n - 1):
        out.append(out[-1] * gamma % p)
    return out


def fold_with_gamma(gamma: int, vals: Sequence[int], p: int) -> int:
    """sum_i gamma^i vals[i] (reference zip_with_gamma, utils.rs:137-148)."""
    acc = 0
    for v in reversed(list(vals)):
        acc = (acc * gamma + v) % p
    return acc


def evaluate_univar(coeffs: Sequence[int], x: int, p: int) -> int:
    acc = 0
    for c in reversed(list(coeffs)):
        acc = (acc * x + c) % p
    return acc


def compress_coefficients(coeffs: Sequence[int]) -> List[int]:
    """Drop the linear coefficient (sumcheck.rs:27-31)."""
    out = list(coeffs)
    del out[1]
    return out


def decompress_coefficients(msg: Sequence[int], claim: int, p: int) -> List[int]:
    """Recover the linear coefficient from P(0)+P(1)=claim (sumcheck.rs:14-25)."""
    l = list(msg)
    sum_minus_lterm = 2 * l[0]
    for c in l[1:]:
        sum_minus_lterm += c
    return [l[0], (claim - sum_minus_lterm) % p] + l[1:]


def interpolate_at_0123(evals: Sequence[int], p: int) -> List[int]:
    """Coefficients of the unique cubic through (i, evals[i]), i=0..3."""
    e0, e1, e2, e3 = [e % p for e in evals]
    inv2 = inv(2, p)
    inv6 = inv(6, p)
    # Newton forward differences
    d1 = (e1 - e0) % p
    d2 = (e2 - 2 * e1 + e0) % p
    d3 = (e3 - 3 * e2 + 3 * e1 - e0) % p
    # P(t) = e0 + d1*t + d2*t(t-1)/2 + d3*t(t-1)(t-2)/6
    c0 = e0
    c1 = (d1 - d2 * inv2 + d3 * inv6 * 2) % p  # -d2/2 + d3/3
    c2 = (d2 * inv2 - d3 * inv2) % p
    c3 = d3 * inv6 % p
    return [c0, c1, c2, c3]


def interpolate_from_evals(evals: Sequence[int], p: int) -> List[int]:
    """Coefficients of the degree-(n-1) poly through (i, evals[i]), i=0..n-1."""
    n = len(evals)
    # Lagrange: sum_i e_i * prod_{j != i} (x - j)/(i - j)
    coeffs = [0] * n
    for i, e in enumerate(evals):
        num = [1]  # prod_{j != i} (x - j), built by convolution
        denom = 1
        for j in range(n):
            if j == i:
                continue
            new = [0] * (len(num) + 1)
            for k, c in enumerate(num):
                new[k] = (new[k] - j * c) % p
                new[k + 1] = (new[k + 1] + c) % p
            num = new
            denom = denom * (i - j) % p
        scale = e * inv(denom % p, p) % p
        for k, c in enumerate(num):
            coeffs[k] = (coeffs[k] + scale * c) % p
    return coeffs


def eq_sum(pt: Sequence[int], k: int, p: int) -> int:
    """Sum of eq(pt, i) for i in 0..k (closed form, utils.rs:265-291).

    pt is MSB-first; k may equal 2^len(pt) (sum = 1)."""
    n = len(pt)
    if k >= (1 << n):
        assert k == 1 << n
        return 1
    multiplier = 1
    acc = 0
    for i in range(n):
        left_bit = (k >> (n - i - 1)) & 1
        prev = multiplier
        if left_bit:
            multiplier = multiplier * pt[i] % p
            acc = (acc + prev - multiplier) % p
            k -= 1 << (n - i - 1)
        else:
            multiplier = multiplier * (1 - pt[i]) % p
    return acc % p


def from12(p1: int, p2: int, eq1: int, previous_claim: int, p: int) -> List[int]:
    """Gruen-style deg-3 round poly from f-evals at t=1,2 + the eq factor.

    R(t) = eq(t) * P(t), deg P = 2, eq linear with eq(1) = eq1.  Given
    P(1)=p1, P(2)=p2 and R(0)+R(1)=previous_claim, returns coefficients of R.
    (vecvec_eq.rs:200-216.)
    """
    eq0 = (1 - eq1) % p
    eq2 = (2 * eq1 - eq0) % p
    eq3 = (2 * eq2 - eq1) % p
    prod1 = p1 * eq1 % p
    prod0 = (previous_claim - prod1) % p
    p0 = prod0 * inv(eq0, p) % p
    p3 = (3 * p2 - 3 * p1 + p0) % p
    return interpolate_at_0123([prod0, prod1, p2 * eq2 % p, p3 * eq3 % p], p)


def eq_times_poly_univar(
    f_evals_1_to_d: Sequence[int], eq1: int, previous_claim: int, p: int
) -> List[int]:
    """General-degree version of from12 for R(t) = eq(t) * P(t), deg P = d.

    Given P(1..d), eq(1)=eq1 (eq linear), and R(0)+R(1) = previous_claim,
    returns the d+1 coefficients... of R (degree d+1, d+2 coefficients).
    """
    d = len(f_evals_1_to_d)
    eq0 = (1 - eq1) % p
    prod1 = f_evals_1_to_d[0] * eq1 % p
    prod0 = (previous_claim - prod1) % p
    p_at = [prod0 * inv(eq0, p) % p] + [e % p for e in f_evals_1_to_d]
    # extrapolate P (degree d) to t = d+1 via finite differences
    # P(d+1) = sum_{k} (-1)^k C(d+1, k+1)-style; use Lagrange instead (small d)
    coeffs_p = interpolate_from_evals(p_at, p)
    ev_dp1 = evaluate_univar(coeffs_p, d + 1, p)
    p_at.append(ev_dp1)
    # eq evals at 0..d+1
    r_evals = []
    for t in range(d + 2):
        eqt = (eq0 + t * (eq1 - eq0)) % p
        r_evals.append(eqt * p_at[t] % p)
    return interpolate_from_evals(r_evals, p)
