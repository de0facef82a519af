"""Verifier-computable polynomials (host scalar plane).

Port of /root/reference/src/cleanup/protocols/verifier_polys.rs: EqPoly
(closed-form evaluate), SelectorPoly (1 on 0..k, evaluate = eq_sum), and
EqTruncPoly (multilinearization of eq * selector with O(n) evaluate).
"""
from __future__ import annotations

from typing import List, Sequence

from ..ops.field import host as fh
from ..ops.field.spec import FR

P = FR.modulus


def eq_evals_host(r: Sequence[int], p: int = P) -> List[int]:
    """Full eq table as host ints (r[0] at MSB) — small sizes only."""
    table = [1]
    for coord in r:
        new = []
        for v in table:
            hi = v * coord % p
            new.append((v - hi) % p)
            new.append(hi)
        table = new
    return table


class EqPoly:
    def __init__(self, num_vars: int, r: Sequence[int]):
        assert len(r) == num_vars
        self.num_vars = num_vars
        self.r = list(r)

    def evals(self) -> List[int]:
        return eq_evals_host(self.r)

    def evaluate(self, pt: Sequence[int]) -> int:
        return fh.eq_ev(self.r, pt, P)


class SelectorPoly:
    """1 on indices 0..k, else 0 (verifier_polys.rs:42-68)."""

    def __init__(self, num_vars: int, k: int):
        assert k <= (1 << num_vars)
        self.num_vars = num_vars
        self.k = k

    def evals(self) -> List[int]:
        return [1] * self.k + [0] * ((1 << self.num_vars) - self.k)

    def evaluate(self, pt: Sequence[int]) -> int:
        assert len(pt) == self.num_vars
        return fh.eq_sum(pt, self.k, P)


class EqTruncPoly:
    """eq(r, -) truncated to 0..k, multilinearized (verifier_polys.rs:71-138)."""

    def __init__(self, num_vars: int, k: int, r: Sequence[int]):
        assert k <= (1 << num_vars)
        assert len(r) == num_vars
        self.num_vars = num_vars
        self.k = k
        self.r = list(r)

    def evals(self) -> List[int]:
        ret = eq_evals_host(self.r)
        for i in range(self.k, 1 << self.num_vars):
            ret[i] = 0
        return ret

    def evaluate(self, pt: Sequence[int]) -> int:
        n = self.num_vars
        assert len(pt) == n
        r = self.r
        # partial_evals[j] = eq(r_suffix_j, pt_suffix_j) over the last j vars
        partial = [1]
        for i in range(n):
            j = n - i - 1
            partial.append(
                partial[-1] * ((1 - pt[j] - r[j] + 2 * r[j] * pt[j]) % P) % P
            )
        k = self.k
        if k >= (1 << n):
            assert k == 1 << n
            return partial[n]
        multiplier = 1
        acc = 0
        for i in range(n):
            left_bit = (k >> (n - i - 1)) & 1
            prev = multiplier
            if left_bit == 1:
                multiplier = multiplier * (pt[i] * r[i] % P) % P
                acc = (
                    acc
                    + prev
                    * ((1 - pt[i]) % P)
                    % P
                    * ((1 - r[i]) % P)
                    % P
                    * partial[n - i - 1]
                ) % P
                k -= 1 << (n - i - 1)
            else:
                multiplier = multiplier * ((1 - pt[i]) * (1 - r[i]) % P) % P
        return acc % P
