"""Copolynomials — verifier-side polynomials with segment queries.

Port target: /root/reference/src/copoly.rs (StandardSubset :20-42,
compute_segment_split :137, CopolyData :309, trait Copolynomial :394-455,
EqPoly impl :457-722, RotPoly :723+).  The reference builds a bintree of
segment queries to batch-materialize eq slices; here every query has a
CLOSED FORM (an eq-table over a dyadic subset factorizes into a prefix
scalar times a small eq table), so the implementation is direct host-int
algebra — these objects live on the verifier/claims plane, never on the
TPU hot path (the prover-side eq machinery is ops/poly/mle.py +
models/sumcheck.py).

Conventions match the rest of the framework: ``point[0]`` pairs with the
MSB of the index; ``bind`` binds the LOWEST variable (point[-1]), the
reverse of liblasso's var order (copoly.rs:400-402).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from .fragmented import CONSTS, DATA, Shape


# -----------------------------------------------------------------------------
# dyadic segment algebra (copoly.rs:20-66,137-146)
# -----------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StandardSubset:
    """[start, start + 2^loglength) with 2^loglength | start."""

    start: int
    loglength: int

    def __post_init__(self):
        assert self.start % (1 << self.loglength) == 0, (self.start, self.loglength)

    @property
    def end(self) -> int:
        return self.start + (1 << self.loglength)


def count_trailing_zeros(x: int) -> int:
    assert x > 0
    return (x & -x).bit_length() - 1


def log_floor(x: int) -> int:
    assert x > 0
    return x.bit_length() - 1


def compute_segment_split(start: int, end: int) -> List[StandardSubset]:
    """Minimal dyadic cover of [start, end) (copoly.rs:137-146)."""
    out: List[StandardSubset] = []
    while start < end:
        log = count_trailing_zeros(start) if start > 0 else log_floor(end)
        while start + (1 << log) > end:
            log -= 1
        out.append(StandardSubset(start, log))
        start += 1 << log
    return out


@dataclasses.dataclass
class CopolyData:
    """Copoly evaluations adhering to a Shape: explicit values on data
    fragments, SUMS over const fragments (copoly.rs:309-392) — so that
    poly · copoly = dot(data, values) + dot(consts, sums)."""

    values: List[int]
    sums: List[int]

    def inner_product(self, poly, modulus: int) -> int:
        """<poly, self> for a FragmentedPoly sharing the shape
        (fragmented.rs Mul<&CopolyData> impl)."""
        acc = 0
        for a, b in zip(poly.data, self.values):
            acc += a * b
        for a, b in zip(poly.consts, self.sums):
            acc += a * b
        return acc % modulus


# -----------------------------------------------------------------------------
# trait (copoly.rs:394-455)
# -----------------------------------------------------------------------------

class Copolynomial:
    def num_vars(self) -> int:
        raise NotImplementedError

    def ev(self, pt: Sequence[int]) -> int:
        raise NotImplementedError

    def bind(self, value: int) -> None:
        raise NotImplementedError

    def take_shape(self, shape: Shape) -> None:
        self.shape = shape

    def materialize(self) -> CopolyData:
        """Values/segment-sums adhering to the taken shape."""
        shape = self.shape
        values: List[int] = []
        sums = [0] * shape.num_consts
        for f in shape.fragments:
            if f.content == DATA:
                values.extend(self.materialize_segment(f.start, f.start + f.len))
            else:
                a, b = self.half_sums_segment(f.start, f.start + f.len)
                sums[f.mem_idx] = (sums[f.mem_idx] + a + b) % self.p
        return CopolyData(values, sums)

    def materialize_split(self) -> Tuple[CopolyData, CopolyData]:
        raise NotImplementedError

    # segment ops in terms of standard subsets (default impls, copoly.rs:431-454)
    def half_sums_standard_subset(self, ss: StandardSubset) -> Tuple[int, int]:
        raise NotImplementedError

    def materialize_standard_subset(self, ss: StandardSubset) -> List[int]:
        raise NotImplementedError

    def half_sums_segment(self, start: int, end: int) -> Tuple[int, int]:
        ev = od = 0
        for ss in compute_segment_split(start, end):
            a, b = self.half_sums_standard_subset(ss)
            ev, od = (ev + a) % self.p, (od + b) % self.p
        return ev, od

    def materialize_segment(self, start: int, end: int) -> List[int]:
        out: List[int] = []
        for ss in compute_segment_split(start, end):
            out.extend(self.materialize_standard_subset(ss))
        return out

    def ip_standard_subset(self, ss: StandardSubset, values: Sequence[int]) -> int:
        mat = self.materialize_standard_subset(ss)
        return sum(a * b for a, b in zip(mat, values)) % self.p

    def ip_segment(self, start: int, end: int, values: Sequence[int]) -> int:
        mat = self.materialize_segment(start, end)
        assert len(mat) == len(values)
        return sum(a * b for a, b in zip(mat, values)) % self.p


# -----------------------------------------------------------------------------
# EqPoly (copoly.rs:457-722)
# -----------------------------------------------------------------------------

def _eq_factor(bit: int, r: int, p: int) -> int:
    return r if bit else (1 - r) % p


def _eq_table(point: Sequence[int], multiplier: int, p: int) -> List[int]:
    """Dense eq table over `point` (point[0] = MSB), scaled: each step
    appends the next-lower bit, so new entries interleave per element."""
    table = [multiplier % p]
    for r in point:
        table = [v for t in table for v in ((t * ((1 - r) % p)) % p, t * r % p)]
    return table


class EqPoly(Copolynomial):
    """eq(x, r) scaled by a multiplier, with O(n)-per-query segment algebra."""

    def __init__(self, point: Sequence[int], modulus: int, multiplier: int = 1):
        self.point = [x % modulus for x in point]
        self.p = modulus
        self.multiplier = multiplier % modulus
        self.shape: Optional[Shape] = None

    def num_vars(self) -> int:
        return len(self.point)

    def ev(self, pt: Sequence[int]) -> int:
        assert len(pt) == len(self.point)
        acc = self.multiplier
        for a, b in zip(pt, self.point):
            acc = acc * ((1 - a - b + 2 * a * b) % self.p) % self.p
        return acc

    def bind(self, value: int) -> None:
        r = self.point.pop()
        self.multiplier = (
            self.multiplier * ((1 - r - value + 2 * r * value) % self.p) % self.p
        )

    def _prefix(self, ss: StandardSubset) -> int:
        """multiplier x eq over the fixed high bits of the subset."""
        n = self.num_vars()
        k = ss.loglength
        hi = ss.start >> k
        acc = self.multiplier
        for i in range(n - k):
            bit = (hi >> (n - k - 1 - i)) & 1
            acc = acc * _eq_factor(bit, self.point[i], self.p) % self.p
        return acc

    def half_sums_standard_subset(self, ss: StandardSubset) -> Tuple[int, int]:
        """(sum over even global indices, over odd) — the low k vars sum
        to 1; parity is the lowest bit (copoly.rs EqPoly half sums)."""
        pre = self._prefix(ss)
        if ss.loglength == 0:
            return (pre, 0) if ss.start % 2 == 0 else (0, pre)
        r_last = self.point[-1]
        return pre * ((1 - r_last) % self.p) % self.p, pre * r_last % self.p

    def materialize_standard_subset(self, ss: StandardSubset) -> List[int]:
        k = ss.loglength
        low_point = self.point[self.num_vars() - k :]
        return _eq_table(low_point, self._prefix(ss), self.p)

    def materialize_split(self) -> Tuple[CopolyData, CopolyData]:
        """Copoly data for the even/odd halves over the split shape."""
        assert self.shape is not None
        split_shape = self.shape.split()
        r_last = self.point[-1]
        l = EqPoly(
            self.point[:-1], self.p,
            self.multiplier * ((1 - r_last) % self.p) % self.p,
        )
        r = EqPoly(self.point[:-1], self.p, self.multiplier * r_last % self.p)
        l.take_shape(split_shape)
        r.take_shape(split_shape)
        return l.materialize(), r.materialize()


# -----------------------------------------------------------------------------
# RotPoly (copoly.rs:723-830): Rot(x, r) = 1 iff r = x + 1 cyclically
# -----------------------------------------------------------------------------

class RotPoly(Copolynomial):
    """Rotation copolynomial: materialized over x it is the eq_r table
    shifted by one (value at x = eq_r(x+1 mod 2^n)); binding mixes an eq
    component in (copoly.rs:749-755)."""

    def __init__(self, point: Sequence[int], modulus: int):
        self.point = [x % modulus for x in point]
        self.p = modulus
        self.rot_multiplier = 1
        self.eq_multiplier = 0
        self.shape: Optional[Shape] = None

    def num_vars(self) -> int:
        return len(self.point)

    def ev(self, pt: Sequence[int]) -> int:
        poly = RotPoly(self.point, self.p)
        poly.rot_multiplier = self.rot_multiplier
        poly.eq_multiplier = self.eq_multiplier
        for x in reversed(list(pt)):
            poly.bind(x)
        return (poly.eq_multiplier + poly.rot_multiplier) % self.p

    def bind(self, x0: int) -> None:
        p = self.p
        y0 = self.point.pop()
        y0x0 = y0 * x0 % p
        self.eq_multiplier = self.eq_multiplier * ((1 - y0 - x0 + 2 * y0x0) % p) % p
        self.eq_multiplier = (
            self.eq_multiplier + (y0 - y0x0) % p * self.rot_multiplier
        ) % p
        self.rot_multiplier = self.rot_multiplier * ((x0 - y0x0) % p) % p

    def _eq(self, multiplier: int) -> EqPoly:
        return EqPoly(self.point, self.p, multiplier)

    def half_sums_segment(self, start: int, end: int) -> Tuple[int, int]:
        if start == end:
            return (0, 0)
        n = 1 << self.num_vars()
        eq = self._eq(1)
        b, a = eq.half_sums_segment(start + 1, min(end + 1, n))
        if end == n:  # wrap: x = n-1 pairs with r = 0
            extra = 1
            for x in self.point:
                extra = extra * ((1 - x) % self.p) % self.p
            b = (b + extra) % self.p
        a = a * self.rot_multiplier % self.p
        b = b * self.rot_multiplier % self.p
        if self.eq_multiplier:
            eq2 = self._eq(self.eq_multiplier)
            a_eq, b_eq = eq2.half_sums_segment(start, end)
            a, b = (a + a_eq) % self.p, (b + b_eq) % self.p
        return a, b

    def half_sums_standard_subset(self, ss: StandardSubset) -> Tuple[int, int]:
        return self.half_sums_segment(ss.start, ss.end)

    def materialize_segment(self, start: int, end: int) -> List[int]:
        n = 1 << self.num_vars()
        length = end - start
        out = [0] * length
        offset = 0
        if end == n:
            extra = self.rot_multiplier
            for x in self.point:
                extra = extra * ((1 - x) % self.p) % self.p
            out[length - 1] = extra
            offset = 1
        eq = self._eq(self.rot_multiplier)
        shifted = eq.materialize_segment(start + 1, end - offset + 1)
        for i, v in enumerate(shifted):
            out[i] = (out[i] + v) % self.p
        if self.eq_multiplier:
            eq2 = self._eq(self.eq_multiplier)
            plain = eq2.materialize_segment(start, end)
            out = [(a + b) % self.p for a, b in zip(out, plain)]
        return out

    def materialize_standard_subset(self, ss: StandardSubset) -> List[int]:
        return self.materialize_segment(ss.start, ss.end)
