"""Fragmented (sparse-segment) multilinear polynomials — the reference's
legacy polynomial stack rebuilt.

Port target: /root/reference/src/polynomial/fragmented.rs (Fragment
:36-52, Shape :55-63 with memoized split :280-351, merge rules :65-78,
FragmentedPoly :384+ with split :676, split_at :526, bind/evaluate
:736-786, map_over_poly :811).  The cleanup-generation `RectPoly`
(ops/poly/rect.py) supersedes this layout for the TPU hot path (SURVEY.md
§7.12); this module exists for capability parity with the legacy
round-driven protocol generation (models/legacy_protocols.py), so it is a
host-side exact-int implementation: one MLE = interleaved runs of explicit
values ("data") and shared constants ("consts").  Interop to dense lists /
device limb tables is provided for cross-checking against the TPU engines.

Value model: entries are Python ints mod a prime (the legacy protocols run
on the exact host scalar plane, like every verifier-side object in this
framework); the container itself is value-agnostic (curve points, tuples —
anything with ==) exactly like the Rust generic.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

DATA = "data"
CONSTS = "consts"

# A const run shorter than this merges into a neighbouring data run
# (fragmented.rs:65 MERGE_THRESH).
MERGE_THRESH = 2


@dataclasses.dataclass
class Fragment:
    """One run of the poly: [start, start+len) is data (mem_idx = offset
    into the data buffer) or a repeated constant (mem_idx = index into the
    consts list).  fragmented.rs:36-52."""

    mem_idx: int
    len: int
    content: str  # DATA | CONSTS
    start: int

    def copy(self) -> "Fragment":
        return Fragment(self.mem_idx, self.len, self.content, self.start)


def _should_merge(f1: Fragment, f2: Fragment) -> bool:
    """fragmented.rs:67-78."""
    if f1.content == DATA and f2.content == DATA:
        return True
    if f1.content == DATA and f2.content == CONSTS:
        return f2.len < MERGE_THRESH
    if f1.content == CONSTS and f2.content == DATA:
        return False
    return f1.mem_idx == f2.mem_idx  # consts/consts: same constant


class Shape:
    """Fragment layout shared by every poly with this sparsity pattern;
    the split layout (even/odd halves share one shape) and the const
    permutation are memoized (fragmented.rs:55-63, 280-351)."""

    def __init__(self, fragments: List[Fragment], num_consts: int):
        self.fragments: List[Fragment] = []
        self.num_consts = num_consts
        self.data_len = 0
        self.dedup_consts_len = 0
        self._split: Optional[Shape] = None
        self._split_perm: Optional[List[int]] = None
        for f in fragments:
            self.add(f.copy())
        self.assert_correct()

    # -- construction ---------------------------------------------------

    @classmethod
    def empty(cls, num_consts: int) -> "Shape":
        return cls([], num_consts)

    @classmethod
    def full(cls, length: int) -> "Shape":
        """One all-data fragment (fragmented.rs:99-115)."""
        return cls([Fragment(0, length, DATA, 0)], 0)

    def __len__(self) -> int:
        if not self.fragments:
            return 0
        last = self.fragments[-1]
        return last.start + last.len

    def add(self, fragment: Fragment) -> None:
        """Append a fragment, merging by the reference rules
        (fragmented.rs:118-171)."""
        if fragment.len == 0:
            return
        prev = self.fragments[-1] if self.fragments else None
        if prev is not None and _should_merge(prev, fragment):
            if prev.content == DATA:
                # data absorbs (short consts become explicit data slots)
                prev.len += fragment.len
                self.data_len += fragment.len
            else:  # consts/consts, same mem_idx
                prev.len += fragment.len
            return
        if fragment.content == DATA:
            assert fragment.mem_idx == self.data_len, (fragment, self.data_len)
            self.data_len += fragment.len
        else:
            assert fragment.mem_idx < self.num_consts
            self.dedup_consts_len += 1
        self.fragments.append(fragment)

    def assert_correct(self) -> None:
        data_len = 0
        dedup = 0
        pos = 0
        for f in self.fragments:
            assert f.start == pos, (f, pos)
            pos += f.len
            if f.content == DATA:
                assert f.mem_idx == data_len
                data_len += f.len
            else:
                dedup += 1
                assert f.mem_idx < self.num_consts
        assert self.data_len == data_len
        assert self.dedup_consts_len == dedup

    @classmethod
    def rand(cls, rng, num_vars: int) -> "Shape":
        """Random alternating data/const layout covering 2^num_vars
        (capability analog of fragmented.rs:246-278)."""
        n = 1 << num_vars
        n_cuts = rng.randrange(max(1, n // 4))
        cuts = sorted({rng.randrange(1, n) for _ in range(n_cuts)} | {0, n})
        num_consts = max(1, len(cuts))
        sh = cls.empty(num_consts)
        prev_data = False
        for s, e in zip(cuts[:-1], cuts[1:]):
            is_data = (not prev_data) and rng.randrange(2) == 0
            prev_data = is_data
            if is_data:
                sh.add(Fragment(sh.data_len, e - s, DATA, s))
            else:
                sh.add(Fragment(rng.randrange(num_consts), e - s, CONSTS, s))
        sh.assert_correct()
        return sh

    # -- split ------------------------------------------------------------

    def prune_consts(self) -> List[int]:
        """Renumber const mem_idx densely; returns old-index list
        (fragmented.rs:352-366)."""
        hits = {}
        perm: List[int] = []
        for f in self.fragments:
            if f.content == CONSTS:
                if f.mem_idx not in hits:
                    perm.append(f.mem_idx)
                    hits[f.mem_idx] = len(perm) - 1
                f.mem_idx = hits[f.mem_idx]
        self.num_consts = len(perm)
        return perm

    def full_split(self) -> Tuple["Shape", List[int]]:
        """The shape both halves share + const permutation (memoized;
        fragmented.rs:280-351)."""
        if self._split is not None:
            return self._split, self._split_perm
        l = Shape.empty(self.num_consts)
        for frag in self.fragments:
            length, content, start, mem_idx = (
                frag.len, frag.content, frag.start, frag.mem_idx,
            )
            if start % 2 == 1:
                if content == DATA:
                    length += 1
                    start -= 1
                else:
                    # the straddling first const entry pairs with the
                    # previous fragment's last entry -> one data slot
                    length -= 1
                    start += 1
                    l.add(Fragment(l.data_len, 1, DATA, (start - 2) // 2))
            if length % 2 == 1:
                length -= 1
            if length > 0:
                if content == DATA or length // 2 < MERGE_THRESH:
                    l.add(Fragment(l.data_len, length // 2, DATA, start // 2))
                else:
                    l.add(Fragment(mem_idx, length // 2, CONSTS, start // 2))
        perm = l.prune_consts()
        l.assert_correct()
        self._split = l
        self._split_perm = perm
        return l, perm

    def split(self) -> "Shape":
        return self.full_split()[0]


class FragmentedPoly:
    """MLE with fragment-shared storage (fragmented.rs:384+)."""

    def __init__(self, data: Sequence, consts: Sequence, shape: Shape):
        self.data = list(data)
        self.consts = list(consts)
        self.shape = shape
        assert len(self.data) == shape.data_len, (len(self.data), shape.data_len)
        assert len(self.consts) >= shape.num_consts

    # -- basics ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self.shape)

    def num_vars(self) -> int:
        n = len(self)
        assert n & (n - 1) == 0, "poly length must be a power of two"
        return n.bit_length() - 1

    def items_len(self) -> int:
        return len(self.data) + len(self.consts)

    def get(self, idx: int):
        """Value at global position idx."""
        for f in self.shape.fragments:
            if f.start <= idx < f.start + f.len:
                if f.content == DATA:
                    return self.data[f.mem_idx + (idx - f.start)]
                return self.consts[f.mem_idx]
        raise IndexError(idx)

    def get_range(self, start: int, end: int) -> List:
        """Materialize [start, end) (walks fragments once)."""
        out = []
        for f in self.shape.fragments:
            lo = max(start, f.start)
            hi = min(end, f.start + f.len)
            if lo >= hi:
                continue
            if f.content == DATA:
                off = f.mem_idx + (lo - f.start)
                out.extend(self.data[off : off + (hi - lo)])
            else:
                out.extend([self.consts[f.mem_idx]] * (hi - lo))
        assert len(out) == end - start
        return out

    def vec(self) -> List:
        """Dense materialization (fragmented.rs:838-842)."""
        return self.get_range(0, len(self))

    @classmethod
    def from_dense(cls, values: Sequence) -> "FragmentedPoly":
        values = list(values)
        return cls(values, [], Shape.full(len(values)))

    @classmethod
    def rand(cls, rng, num_vars: int, modulus: int) -> "FragmentedPoly":
        shape = Shape.rand(rng, num_vars)
        return cls.rand_with_shape(rng, shape, modulus)

    @classmethod
    def rand_with_shape(cls, rng, shape: Shape, modulus: int) -> "FragmentedPoly":
        data = [rng.randrange(modulus) for _ in range(shape.data_len)]
        consts = [rng.randrange(modulus) for _ in range(shape.num_consts)]
        return cls(data, consts, shape)

    # -- split / bind / evaluate (fragmented.rs:676-786) ------------------

    def split(self) -> Tuple["FragmentedPoly", "FragmentedPoly"]:
        """(even-index half, odd-index half); both share the split shape."""
        target, perm = self.shape.full_split()
        new_consts = [self.consts[i] for i in perm]
        l_data: List = []
        r_data: List = []
        for tf in target.fragments:
            if tf.content != DATA:
                continue
            vals = self.get_range(2 * tf.start, 2 * (tf.start + tf.len))
            l_data.extend(vals[0::2])
            r_data.extend(vals[1::2])
        return (
            FragmentedPoly(l_data, new_consts, target),
            FragmentedPoly(r_data, new_consts, target),
        )

    def bind(self, t: int, modulus: int) -> "FragmentedPoly":
        """Bind the LOWEST variable: l + t*(r - l) (fragmented.rs:736-747)."""
        l, r = self.split()
        data = [(a + t * (b - a)) % modulus for a, b in zip(l.data, r.data)]
        consts = [(a + t * (b - a)) % modulus for a, b in zip(l.consts, r.consts)]
        return FragmentedPoly(data, consts, l.shape)

    def evaluate(self, point: Sequence[int], modulus: int) -> int:
        """Repeated low-bind over reversed point (fragmented.rs:748-761);
        point[-1] binds first, matching the dense convention in ops/poly/mle."""
        assert len(point) == self.num_vars()
        cur = self
        for t in reversed(list(point)):
            cur = cur.bind(t, modulus)
        return cur.get(0)

    def split_at(self, idx: int) -> Tuple["FragmentedPoly", "FragmentedPoly"]:
        """Split by variable `idx` counted from the TOP (0 = MSB), i.e.
        deinterleave chunks of length N >> (1+idx) (fragmented.rs:526-675;
        generalized to any shape — the reference restricts to Data[+Consts])."""
        n = len(self)
        chunk = n >> (1 + idx)
        assert chunk >= 1
        halves: List[Tuple[List, Shape, List]] = []
        for parity in (0, 1):
            sh = Shape.empty(self.shape.num_consts)
            data: List = []
            pos = 0
            for cstart in range(parity * chunk, n, 2 * chunk):
                # keep const runs const where a source fragment covers the
                # whole sub-range; otherwise materialize as data
                for f in self.shape.fragments:
                    lo = max(cstart, f.start)
                    hi = min(cstart + chunk, f.start + f.len)
                    if lo >= hi:
                        continue
                    if f.content == CONSTS:
                        dl0 = sh.data_len
                        sh.add(Fragment(f.mem_idx, hi - lo, CONSTS, pos))
                        if sh.data_len > dl0:  # short run absorbed into data
                            data.extend([self.consts[f.mem_idx]] * (hi - lo))
                    else:
                        off = f.mem_idx + (lo - f.start)
                        sh.add(Fragment(sh.data_len, hi - lo, DATA, pos))
                        data.extend(self.data[off : off + (hi - lo)])
                    pos += hi - lo
            perm = sh.prune_consts()
            sh.assert_correct()
            halves.append((data, sh, [self.consts[i] for i in perm]))
        (ld, ls, lc), (rd, rs, rc) = halves
        return FragmentedPoly(ld, lc, ls), FragmentedPoly(rd, rc, rs)

    # -- maps (fragmented.rs:811-835) --------------------------------------

    @staticmethod
    def map_over_poly(
        ins: Sequence["FragmentedPoly"], exec_fn: Callable, n_outs: int,
        modulus: int,
    ) -> List["FragmentedPoly"]:
        """Apply an entrywise map over same-shape polys; data and consts map
        independently (shape is preserved)."""
        shape = ins[0].shape
        for p in ins[1:]:
            assert p.shape is shape or (
                [dataclasses.astuple(f) for f in p.shape.fragments]
                == [dataclasses.astuple(f) for f in shape.fragments]
            ), "map_over_poly requires a shared shape"
        out_data: List[List] = [[] for _ in range(n_outs)]
        for k in range(shape.data_len):
            outs = exec_fn([p.data[k] for p in ins])
            for j in range(n_outs):
                out_data[j].append(outs[j] % modulus)
        out_consts: List[List] = [[] for _ in range(n_outs)]
        for k in range(shape.num_consts):
            outs = exec_fn([p.consts[k] for p in ins])
            for j in range(n_outs):
                out_consts[j].append(outs[j] % modulus)
        return [
            FragmentedPoly(out_data[j], out_consts[j], shape)
            for j in range(n_outs)
        ]


class RowFormatPoly:
    """Thin format-checked wrapper (format_helpers.rs:5-40): a fragmented
    poly asserted to be [Data block | const tail] — the "row" layout used
    by the legacy witness generators."""

    def __init__(self, poly: FragmentedPoly):
        frags = poly.shape.fragments
        assert 1 <= len(frags) <= 2
        assert frags[0].content == DATA
        if len(frags) == 2:
            assert frags[1].content == CONSTS
        self.poly = poly

    @classmethod
    def new(cls, values: Sequence, pad, total_len: int, modulus: int) -> "RowFormatPoly":
        values = [v % modulus for v in values]
        sh = Shape(
            [Fragment(0, len(values), DATA, 0)]
            + (
                [Fragment(0, total_len - len(values), CONSTS, len(values))]
                if total_len > len(values)
                else []
            ),
            1,
        )
        return cls(FragmentedPoly(values, [pad % modulus], sh))

    def data_len(self) -> int:
        return self.poly.shape.data_len

    def pad(self):
        return self.poly.consts[0] if self.poly.consts else None
