"""RectPoly: the TPU-native equivalent of the reference's jagged VecVecPolynomial.

The reference stores bucket polynomials as jagged ``Vec<Vec<F>>`` rows with
implicit row/column padding (/root/reference/src/cleanup/polys/vecvec.rs:150-206):
a poly over ``col_logsize + row_logsize`` variables whose row ``r`` holds data
``data[r][0..len_r]``, then ``row_pad`` up to the logical row size
``2^row_logsize``, with rows beyond ``n_data_rows`` equal to ``col_pad``.
Pointer-chasing jagged rows are TPU-hostile, so here the same polynomial is a
**rectangular** limb array of shape ``(2^col_logsize, capacity, n_limbs)``:

  * ``capacity`` is a physical power-of-two >= every row's data length but
    typically far below ``2^row_logsize`` (e.g. 2^9 vs 2^16 for the Pippenger
    image) — that factor is exactly the memory the jagged layout saves;
  * all pads inside the capacity window are **materialized** (slots past a
    row's data hold ``row_pad``; rows past ``n_data_rows`` hold ``col_pad``),
    so kernels are mask-free;
  * the logical tail beyond ``capacity`` is handled in closed form by the
    sumcheck: indices >= capacity have eq-weight ``1 - prod(1-q_pad)``
    (utils.rs:189-220 padded_eq_poly_sequence semantics).

Pads are tracked as host ints (one value per poly — the reference's
``row_pad``/``col_pad`` fields); layer maps transform them with the same
AlgFn, which is how the constant pads stay consistent across GKR layers.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..field import limbs as fl
from ..field.spec import FieldSpec
from .algfn import AlgFn, apply_fn
from . import mle


@dataclasses.dataclass
class RectPoly:
    """Rectangular jagged polynomial (see module docstring).

    data: uint32[2^col_logsize, capacity, n_limbs], capacity >= 2 a power of 2.
    """

    spec: FieldSpec
    data: jnp.ndarray
    row_pad: int
    col_pad: int
    row_logsize: int
    n_data_rows: int

    @property
    def col_logsize(self) -> int:
        return int(self.data.shape[0]).bit_length() - 1

    @property
    def capacity(self) -> int:
        return int(self.data.shape[1])

    @property
    def cap_logsize(self) -> int:
        return self.capacity.bit_length() - 1

    @property
    def num_vars(self) -> int:
        return self.col_logsize + self.row_logsize

    # -- construction ---------------------------------------------------------
    @classmethod
    def from_rows(
        cls,
        spec: FieldSpec,
        rows: Sequence[Sequence[int]],
        row_pad: int,
        col_pad: int,
        row_logsize: int,
        col_logsize: int,
        min_capacity: int = 2,
    ) -> "RectPoly":
        """Build from host jagged rows of ints (vecvec.rs:179-190 semantics)."""
        n_rows = 1 << col_logsize
        assert len(rows) <= n_rows
        max_len = max((len(r) for r in rows), default=0)
        capacity = max(min_capacity, 2)
        while capacity < max_len:
            capacity *= 2
        assert capacity <= (1 << row_logsize) or (1 << row_logsize) < 2, (
            capacity,
            row_logsize,
        )
        flat = []
        for r in range(n_rows):
            row = list(rows[r]) if r < len(rows) else []
            pad = row_pad if r < len(rows) else col_pad
            row = row + [pad] * (capacity - len(row))
            flat.extend(row)
        enc = fl.encode_ints(spec, flat).reshape(n_rows, capacity, spec.n_limbs)
        return cls(
            spec=spec,
            data=jnp.asarray(enc),
            row_pad=row_pad % spec.modulus,
            col_pad=col_pad % spec.modulus,
            row_logsize=row_logsize,
            n_data_rows=len(rows),
        )

    # -- semantics ------------------------------------------------------------
    def to_dense(self) -> jnp.ndarray:
        """Materialize the full 2^num_vars table (tests / small sizes only)."""
        n_rows, cap = self.data.shape[0], self.capacity
        full_row = 1 << self.row_logsize
        if full_row <= cap:
            dense = self.data[:, :full_row]
        else:
            pads = np.zeros((n_rows, full_row - cap), dtype=np.int64)
            vals = [self.row_pad] * self.n_data_rows + [self.col_pad] * (
                n_rows - self.n_data_rows
            )
            tail = np.stack(
                [
                    fl.encode_ints(self.spec, [v] * (full_row - cap))
                    for v in vals
                ]
            )
            dense = jnp.concatenate([self.data, jnp.asarray(tail)], axis=1)
        return dense.reshape(n_rows * full_row, self.spec.n_limbs)

    def evaluate(self, point: Sequence[int]) -> int:
        assert len(point) == self.num_vars
        return mle.evaluate(self.spec, self.to_dense(), point)


def _exec_pads(spec: FieldSpec, fn: AlgFn, pads: Sequence[int]) -> List[int]:
    """Run an AlgFn on host pad scalars."""
    args = [jnp.asarray(fl.encode_ints(spec, [s])) for s in pads]
    return [fl.decode_ints(spec, o)[0] for o in apply_fn(fn, args)]


def rect_map(polys: Sequence[RectPoly], fn: AlgFn) -> List[RectPoly]:
    """Elementwise AlgFn over rect polys (vecvec.rs:480-540 vecvec_map).

    Under an ambient mesh the bucket-row axis is sharded so the map runs
    SPMD (the reference's per-row rayon parallelism, vecvec.rs:514-529);
    elementwise maps need no collectives."""
    polys = list(polys)[: fn.n_ins]
    spec = polys[0].spec
    datas = [p.data for p in polys]
    from ...parallel import context as _pctx

    mesh = _pctx.get_mesh()
    if mesh is not None and _pctx.shardable(
        int(datas[0].shape[0]), mesh, min_per_device=1
    ):
        from ...parallel.sharded import shard_rect

        datas = [shard_rect(mesh, d) for d in datas]
    outs = apply_fn(fn, datas)
    row_pads = _exec_pads(spec, fn, [p.row_pad for p in polys])
    col_pads = _exec_pads(spec, fn, [p.col_pad for p in polys])
    return [
        RectPoly(
            spec=spec,
            data=o,
            row_pad=rp,
            col_pad=cp,
            row_logsize=polys[0].row_logsize,
            n_data_rows=polys[0].n_data_rows,
        )
        for o, rp, cp in zip(outs, row_pads, col_pads)
    ]


def _repad_capacity2(p: RectPoly) -> RectPoly:
    """Ensure capacity >= 2 by appending a row_pad/col_pad column (the
    reference's odd-row re-padding, vecvec.rs:182-186)."""
    if p.capacity >= 2:
        return p
    n_rows = p.data.shape[0]
    vals = [p.row_pad] * p.n_data_rows + [p.col_pad] * (n_rows - p.n_data_rows)
    pad_col = jnp.asarray(fl.encode_ints(p.spec, vals)).reshape(
        n_rows, 1, p.spec.n_limbs
    )
    return dataclasses.replace(p, data=jnp.concatenate([p.data, pad_col], axis=1))


def rect_map_split(
    polys: Sequence[RectPoly], fn: AlgFn, bundle_size: int
) -> List[RectPoly]:
    """Apply fn then split every output at LO(0) (within-row de-interleave),
    arranging interleaved bundles (vecvec.rs:542-606 vecvec_map_split).

    Only LO(0) splits occur on jagged polys in the reference pipeline.
    """
    mapped = rect_map(polys, fn)
    ls: List[RectPoly] = []
    rs: List[RectPoly] = []
    for m in mapped:
        left = dataclasses.replace(
            m, data=m.data[:, 0::2], row_logsize=m.row_logsize - 1
        )
        right = dataclasses.replace(
            m, data=m.data[:, 1::2], row_logsize=m.row_logsize - 1
        )
        ls.append(_repad_capacity2(left))
        rs.append(_repad_capacity2(right))
    out: List[RectPoly] = []
    for b in range(0, len(mapped), bundle_size):
        out.extend(ls[b : b + bundle_size])
        out.extend(rs[b : b + bundle_size])
    return out


def rect_map_split_to_dense(
    polys: Sequence[RectPoly], fn: AlgFn, bundle_size: int
) -> List[jnp.ndarray]:
    """Map + LO(0) split when the split exhausts the row variables: outputs
    are plain dense column vectors over the col vars
    (vecvec.rs:608-654 vecvec_map_split_to_dense)."""
    mapped = rect_map(polys, fn)
    out: List[jnp.ndarray] = []
    for b in range(0, len(mapped), bundle_size):
        chunk = mapped[b : b + bundle_size]
        for m in chunk:
            assert m.row_logsize == 1, m.row_logsize
            out.append(m.data[:, 0])
        for m in chunk:
            out.append(m.data[:, 1])
    return out
