"""SparseTensor / TensorField: the central data types.

TPU-native re-design of the reference's tensor layer
(`MinkowskiEngine/MinkowskiTensor.py`, `MinkowskiSparseTensor.py`,
`MinkowskiTensorField.py`).  A :class:`SparseTensor` is an immutable pytree of
``(SparseGrid, features[N_cap, C])``; every operation returns a new tensor.
There is no stateful coordinate manager — two tensors share geometry iff they
hold the *same* SparseGrid object (XLA CSE dedupes the derived hash tables),
and coordinate-identity checks become plain Python ``is`` checks on grids,
mirroring the reference's coordinate_map_key equality asserts
(`MinkowskiTensor.py:484-488`).

Batch is encoded in ``coords[:, 0]`` exactly as the reference does
(`utils/collation.py:30-92`); padding rows carry ``valid == False`` and zero
features, an invariant every op preserves.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .ops import (
    INVALID_COORD,
    SparseGrid,
    interpolate,
    make_grid,
    reduce_by_inverse,
    slice_by_inverse,
    splat,
    splat_coordinates,
)
from .ops import union as _union
from .ops.coords import _tuplize


class SparseTensor(struct.PyTreeNode):
    """COO sparse tensor over a fixed-capacity coordinate set.

    Mirrors the reference `SparseTensor` (`MinkowskiSparseTensor.py:75-287`):
    ``.C`` → batched int coordinates, ``.F`` → features. Rows with
    ``grid.valid == False`` are padding and must hold zero features.
    """

    grid: SparseGrid
    features: jnp.ndarray  # [N_cap, C]

    # -- reference-parity accessors ------------------------------------
    @property
    def C(self) -> jnp.ndarray:  # noqa: N802
        return self.grid.coords

    @property
    def F(self) -> jnp.ndarray:  # noqa: N802
        return self.features

    @property
    def coordinates(self) -> jnp.ndarray:
        return self.grid.coords

    @property
    def valid(self) -> jnp.ndarray:
        return self.grid.valid

    @property
    def tensor_stride(self) -> Tuple[int, ...]:
        return self.grid.stride

    @property
    def capacity(self) -> int:
        return self.grid.capacity

    @property
    def num_channels(self) -> int:
        return self.features.shape[-1]

    @property
    def batch_size(self) -> int:
        return self.grid.batch_size

    def count(self) -> jnp.ndarray:
        return self.grid.count()

    def mask_features(self) -> "SparseTensor":
        """Re-assert the padding invariant (zero features on invalid rows)."""
        f = self.features * self.grid.valid[:, None].astype(self.features.dtype)
        return self.replace(features=f)

    def with_features(self, features: jnp.ndarray) -> "SparseTensor":
        """New tensor on the same grid — the idiom for every feature-space op
        (the reference wraps with the same coordinate_map_key the same way)."""
        assert features.shape[0] == self.capacity
        return SparseTensor(grid=self.grid, features=features).mask_features()

    # -- arithmetic (same-grid fast path; union fallback mirrors
    #    `MinkowskiTensor.py:511-546`) ---------------------------------
    def _binary(self, other, fn):
        if isinstance(other, SparseTensor):
            if other.grid is self.grid:
                return self.with_features(fn(self.features, other.features))
            g, f = _union([self.grid, other.grid], [self.features, other.features])
            if fn is not jnp.add:
                raise ValueError(
                    "mismatched-coordinate arithmetic supports + only "
                    "(reference union fallback is additive)"
                )
            return SparseTensor(grid=g, features=f).mask_features()
        return self.with_features(fn(self.features, other))

    def __add__(self, other):
        return self._binary(other, jnp.add)

    def __sub__(self, other):
        return self._binary(other, jnp.subtract)

    def __mul__(self, other):
        return self._binary(other, jnp.multiply)

    def __truediv__(self, other):
        return self._binary(other, jnp.divide)

    def __neg__(self):
        return self.with_features(-self.features)

    # -- dense conversion (`MinkowskiSparseTensor.py:460-557`) ---------
    def dense(self, shape: Sequence[int], min_coordinate: Sequence[int] | None = None):
        """Densify to ``[B, C, *shape]`` (channel-first like the reference)."""
        d = self.grid.ndim
        mins = np.zeros(d, np.int32) if min_coordinate is None else np.asarray(
            min_coordinate, np.int32
        )
        stride = np.asarray(self.grid.stride, np.int32)
        xyz = (self.C[:, 1:] - jnp.asarray(mins)[None, :]) // jnp.asarray(stride)[None, :]
        b = self.C[:, 0]
        shape = tuple(int(s) for s in shape)
        in_range = self.valid
        for i, s in enumerate(shape):
            in_range = in_range & (xyz[:, i] >= 0) & (xyz[:, i] < s)
        flat_sz = int(np.prod(shape))
        flat = jnp.zeros_like(b)
        for i, s in enumerate(shape):
            flat = flat * s + jnp.clip(xyz[:, i], 0, s - 1)
        dest = jnp.where(in_range, b * flat_sz + flat, self.batch_size * flat_sz)
        out = jnp.zeros((self.batch_size * flat_sz + 1, self.num_channels),
                        self.features.dtype)
        out = out.at[dest].add(
            self.features * in_range[:, None].astype(self.features.dtype)
        )
        dense = out[:-1].reshape((self.batch_size,) + shape + (self.num_channels,))
        return jnp.moveaxis(dense, -1, 1)

    def decomposed_features(self, max_len: int):
        """Pack per-instance features into ``[B, max_len, C]`` + bool mask —
        the reference's attention packing (`diffusion_block.py:594-617`) and
        `decomposed_features` (`MinkowskiTensor.py:277-423`) in one static op.

        Requires canonical (batch-sorted) row order, which every SparseGrid
        maintains.  Returns (packed, mask, row_position) where row_position is
        each row's slot within its instance (for unpacking).
        """
        b = self.batch_size
        bid = self.grid.batch_ids()  # padding → b
        ar = jnp.arange(self.capacity, dtype=jnp.int32)
        # row index of the first row of each instance
        first = jnp.full((b + 1,), self.capacity, jnp.int32).at[bid].min(
            jnp.where(self.valid, ar, self.capacity)
        )
        pos = ar - first[jnp.clip(bid, 0, b)]
        ok = self.valid & (pos < max_len)
        dest = jnp.where(ok, jnp.clip(bid, 0, b) * max_len + pos, b * max_len)
        packed = jnp.zeros((b * max_len + 1, self.num_channels), self.features.dtype)
        packed = packed.at[dest].set(
            self.features * ok[:, None].astype(self.features.dtype)
        )
        mask = jnp.zeros((b * max_len + 1,), bool).at[dest].set(ok)
        return (
            packed[:-1].reshape(b, max_len, self.num_channels),
            mask[:-1].reshape(b, max_len),
            pos,
        )

    def from_decomposed(self, packed: jnp.ndarray, row_position: jnp.ndarray
                        ) -> "SparseTensor":
        """Inverse of :meth:`decomposed_features`: read each row's feature back
        from its ``[B, max_len, C]`` slot."""
        b, max_len, c = packed.shape
        bid = jnp.clip(self.grid.batch_ids(), 0, b - 1)
        ok = self.valid & (row_position < max_len)
        src = jnp.where(ok, bid * max_len + jnp.clip(row_position, 0, max_len - 1), 0)
        flat = packed.reshape(b * max_len, c)
        return self.with_features(flat[src] * ok[:, None].astype(packed.dtype))


def sparse_tensor(
    coordinates: jnp.ndarray,
    features: jnp.ndarray,
    capacity: int | None = None,
    stride=1,
    batch_size: int = 1,
    valid: jnp.ndarray | None = None,
    quantization_mode: str = "sum",
    extent: Optional[Sequence[int]] = None,
) -> SparseTensor:
    """Build a SparseTensor from possibly-duplicated raw coordinates — the
    reference constructor path (`MinkowskiSparseTensor.py:122-345`): dedup via
    sort-unique, reduce duplicate-row features per ``quantization_mode``
    (sum | avg | first ≙ UNWEIGHTED_SUM / UNWEIGHTED_AVERAGE / RANDOM_SUBSAMPLE)."""
    n = coordinates.shape[0]
    cap = capacity or n
    v = valid if valid is not None else jnp.ones((n,), bool)
    grid, inverse, _ = make_grid(coordinates, v, cap, stride, batch_size,
                                 extent=extent)
    f = reduce_by_inverse(features, inverse, v, cap, mode=quantization_mode)
    return SparseTensor(grid=grid, features=f).mask_features()


class TensorField(struct.PyTreeNode):
    """Continuous-coordinate point set with features — the reference's
    `TensorField` (`MinkowskiTensorField.py`).  ``.sparse()`` voxelizes onto a
    lattice; ``slice`` (on the produced tensor) gathers voxel features back to
    the original points via the saved inverse map."""

    coordinates: jnp.ndarray  # float32[M, 1+D]; col 0 = batch index
    features: jnp.ndarray  # [M, C]
    valid: jnp.ndarray  # bool[M]
    batch_size: int = struct.field(pytree_node=False, default=1)
    # static spatial bound: all voxelized coords lie in [0, extent) per dim.
    # Setting it routes every derived grid through the bounded fast paths
    # (flat-key 1-key sort / dense LUT / fused Pallas conv) instead of the
    # unbounded lexsort+hash machinery — on the classification pipeline the
    # unbounded path was both the CPU compile long pole and the reason the
    # fused conv never engaged on TPU.
    extent: Optional[Sequence[int]] = struct.field(pytree_node=False,
                                                   default=None)

    @property
    def C(self) -> jnp.ndarray:  # noqa: N802
        return self.coordinates

    @property
    def F(self) -> jnp.ndarray:  # noqa: N802
        return self.features

    @property
    def capacity(self) -> int:
        return self.coordinates.shape[0]

    @property
    def num_channels(self) -> int:
        return self.features.shape[-1]

    def with_features(self, features: jnp.ndarray) -> "TensorField":
        f = features * self.valid[:, None].astype(features.dtype)
        return self.replace(features=f)

    def sparse(self, capacity: int | None = None, stride=1,
               quantization_mode: str = "avg"):
        """Voxelize → (SparseTensor, inverse_map).  Matches
        `MinkowskiTensorField.py:286-379` (default UNWEIGHTED_AVERAGE)."""
        d = self.coordinates.shape[1] - 1
        s = np.asarray(_tuplize(stride, d), np.int32)
        sj = jnp.asarray(s)
        vox = jnp.concatenate(
            [
                self.coordinates[:, :1].astype(jnp.int32),
                (jnp.floor(self.coordinates[:, 1:] / sj) * sj).astype(jnp.int32),
            ],
            axis=-1,
        )
        vox = jnp.where(self.valid[:, None], vox, INVALID_COORD)
        cap = capacity or self.capacity
        grid, inverse, _ = make_grid(vox, self.valid, cap, tuple(int(x) for x in s),
                                     self.batch_size, extent=self.extent)
        f = reduce_by_inverse(self.features, inverse, self.valid, cap,
                              mode=quantization_mode)
        return SparseTensor(grid=grid, features=f).mask_features(), inverse

    def splat(self, capacity: int | None = None, stride=1):
        """Trilinear splat onto the surrounding lattice corners →
        (SparseTensor, grid) (`MinkowskiTensorField.py:381-406`)."""
        cap = capacity or self.capacity * (2 ** (self.coordinates.shape[1] - 1))
        grid = splat_coordinates(self.coordinates, self.valid, stride, cap,
                                 self.batch_size)
        f = splat(grid, self.coordinates, self.valid, self.features)
        return SparseTensor(grid=grid, features=f).mask_features()


def slice_to_field(tensor: SparseTensor, field: TensorField,
                   inverse: jnp.ndarray) -> TensorField:
    """Gather voxel features back to every original point — the reference's
    `SparseTensor.slice(X)` (`MinkowskiSparseTensor.py:577-632`)."""
    f = slice_by_inverse(tensor.features, inverse, field.valid)
    return field.with_features(f)


def interpolate_at(tensor: SparseTensor, points: jnp.ndarray,
                   points_valid: jnp.ndarray) -> jnp.ndarray:
    """`features_at_coordinates` (`MinkowskiSparseTensor.py:690-718`):
    trilinear sampling of the sparse tensor at continuous points."""
    return interpolate(tensor.grid, tensor.features, points, points_valid)


def cat(*tensors: SparseTensor) -> SparseTensor:
    """Channel concatenation; requires identical grids
    (`MinkowskiOps.py:141-185` requires equal coordinate keys the same way)."""
    g = tensors[0].grid
    assert all(t.grid is g for t in tensors), "cat requires tensors on one grid"
    return SparseTensor(
        grid=g, features=jnp.concatenate([t.features for t in tensors], axis=-1)
    )


def stack_sum(*tensors: SparseTensor) -> SparseTensor:
    g = tensors[0].grid
    assert all(t.grid is g for t in tensors)
    return tensors[0].with_features(sum(t.features for t in tensors))


def stack_mean(*tensors: SparseTensor) -> SparseTensor:
    g = tensors[0].grid
    assert all(t.grid is g for t in tensors)
    return tensors[0].with_features(
        sum(t.features for t in tensors) / float(len(tensors))
    )


def stack_var(*tensors: SparseTensor) -> SparseTensor:
    """Elementwise variance across tensors (`MinkowskiOps.py:221-243`)."""
    g = tensors[0].grid
    assert all(t.grid is g for t in tensors)
    mean = sum(t.features for t in tensors) / float(len(tensors))
    var = sum((t.features - mean) ** 2 for t in tensors) / float(len(tensors))
    return tensors[0].with_features(var)


def to_sparse_dense(dense: jnp.ndarray, capacity: int,
                    stride=1) -> SparseTensor:
    """Dense ``[B, C, *spatial]`` → SparseTensor of its nonzero voxels
    (the reference `to_sparse`, `MinkowskiOps.py:279-317`).  Zero rows beyond
    ``capacity`` are dropped (capacity overflow mirrors top-k clamps)."""
    b, c = dense.shape[0], dense.shape[1]
    spatial = dense.shape[2:]
    d = len(spatial)
    x = jnp.moveaxis(dense, 1, -1).reshape(-1, c)  # [B*prod, C]
    nz = jnp.any(x != 0, axis=-1)
    idx = jnp.arange(x.shape[0])
    coords_cols = [idx // int(np.prod(spatial))]
    rem = idx % int(np.prod(spatial))
    for i, s in enumerate(spatial):
        trail = int(np.prod(spatial[i + 1:])) if i + 1 < d else 1
        coords_cols.append((rem // trail) % s)
    coords = jnp.stack(coords_cols, axis=-1).astype(jnp.int32)
    coords = jnp.where(nz[:, None], coords, INVALID_COORD)
    # rank nonzero rows; rows beyond capacity dropped
    order = jnp.argsort(~nz, stable=True)[:capacity]
    sel_valid = nz[order]
    grid, inverse, _ = make_grid(coords[order], sel_valid, capacity, stride, b)
    f = reduce_by_inverse(x[order], inverse, sel_valid, capacity, mode="sum")
    return SparseTensor(grid=grid, features=f).mask_features()


def cat_slice(tensor: SparseTensor, field: TensorField,
              inverse: jnp.ndarray) -> TensorField:
    """Concatenate each point's own features with its voxel's features —
    the reference's `SparseTensor.cat_slice` (`MinkowskiSparseTensor.py:634-688`)."""
    sliced = slice_by_inverse(tensor.features, inverse, field.valid)
    return field.with_features(
        jnp.concatenate([field.features, sliced], axis=-1))


def dense_coordinates(shape: Sequence[int], batch_size: int = 1) -> jnp.ndarray:
    """All batched coordinates of a dense grid (reference
    `dense_coordinates`, `MinkowskiOps.py:246-276`)."""
    spatial = tuple(int(s) for s in shape)
    axes = [np.arange(s, dtype=np.int32) for s in spatial]
    mesh = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1,
                                                                   len(spatial))
    n = len(mesh)
    rows = np.concatenate(
        [np.repeat(np.arange(batch_size, dtype=np.int32), n)[:, None],
         np.tile(mesh, (batch_size, 1))], axis=1)
    return jnp.asarray(rows)
