"""Property tests of the coordinate layer: dedup/inverse round trips
(the invariants documented at `MinkowskiCoordinateManager.py:168-176`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mink_octtree_stablediffusion_tpu import ops


def random_coords(rng, n, batch=4, res=64, d=3):
    b = rng.randint(0, batch, size=(n, 1))
    xyz = rng.randint(0, res, size=(n, d))
    return np.concatenate([b, xyz], axis=1).astype(np.int32)


def test_unique_round_trip(rng):
    coords = random_coords(rng, 500)
    valid = np.ones(500, bool)
    valid[450:] = False
    uc, uv, inv, count = ops.unique_coords(
        jnp.asarray(coords), jnp.asarray(valid), capacity=600
    )
    uc, uv, inv, count = map(np.asarray, (uc, uv, inv, count))
    ref = np.unique(coords[valid[: len(coords)]][: 450], axis=0)
    assert count == len(ref)
    got = uc[uv]
    assert np.array_equal(np.unique(got, axis=0), ref)
    # inverse: every valid input row maps to a unique row with equal coords
    for i in range(450):
        assert np.array_equal(uc[inv[i]], coords[i])
    # invalid rows map to capacity sentinel
    assert np.all(inv[450:] == 600)


def test_unique_canonical_batch_major(rng):
    coords = random_coords(rng, 300, batch=3)
    valid = np.ones(300, bool)
    uc, uv, _, _ = ops.unique_coords(jnp.asarray(coords), jnp.asarray(valid), 400)
    uc, uv = np.asarray(uc), np.asarray(uv)
    got = uc[uv]
    # batch-major
    assert np.all(np.diff(got[:, 0]) >= 0)
    # morton-sorted within batch
    m = ops.morton_encode_np(got[:, 1:])
    for b in range(3):
        mb = m[got[:, 0] == b]
        assert np.all(np.diff(mb) >= 0)


def test_unique_overflow_drops(rng):
    coords = random_coords(rng, 200)
    valid = np.ones(200, bool)
    uc, uv, inv, count = ops.unique_coords(jnp.asarray(coords), jnp.asarray(valid), 50)
    assert int(count) >= 50  # likely 200 unique
    assert int(np.asarray(uv).sum()) == 50


def test_hashtable_build_lookup(rng):
    coords = random_coords(rng, 400)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    cap = n + 37
    padded, valid = ops.pad_to_capacity(coords, cap)
    table = ops.build_table(jnp.asarray(padded), jnp.asarray(valid))
    # every inserted coordinate is found at its own row
    idx = np.asarray(ops.lookup(table, jnp.asarray(padded), jnp.asarray(valid)))
    assert np.array_equal(idx[:n], np.arange(n))
    # missing coordinates return -1
    miss = coords.copy()
    miss[:, 1] += 1000
    midx = np.asarray(ops.lookup(table, jnp.asarray(np.pad(miss, ((0, cap - n), (0, 0)))),
                                 jnp.asarray(valid)))
    assert np.all(midx[:n] == -1)


def test_stride_grid(rng):
    coords = random_coords(rng, 300, res=32)
    grid, _, _ = ops.make_grid(jnp.asarray(coords), jnp.ones(300, bool),
                               capacity=400, stride=1, batch_size=4)
    g2 = ops.stride_grid(grid, 2)
    assert g2.stride == (2, 2, 2)
    got = np.asarray(g2.coords)[np.asarray(g2.valid)]
    ref = np.unique(
        np.concatenate([coords[:, :1], coords[:, 1:] // 2 * 2], axis=1), axis=0
    )
    assert np.array_equal(np.unique(got, axis=0), ref)
    assert np.all(got[:, 1:] % 2 == 0)


def test_expand_grid_children(rng):
    coords = random_coords(rng, 50, res=8)
    coords[:, 1:] *= 2  # stride-2 lattice
    grid, _, _ = ops.make_grid(jnp.asarray(coords), jnp.ones(50, bool),
                               capacity=64, stride=2, batch_size=4)
    offsets = ops.region_offsets(2, 3)  # {0,1}^3
    child = ops.expand_grid(grid, offsets.astype(np.int32), (1, 1, 1),
                            capacity=64 * 8)
    got = np.asarray(child.coords)[np.asarray(child.valid)]
    uniq = np.unique(coords, axis=0)
    ref = []
    for c in uniq:
        for o in offsets:
            ref.append([c[0], c[1] + o[0], c[2] + o[1], c[3] + o[2]])
    ref = np.unique(np.array(ref), axis=0)
    assert np.array_equal(np.unique(got, axis=0), ref)


def test_membership():
    coords = np.array(
        [[0, 0, 0, 0], [0, 2, 4, 6], [1, 2, 2, 2]], dtype=np.int32
    )
    padded, valid = ops.pad_to_capacity(coords, 8)
    grid, _, _ = ops.make_grid(jnp.asarray(padded), jnp.asarray(valid),
                               capacity=8, stride=2, batch_size=2)
    q = np.array([[0, 0, 0, 0], [0, 2, 4, 6], [1, 0, 0, 0], [1, 2, 2, 2]],
                 dtype=np.int32)
    qp, qv = ops.pad_to_capacity(q, 8)
    qgrid = ops.SparseGrid(coords=jnp.asarray(qp), valid=jnp.asarray(qv),
                           stride=(2, 2, 2), batch_size=2)
    m = np.asarray(ops.membership(qgrid, grid))
    assert m[:4].tolist() == [True, True, False, True]
    assert not m[4:].any()


def test_jit_traceable(rng):
    coords = random_coords(rng, 100)

    @jax.jit
    def f(c, v):
        uc, uv, inv, n = ops.unique_coords(c, v, 128)
        table = ops.build_table(uc, uv)
        idx = ops.lookup(table, c, v)
        return idx, n

    idx, n = f(jnp.asarray(coords), jnp.ones(100, bool))
    assert np.all(np.asarray(idx) >= 0)


def test_lut_matches_sorted_lookup(rng):
    """Dense-LUT fast path must agree exactly with binary search."""
    import jax
    import jax.numpy as jnp
    from mink_octtree_stablediffusion_tpu import ops, sparse_tensor

    coords = np.concatenate(
        [rng.randint(0, 2, (48, 1)), rng.randint(0, 16, (48, 3))],
        axis=1).astype(np.int32)
    st = jax.jit(lambda c: sparse_tensor(
        c, jnp.ones((48, 1)), capacity=64, batch_size=2,
        extent=(16, 16, 16)))(jnp.asarray(coords))
    grid = st.grid
    assert grid.extent == (16, 16, 16)
    q = coords.copy()
    q[:, 1:] += rng.randint(-2, 3, (48, 3))  # some off-grid / out-of-extent
    qv = jnp.ones((48,), bool)
    lut_idx = np.asarray(jax.jit(
        lambda g, q: ops.grid_lookup(g, q, qv))(grid, jnp.asarray(q)))
    srt_idx = np.asarray(jax.jit(
        lambda g, q: ops.lookup_sorted(g.coords, g.valid, g.stride, q, qv))(
        grid, jnp.asarray(q)))
    np.testing.assert_array_equal(lut_idx, srt_idx)
    # extent survives striding and the octree grow/prune cycle
    coarse = ops.stride_grid(grid, 2, 64)
    assert coarse.extent == (16, 16, 16)
    spec = ops.KernelSpec(2, 2, ndim=3, transpose=True)
    grown = ops.expand_grid(coarse, spec.absolute_offsets(coarse.stride),
                            (1, 1, 1), 512)
    assert grown.extent == (16, 16, 16)


def test_unique_bounded_key_path_matches_reference(rng):
    """The bounded key-space fast path (sort keys, decode coords by divmod)
    must reproduce the canonical bounded order — unique coords sorted by
    (batch, cell) row-major — with an exact inverse map on BOTH inverse
    routes: the dense-LUT gather (batch_size given) and the searchsorted
    fallback (batch_size unknown)."""
    for stride, res in ((1, 64), (4, 64), (8, 32)):
        for bsz in (3, None):  # LUT inverse vs searchsorted fallback
            coords = random_coords(rng, 700, batch=3, res=res)
            coords[:, 1:] = (coords[:, 1:] // stride) * stride  # aligned
            valid = np.ones(700, bool)
            valid[600:] = False
            c, v = jnp.asarray(coords), jnp.asarray(valid)
            uc, uv, inv, n = ops.unique_coords(
                c, v, 1024, stride=stride, extent=(res,) * 3,
                batch_size=bsz)
            uc, uv, inv = map(np.asarray, (uc, uv, inv))
            ref = np.unique(coords[:600], axis=0)  # lexsort = row-major
            assert int(n) == len(ref)
            assert np.array_equal(uc[uv], ref)
            for i in range(600):
                assert np.array_equal(uc[inv[i]], coords[i])
            assert np.all(inv[600:] == 1024)


def test_unique_bounded_overflow_inverse_sentinel(rng):
    """Rows dropped by capacity overflow map to the capacity sentinel on the
    key-space path (both inverse routes), same as the generic path."""
    for bsz in (2, None):
        coords = random_coords(rng, 300, batch=2, res=64)
        valid = np.ones(300, bool)
        uc, uv, inv, count = ops.unique_coords(
            jnp.asarray(coords), jnp.asarray(valid), 50, extent=(64,) * 3,
            batch_size=bsz)
        uc, uv, inv = map(np.asarray, (uc, uv, inv))
        assert int(count) >= 50
        assert uv.sum() == 50
        kept = inv < 50
        # every kept row's unique coords equal its input coords
        assert np.array_equal(uc[inv[kept]], coords[kept])
        # dropped rows carry the sentinel exactly
        assert np.all(inv[~kept] == 50)
