"""Data-pipeline tests: max_batch_len collation (largest-sample dropping,
`ae_res.py:125-141`), mesh resampling, synthetic datasets, native C++ host
kernels vs numpy (built on demand; skipped if no toolchain)."""

import numpy as np
import pytest

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import data as mdata
from mink_octtree_stablediffusion_tpu import native


def test_collate_drops_largest_first(rng):
    clouds = [rng.randint(0, 100, (n, 3)) for n in (10, 50, 200)]
    cpad, valid, feats, kept = mdata.collate_pointclouds(
        clouds, capacity=512, max_batch_len=100)
    # the 200-point sample must be dropped, 10+50 kept
    assert kept == [0, 1]
    assert int(valid.sum()) <= 60  # dedup may shrink
    # batch ids re-assigned contiguously
    bids = set(cpad[valid][:, 0].tolist())
    assert bids == {0, 1}


def test_collate_never_empty(rng):
    clouds = [rng.randint(0, 100, (500, 3))]
    cpad, valid, _, kept = mdata.collate_pointclouds(
        clouds, capacity=64, max_batch_len=10)
    assert kept == [0]
    assert 0 < int(valid.sum()) <= 64


def test_resample_mesh_on_surface(rng):
    # unit right triangle in the z=0 plane
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]])
    pts = mdata.resample_mesh_count(verts, faces, 500, rng)
    assert len(pts) == 500
    assert np.allclose(pts[:, 2], 0)
    assert np.all(pts[:, 0] >= -1e-9) and np.all(pts[:, 1] >= -1e-9)
    assert np.all(pts[:, 0] + pts[:, 1] <= 1 + 1e-9)


def test_synthetic_shapes_deterministic():
    ds = mdata.SyntheticShapes(resolution=16, num_samples=8, with_class=True)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["coords"], b["coords"])
    assert a["caption"].startswith("a picture of a ")
    assert all(ds[i]["coords"].max() < 16 for i in range(8))


def test_native_matches_numpy(rng):
    if not native.available():
        try:
            from mink_octtree_stablediffusion_tpu.native.build import build

            build(verbose=False)
        except Exception:
            pytest.skip("no native toolchain")
    assert native.available()
    pts = (rng.rand(3000, 3) * 64 - 8).astype(np.float32)
    c_n, inv_n = native.sparse_quantize(pts, 1.0, return_inverse=True)
    c_p, inv_p = mt.ops.sparse_quantize_np(pts, 1.0, return_inverse=True)
    np.testing.assert_array_equal(c_n, c_p)
    np.testing.assert_array_equal(inv_n, inv_p)
    xyz = rng.randint(-100, 100, (500, 3)).astype(np.int32)
    np.testing.assert_array_equal(
        native.morton_codes(xyz, 2),
        mt.ops.morton_encode_np(xyz, 2))


def test_native_label_consensus(rng):
    if not native.available():
        pytest.skip("native lib not built")
    coords = np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1], [2, 2, 2],
                       [2, 2, 2]], np.int32)
    labels = np.array([5, 5, 7, 1, 2], np.int32)
    uc, ul, inv = native.quantize_label(coords, labels, invalid_label=-100)
    got = {tuple(c): l for c, l in zip(uc.tolist(), ul.tolist())}
    assert got[(0, 0, 0)] == 5       # agreeing labels kept
    assert got[(1, 1, 1)] == 7
    assert got[(2, 2, 2)] == -100    # conflict → invalid


def test_prefetch_loader_order_and_sharding():
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    src = [{"x": np.full((8, 2), i, np.float32), "i": np.int32(i)}
           for i in range(7)]
    out = list(mt.data.PrefetchLoader(iter(src), prefetch=3))
    assert [int(b["i"]) for b in out] == list(range(7))
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), src[i]["x"])
        assert isinstance(b["x"], jax.Array)

    # data-parallel sharding commit
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    out = list(mt.data.PrefetchLoader(
        ({"x": np.arange(16, dtype=np.float32).reshape(8, 2)} for _ in
         range(2)), sharding=sh))
    assert out[0]["x"].sharding == sh

    # source errors surface at the consumer
    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("boom")
    it = mt.data.PrefetchLoader(bad(), prefetch=1)
    next(it)
    try:
        next(it)
        raised = False
    except RuntimeError:
        raised = True
    assert raised

    # early close unblocks a full queue
    with mt.data.PrefetchLoader(iter(src), prefetch=1) as pl:
        next(pl)


def test_capacity_schedule_covers_surface_occupancy():
    # the example capacity schedule must hold the measured per-level voxel
    # counts of surface data (levels shrink ~4x, NOT 8x: surfaces are 2-D
    # sets) — an 8x-decay schedule silently top-k clips >90% of the latent
    import sys
    sys.path.insert(0, ".")
    from examples.train_vae import capacities
    from mink_octtree_stablediffusion_tpu.data import SyntheticShapes

    ds = SyntheticShapes(resolution=64, num_samples=8)
    batch = [np.asarray(ds[i]["coords"]) for i in range(8)]
    n_in = sum(len(v) for v in batch)
    cap = 2 * n_in  # the schedule assumes ~50% input-buffer utilization
    enc, dec = capacities(cap)
    for lvl, c_enc in zip((1, 2, 3), enc):
        occ = sum(len(np.unique(v >> lvl, axis=0)) for v in batch)
        assert c_enc >= occ, (lvl, c_enc, occ)
    # decoder candidate sets mirror the encoder one level finer (+ the
    # stride-1 level must hold the full input)
    for lvl, c_dec in zip((3, 2, 1, 0), dec):
        occ = sum(len(np.unique(v >> lvl, axis=0)) for v in batch)
        assert c_dec >= occ, (lvl, c_dec, occ)


# ---------------------------------------------------------------------------
# Real-data ingestion: authored mesh fixtures through the full entry path
# (VERDICT r3 item 4/7): load_off/load_obj/load_glb → resample →
# normalize → voxelize → collate → one VAE train step.  Mirrors the
# reference's `examples/ae_res.py:143-214` / `examples/dataset.py:129-220`.
# ---------------------------------------------------------------------------

_CUBE_VERTS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
_CUBE_FACES = np.array(
    [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
     [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
     [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]])


def _write_off(path, verts=_CUBE_VERTS, faces=_CUBE_FACES, packed=False):
    with open(path, "w") as f:
        if packed:  # some ModelNet files pack counts onto the OFF line
            f.write(f"OFF{len(verts)} {len(faces)} 0\n")
        else:
            f.write(f"OFF\n{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(" ".join(map(str, v)) + "\n")
        for fc in faces:
            f.write("3 " + " ".join(map(str, fc)) + "\n")


def _write_obj(path, verts=_CUBE_VERTS, quad=False):
    with open(path, "w") as f:
        for v in verts:
            f.write("v " + " ".join(map(str, v)) + "\n")
        if quad:  # n-gon faces + v/vt/vn syntax must fan-triangulate
            f.write("f 1/1/1 2/2/2 3/3/3 4/4/4\n")
            f.write("f 5//5 6//6 7//7 8//8\n")
        else:
            for fc in _CUBE_FACES:
                f.write("f " + " ".join(str(i + 1) for i in fc) + "\n")


def _write_glb(path, verts=_CUBE_VERTS, faces=_CUBE_FACES):
    """Author a minimal valid GLB: one mesh primitive, POSITION + indices."""
    import json
    import struct

    pos = verts.astype("<f4").tobytes()
    idx = faces.astype("<u2").reshape(-1).tobytes()
    idx += b"\x00" * ((-len(idx)) % 4)
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(pos) + len(idx)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos)},
            {"buffer": 0, "byteOffset": len(pos), "byteLength": len(idx)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123,
             "count": faces.size, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1}]}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    binc = pos + idx
    total = 12 + 8 + len(js) + 8 + len(binc)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(binc), 0x004E4942) + binc)


def test_load_off_fixture(tmp_path):
    p = str(tmp_path / "cube.off")
    _write_off(p)
    v, f = mdata.load_off(p)
    assert v.shape == (8, 3) and f.shape == (12, 3)
    p2 = str(tmp_path / "packed.off")
    _write_off(p2, packed=True)
    v2, f2 = mdata.load_off(p2)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(f, f2)


def test_load_obj_fixture(tmp_path):
    p = str(tmp_path / "cube.obj")
    _write_obj(p)
    v, f = mdata.load_obj(p)
    assert v.shape == (8, 3) and f.shape == (12, 3)
    # n-gons fan-triangulate; v/vt/vn and v//vn faces parse
    p2 = str(tmp_path / "quads.obj")
    _write_obj(p2, quad=True)
    v2, f2 = mdata.load_obj(p2)
    assert v2.shape == (8, 3) and f2.shape == (4, 3)
    assert f2.max() == 7 and f2.min() == 0


def test_load_glb_fixture(tmp_path):
    p = str(tmp_path / "cube.glb")
    _write_glb(p)
    v, f = mdata.load_glb(p)
    assert v.shape == (8, 3) and f.shape == (12, 3)
    assert f.max() == 7


def _modelnet_root(tmp_path, ext=".off"):
    writer = _write_off if ext == ".off" else _write_obj
    for ci, cls in enumerate(("chair", "table")):
        for phase in ("train", "test"):
            d = tmp_path / cls / phase
            d.mkdir(parents=True)
            for i in range(2):
                # distinct scales so shapes differ per file
                writer(str(d / f"{cls}_{i}{ext}"),
                       verts=_CUBE_VERTS * (1.0 + ci + 0.5 * i))
    return str(tmp_path)


def test_modelnet40_dataset_ingests_off(tmp_path):
    root = _modelnet_root(tmp_path / "mn40")
    cache = str(tmp_path / "cache")
    ds = mdata.ModelNet40Dataset(root, phase="train", resolution=32,
                                 cache_dir=cache, with_class=True)
    assert len(ds) == 4 and ds.classes == ["chair", "table"]
    s = ds[0]
    vox = s["coords"]
    assert vox.ndim == 2 and vox.shape[1] == 3
    assert vox.min() >= 0 and vox.max() < 32
    # a cube surface at res 32 occupies hundreds of cells, hollow inside
    assert 300 < len(vox) < 32 ** 2 * 6
    assert s["caption"] == "a picture of a chair"
    assert ds[2]["label"] == 1
    # npy cache: second read hits the cache even if the mesh changes
    import os as _os
    assert any(n.endswith(".npy") for n in _os.listdir(cache))
    _write_off(ds.files[0], verts=_CUBE_VERTS * 9.0)
    s2 = ds[0]
    np.testing.assert_array_equal(s["coords"], s2["coords"])


def test_shapenet_dataset_ingests_obj(tmp_path):
    root = _modelnet_root(tmp_path / "shapenet", ext=".obj")
    ds = mdata.ShapeNetDataset(root, phase="train", resolution=32)
    assert len(ds) == 4
    vox = ds[1]["coords"]
    assert vox.min() >= 0 and vox.max() < 32 and len(vox) > 300


def test_objaverse_dataset_ingests_glb(tmp_path):
    root = tmp_path / "objaverse"
    root.mkdir()
    _write_glb(str(root / "abc123.glb"))
    img_dir = tmp_path / "views"
    img_dir.mkdir()
    np.save(str(img_dir / "abc123.npy"),
            np.zeros((1, 3, 8, 8), np.float32))
    ds = mdata.ObjaverseDataset(str(root), resolution=32,
                                image_dir=str(img_dir))
    assert len(ds) == 1
    s = ds[0]
    assert s["uid"] == "abc123"
    assert s["coords"].max() < 32 and len(s["coords"]) > 300
    assert s["image_cond"].shape == (1, 3, 8, 8)


def test_mesh_ingestion_to_vae_train_step(tmp_path):
    """The reference's full entry path on an authored mesh: OFF → resample
    → voxelize → collate → SparseTensor → one VAE train step
    (`examples/ae_res.py:817-848` semantics)."""
    import jax
    import optax

    import mink_octtree_stablediffusion_tpu.train as mtrain
    from mink_octtree_stablediffusion_tpu import models as mm

    root = _modelnet_root(tmp_path / "mn40")
    ds = mdata.ModelNet40Dataset(root, phase="train", resolution=16)
    clouds = [ds[i]["coords"] for i in range(2)]
    cap, b, res = 8192, 2, 16
    cpad, valid, feats, kept = mdata.collate_pointclouds(clouds, cap)
    assert kept == [0, 1]

    cells = (res // 8) ** 3
    vae = mm.VAE(channels=(4, 8, 8, 8, 2),
                 encoder_capacities=(2048, 512, 64, 64, 64),
                 decoder_capacities=(max(b * cells, 16), 512, 2048, 8192),
                 latent_canvas=True)

    def build(cpad, valid, feats):
        return mt.sparse_tensor(cpad, feats, capacity=cap, batch_size=b,
                                valid=valid, extent=(res,) * 3)

    st = build(cpad, valid, feats)
    rng = jax.random.PRNGKey(0)
    variables = vae.init(rng, st, st.grid, rng)
    state = mtrain.TrainState.create(variables["params"],
                                     variables.get("batch_stats", {}),
                                     optax.adam(1e-3))

    def loss_fn(params, batch_stats, batch, rng):
        st = build(*batch)
        (out_clss, targets, sout, mean, log_var, _), upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid,
            rng, mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var, 1e-6)
        return loss, (aux, upd["batch_stats"])

    step_fn = mtrain.make_train_step(loss_fn)
    state2, loss, aux = step_fn(state, (cpad, valid, feats), rng)
    assert np.isfinite(float(loss))
    assert float(aux["bce"]) > 0
