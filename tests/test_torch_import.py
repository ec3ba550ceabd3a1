"""Reference-checkpoint import: name translation, layout transforms, and
the exactness of the attention projection folding (SURVEY.md §2.2 naming;
`MinkowskiConvolution.py:263-287`, `diffusion_block.py:400-500`)."""

import pytest

# compile-heavy: excluded from the fast subset
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import models as mm
from mink_octtree_stablediffusion_tpu.nn.attention import SparseAttention
from mink_octtree_stablediffusion_tpu.utils import torch_import as ti


def _sphere(rng, b=2, res=16, cap=512):
    pts = rng.randn(b, 200, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    vox = [mt.ops.sparse_quantize_np((p + 1) * (res / 2 - 0.51), 1.0)
           for p in pts]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    return jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 1)), capacity=cap, batch_size=b, valid=v))(
        jnp.asarray(cpad), jnp.asarray(vpad))


def _torch_shape(tkey: str, tmpl: np.ndarray):
    """The torch-side shape for a given reference key / our template."""
    if tkey.endswith(".kernel"):
        return tmpl.shape[1:] if (tmpl.ndim == 3 and tmpl.shape[0] == 1) \
            else tmpl.shape
    if ".bn." in tkey:                       # BatchNorm1d: 1-D params
        return tmpl.shape
    if tkey.endswith(".bias") and any(
            s in tkey for s in ("time_emb_proj", "linear_1", "linear_2")):
        return tmpl.shape                    # nn.Linear bias stays (C,)
    if tkey.endswith(".weight"):             # nn.Linear weight (out, in)
        if tmpl.ndim == 2:
            return tmpl.shape[::-1]
        return (1,) + tmpl.shape             # StableInstanceNorm (1, G)
    if tkey.endswith(".bias"):
        return (1,) + tmpl.shape             # conv / stable-norm bias (1, C)
    raise AssertionError(tkey)


def _synth_sd(variables, rng, prefix=""):
    """Reference-style state dict covering every leaf of `variables`."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    paths = ["/".join(str(k.key) for k in p) for p, _ in flat]
    scoped = [p.replace("/encoder/", "/").replace("/decoder/", "/")
              for p in paths]
    sd, expected = {}, {}
    attn_bases = {}
    for path, leaf in zip(paths, [l for _, l in flat]):
        parts = path.split("/")
        coll, rest = parts[0], parts[1:]
        tpre = prefix
        if rest[0] in ("encoder", "decoder"):
            tpre, rest = f"{prefix}{rest[0]}.", rest[1:]
        if "attentions" in rest:
            cut = rest.index("attentions")
            tkey = ti._translate([coll] + rest[:cut] + ["conv1", "kernel"],
                                 scoped)
            base = (tpre + tkey.rsplit(".conv1.kernel", 1)[0] +
                    ".attentions.transformer_encoder")
            if rest[cut + 2] == "to_q":
                attn_bases[base] = int(np.asarray(leaf).shape[-1])
            continue
        tkey = tpre + ti._translate([coll] + rest, scoped)
        # small weights: random N(0,1) kernels overflow through a deep
        # decoder; the comparison only needs distinct values
        val = (rng.randn(*_torch_shape(tkey, np.asarray(leaf))) * 0.05
               ).astype(np.float32)
        if tkey.endswith("running_var"):
            val = np.abs(val) + 0.1  # a variance; keep the forward finite
        sd[tkey] = val
        expected[path] = ti._adapt(val, np.asarray(leaf), path)
    for base, d in sorted(attn_bases.items()):
        sd[f"{base}.to_q.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"{base}.to_kv.weight"] = rng.randn(2 * d, d).astype(np.float32)
        sd[f"{base}.to_out.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"{base}.to_out.bias"] = rng.randn(d).astype(np.float32)
        sd[f"{base}.attn.in_proj_weight"] = rng.randn(3 * d, d).astype(
            np.float32)
        sd[f"{base}.attn.out_proj.weight"] = rng.randn(d, d).astype(
            np.float32)
    return sd, expected


def test_vae_import_exact(rng):
    st = _sphere(rng)
    vae = mm.VAE(channels=(8, 16, 16, 16, 4),
                 encoder_capacities=(256, 64, 32, 32, 32),
                 decoder_capacities=(32, 256, 1024, 4096))
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st, st.grid,
                                  jax.random.PRNGKey(1))
    sd, expected = _synth_sd(variables, rng)
    new_vars, report = ti.convert_module(sd, variables)
    assert report["missing"] == [] and report["unused"] == []
    flat = jax.tree_util.tree_flatten_with_path(new_vars)[0]
    for p, leaf in flat:
        path = "/".join(str(k.key) for k in p)
        np.testing.assert_array_equal(np.asarray(leaf), expected[path],
                                      err_msg=path)
    # imported weights actually run
    out = jax.jit(lambda v, s: vae.apply(v, s, s.grid, jax.random.PRNGKey(2),
                                         train=False)[2].features)(
        new_vars, st)
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_import_covers_all_leaves(rng):
    cap = 64
    vox = [np.unique(rng.randint(0, 8, (40, 3)), axis=0) * 8
           for _ in range(2)]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    st = jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 4)), capacity=cap, batch_size=2, stride=8,
        valid=v))(jnp.asarray(cpad), jnp.asarray(vpad))
    unet = mm.UNet(channels=(4, 8, 16, 16), attn_max_len=32,
                   down_capacities=(32, 16, 8), group=4, with_attn=True)
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), st,
                                   jnp.zeros((2,), jnp.int32))
    sd, expected = _synth_sd(variables, rng)
    new_vars, report = ti.convert_module(sd, variables)
    assert report["missing"] == [] and report["unused"] == []
    # non-attention leaves must match the direct transform
    flat = jax.tree_util.tree_flatten_with_path(new_vars)[0]
    n_checked = 0
    for p, leaf in flat:
        path = "/".join(str(k.key) for k in p)
        if path in expected:
            np.testing.assert_array_equal(np.asarray(leaf), expected[path],
                                          err_msg=path)
            n_checked += 1
    assert n_checked > 50


def test_attention_fold_matches_reference_math(rng):
    d, L = 8, 6
    wq_to = rng.randn(d, d).astype(np.float32) * 0.3
    wkv_to = rng.randn(2 * d, d).astype(np.float32) * 0.3
    wo_to = rng.randn(d, d).astype(np.float32) * 0.3
    b_out = rng.randn(d).astype(np.float32) * 0.1
    in_proj = rng.randn(3 * d, d).astype(np.float32) * 0.3
    wo_proj = rng.randn(d, d).astype(np.float32) * 0.3
    sd = {"a.to_q.weight": wq_to, "a.to_kv.weight": wkv_to,
          "a.to_out.weight": wo_to, "a.to_out.bias": b_out,
          "a.attn.in_proj_weight": in_proj,
          "a.attn.out_proj.weight": wo_proj}
    fold = ti._fold_attention(sd, "a", None, set())

    x = rng.randn(1, L, d).astype(np.float32)
    # reference forward (diffusion_block.py:400-500): double projection,
    # nn.MultiheadAttention core (scale 1/sqrt(d)), residual
    q = x @ wq_to.T
    k = (x @ wkv_to.T)[..., :d]
    v = (x @ wkv_to.T)[..., d:]
    q2, k2, v2 = (q @ in_proj[:d].T, k @ in_proj[d:2 * d].T,
                  v @ in_proj[2 * d:].T)
    logits = q2 @ k2.transpose(0, 2, 1) / np.sqrt(d)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = (w @ v2) @ wo_proj.T @ wo_to.T + b_out + x

    params = {"to_q": {"kernel": jnp.asarray(fold["to_q/kernel"])},
              "to_kv": {"kernel": jnp.asarray(fold["to_kv/kernel"])},
              "to_out": {"kernel": jnp.asarray(fold["to_out/kernel"]),
                         "bias": jnp.asarray(fold["to_out/bias"])}}
    out = SparseAttention(num_heads=1).apply(
        {"params": params}, jnp.asarray(x), jnp.ones((1, L), bool))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
