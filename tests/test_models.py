"""Model-level tests: VAE forward/loss, VQ layer, diffusion scheduler math
vs closed-form, UNet shape/grid invariants, end-to-end diffusion loss +
sampling smoke (SURVEY.md §4 items 3-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# whole-model compiles dominate (ROADMAP suite-timing notes)
pytestmark = pytest.mark.slow

import mink_octtree_stablediffusion_tpu as mt
from mink_octtree_stablediffusion_tpu import diffusion as md
from mink_octtree_stablediffusion_tpu import models as mm


def sphere_tensor(rng, b=2, res=16, cap=512):
    pts = rng.randn(b, 200, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    vox = [mt.ops.sparse_quantize_np((p + 1) * (res / 2 - 0.51), 1.0)
           for p in pts]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    st = jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 1)), capacity=cap, batch_size=b, valid=v))(
        jnp.asarray(cpad), jnp.asarray(vpad))
    return st


VAE_KW = dict(channels=(8, 16, 16, 16, 4),
              encoder_capacities=(256, 64, 32, 32, 32),
              decoder_capacities=(32, 256, 1024, 4096))


@pytest.fixture(scope="module")
def vae_env():
    """Shared VAE build: init + one jitted forward — the VAE tests reuse
    these instead of re-compiling per test (CPU-suite wall-clock,
    VERDICT r1 item 6)."""
    st = sphere_tensor(np.random.RandomState(0))
    vae = mm.VAE(**VAE_KW)
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st, st.grid,
                                  jax.random.PRNGKey(1))

    def run(v, s):
        (out_clss, targets, sout, mean, log_var, z), new_state = vae.apply(
            v, s, s.grid, jax.random.PRNGKey(1), mutable=["batch_stats"])
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var)
        return loss, aux, sout, targets

    loss, aux, sout, targets = jax.jit(run)(variables, st)
    return st, vae, variables, (loss, aux, sout, targets)


def test_vae_forward_and_loss(vae_env):
    st, vae, variables, (loss, aux, sout, targets) = vae_env
    assert np.isfinite(float(loss))
    assert float(aux["bce"]) > 0
    # training decode force-keeps targets → final level has >= target voxels
    assert int(sout.count()) >= int(targets[-1].sum()) > 0
    assert sout.tensor_stride == (1, 1, 1)


def test_vae_grads_finite(vae_env):
    st, vae, variables, _ = vae_env

    def loss_fn(params, s):
        (out_clss, targets, _, mean, log_var, _), _ = vae.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            s, s.grid, jax.random.PRNGKey(1), mutable=["batch_stats"])
        return mm.vae_loss(out_clss, targets, mean, log_var)[0]

    g = jax.jit(jax.grad(loss_fn))(variables["params"], st)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0


def test_vq_layer(rng):
    st = sphere_tensor(rng, b=1, cap=64)
    st = st.with_features(jnp.asarray(rng.randn(64, 4).astype(np.float32))
                          ).mask_features()
    vq = mm.VectorQuantizer(num_embeddings=16, embedding_dim=4)
    variables = jax.jit(vq.init)(jax.random.PRNGKey(0), st)
    zq, idx, loss = jax.jit(lambda v, s: vq.apply(v, s))(variables, st)
    cb = np.asarray(variables["params"]["embedding"])
    zqn = np.asarray(zq.F)
    v = np.asarray(st.valid)
    # every quantized row is its nearest codebook entry
    d = ((np.asarray(st.F)[:, None, :] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx)[v], d.argmin(1)[v])
    np.testing.assert_allclose(zqn[v], cb[d.argmin(1)[v]], rtol=1e-5)
    assert float(loss) >= 0


def test_vq_layer_ema_updates_codebook(rng):
    """EMA mode: the codebook lives in vq_stats (no gradient), moves
    toward assigned encoder outputs each train step, and dead codes are
    re-seeded from the batch when restart_dead is set."""
    st = sphere_tensor(rng, b=1, cap=64)
    st = st.with_features(jnp.asarray(rng.randn(64, 4).astype(np.float32))
                          ).mask_features()
    vq = mm.VectorQuantizer(num_embeddings=8, embedding_dim=4, ema=True,
                            ema_decay=0.5, restart_dead=True)
    variables = jax.jit(vq.init)(jax.random.PRNGKey(0), st)
    assert "params" not in variables  # codebook is state, not a param
    book0 = np.asarray(variables["vq_stats"]["embedding"])
    step = jax.jit(lambda v, s: vq.apply(v, s, mutable=["vq_stats"]))
    (zq, idx, loss), upd = step(variables, st)
    book1 = np.asarray(upd["vq_stats"]["embedding"])
    assert not np.allclose(book0, book1)  # codes moved toward the batch
    assert np.all(np.isfinite(book1))
    assert float(loss) >= 0
    # a second step keeps moving and stays finite
    (zq2, idx2, loss2), upd2 = step({"vq_stats": upd["vq_stats"]}, st)
    assert np.all(np.isfinite(np.asarray(upd2["vq_stats"]["embedding"])))
    # eval mode leaves state untouched
    (zq3, _, _), upd3 = jax.jit(lambda v, s: vq.apply(
        v, s, train=False, mutable=["vq_stats"]))(variables, st)
    np.testing.assert_array_equal(
        np.asarray(upd3["vq_stats"]["embedding"]), book0)


def test_scheduler_matches_closed_form():
    s = md.DDPMScheduler.create(num_train_timesteps=100)
    x0 = jnp.ones((4, 2))
    eps = jnp.full((4, 2), 0.5)
    t = jnp.array([0, 10, 50, 99])
    xt = s.add_noise(x0, eps, t)
    ac = np.asarray(s.alphas_cumprod)[np.asarray(t)]
    expect = np.broadcast_to(
        np.sqrt(ac)[:, None] * 1.0 + np.sqrt(1 - ac)[:, None] * 0.5, (4, 2))
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=1e-5)

    # DDIM with eta=0 at the final step recovers x0 exactly from exact eps
    d = md.DDIMScheduler.create(num_train_timesteps=100)
    xt_last = d.add_noise(x0, eps, jnp.array([5, 5, 5, 5]))
    prev = d.step(eps, jnp.int32(5), jnp.int32(-1), xt_last, None)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), rtol=1e-4,
                               atol=1e-4)


def test_ddim_scheduler_variants():
    # steps_offset shifts every timestep (clipped to the train range)
    d = md.DDIMScheduler.create(num_train_timesteps=100)
    ts0 = d.timestep_schedule(10)
    ts1 = d.timestep_schedule(10, steps_offset=1)
    np.testing.assert_array_equal(
        np.asarray(ts1), np.clip(np.asarray(ts0) + 1, 0, 99))

    # set_alpha_to_one=False uses ᾱ_0 for the final step → result differs
    # from exact x0 recovery by the √ᾱ_0 scaling
    d0 = md.DDIMScheduler.create(num_train_timesteps=100,
                                 set_alpha_to_one=False)
    assert abs(d0.final_alpha_cumprod -
               float(np.asarray(d0.alphas_cumprod)[0])) < 1e-7
    x0 = jnp.ones((4, 2))
    eps = jnp.full((4, 2), 0.5)
    xt = d0.add_noise(x0, eps, jnp.array([5, 5, 5, 5]))
    prev = d0.step(eps, jnp.int32(5), jnp.int32(-1), xt, None)
    ac0 = d0.final_alpha_cumprod
    expect = np.sqrt(ac0) * np.asarray(x0) + np.sqrt(1 - ac0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(prev), expect, rtol=1e-4, atol=1e-4)


def test_ddpm_step_reduces_toward_x0():
    s = md.DDPMScheduler.create(num_train_timesteps=10)
    x0 = jnp.ones((8, 4)) * 2.0
    key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, x0.shape)
    t = jnp.int32(9)
    xt = s.add_noise(x0, eps, t)
    nxt = s.step(eps, t, jnp.int32(8), xt, jnp.zeros_like(x0))
    # exact eps + no injected noise → prev sample == forward-noised x0 at t-1
    # up to the posterior mean; it should be closer to x0 than xt
    assert float(jnp.mean((nxt - x0) ** 2)) < float(jnp.mean((xt - x0) ** 2))


UNET_KW = dict(channels=(4, 8, 16, 16), attn_max_len=64,
               down_capacities=(32, 16, 8), group=4)


@pytest.fixture(scope="module")
def unet_env():
    """Shared UNet build: one init + one jitted plain forward, reused by
    the grid-invariant, diffusion-loss and remat tests (each used to
    recompile the same ~70s graphs — the suite's top wall-clock items)."""
    lat = latent_tensor(np.random.RandomState(0))
    unet = mm.UNet(**UNET_KW)
    t0 = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(unet.init)(jax.random.PRNGKey(0), lat, t0)
    out = jax.jit(lambda v, x, t: unet.apply(v, x, t))(variables, lat, t0)
    return lat, unet, variables, out


def latent_tensor(rng, b=2, cap=64, c=4, stride=8, res=4):
    vox = [np.unique(rng.randint(0, res, (20, 3)), axis=0) * stride
           for _ in range(b)]
    coords = mt.ops.batched_coordinates_np(vox)
    cpad, vpad = mt.ops.pad_to_capacity(coords, cap)
    feats = rng.randn(cap, c).astype(np.float32)
    return jax.jit(lambda co, f, v: mt.sparse_tensor(
        co, f, capacity=cap, batch_size=b, stride=stride, valid=v))(
        jnp.asarray(cpad), jnp.asarray(feats), jnp.asarray(vpad))


def test_unet_preserves_grid(unet_env):
    lat, unet, variables, out = unet_env
    # epsilon-prediction invariant: output coords == input coords
    # (`diffusion.py:473` asserts the same)
    np.testing.assert_array_equal(np.asarray(out.C), np.asarray(lat.C))
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(lat.valid))
    assert out.F.shape == (64, 4)
    assert np.all(np.isfinite(np.asarray(out.F)))


def test_diffusion_loss_and_sample(unet_env):
    lat, unet, variables, _ = unet_env
    sched = md.DDPMScheduler.create(num_train_timesteps=100)

    def unet_apply(noised, timesteps, ehs):
        return unet.apply(variables, noised, timesteps, ehs)

    loss, aux = jax.jit(lambda lat: md.diffusion_training_loss(
        unet_apply, sched, lat, jax.random.PRNGKey(2),
        nll_params=md.CoordNLLParams.create(), resolution=32))(lat)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["nll_loss"]))

    sampled = jax.jit(lambda lat: md.sample_latent(
        unet_apply, sched, lat, jax.random.PRNGKey(3),
        num_inference_steps=5))(lat)
    assert np.all(np.isfinite(np.asarray(sampled.F)))
    np.testing.assert_array_equal(np.asarray(sampled.C), np.asarray(lat.C))


def test_sample_latent_cfg(rng):
    # conditioning-sensitive stub denoiser (the real-UNet sampling path is
    # covered by test_diffusion_loss_and_sample; this isolates the CFG
    # combination math at a fraction of the compile cost)
    lat = latent_tensor(rng)
    ehs = jnp.asarray(rng.randn(2, 3, 8).astype(np.float32))

    def unet_apply(noised, timesteps, e):
        cond = 0.0 if e is None else jnp.tanh(jnp.sum(e)) * 0.1
        return noised.with_features(noised.features * 0.9 + cond)

    sched = md.DDIMScheduler.create(num_train_timesteps=100)
    sample = lambda **kw: jax.jit(lambda lat: md.sample_latent(
        unet_apply, sched, lat, jax.random.PRNGKey(3),
        num_inference_steps=4, **kw))(lat)
    base = sample(encoder_hidden_state=ehs)
    guided = sample(encoder_hidden_state=ehs, guidance_scale=3.0)
    assert np.all(np.isfinite(np.asarray(guided.F)))
    # scale != 1 with non-trivial conditioning changes the trajectory
    assert not np.allclose(np.asarray(guided.F), np.asarray(base.F))
    # scale 1 short-circuits to the plain conditional path
    one = sample(encoder_hidden_state=ehs, guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(one.F), np.asarray(base.F))
    # CFG identity: with uncond == cond the combination collapses to cond
    same = sample(encoder_hidden_state=ehs, guidance_scale=5.0,
                  uncond_hidden_state=ehs)
    np.testing.assert_allclose(np.asarray(same.F), np.asarray(base.F),
                               rtol=1e-5, atol=1e-5)


def test_unet_level0_skip_forward(unet_env):
    """level0_skip concats the conv_in activation into conv_out's input —
    the identity path around the s1 bottleneck (DESIGN §9, VERDICT r4
    item 6).  Grid invariants must hold and the param tree must grow only
    at conv_out (wider kernel input)."""
    lat, unet, variables, _ = unet_env
    unet_s = mm.UNet(**UNET_KW, level0_skip=True)
    t0 = jnp.zeros((2,), jnp.int32)
    vs = jax.jit(unet_s.init)(jax.random.PRNGKey(0), lat, t0)
    out = jax.jit(lambda v, x, t: unet_s.apply(v, x, t))(vs, lat, t0)
    np.testing.assert_array_equal(np.asarray(out.C), np.asarray(lat.C))
    assert out.F.shape == (64, 4)
    assert np.all(np.isfinite(np.asarray(out.F)))
    k_plain = variables["params"]["conv_out"]["kernel"]
    k_skip = vs["params"]["conv_out"]["kernel"]
    assert k_skip.shape[1] == 2 * k_plain.shape[1]  # concat widened input


def test_unet_attn_window_forward(unet_env):
    """attn_window engages Morton-window attention at levels whose dense
    cell bound exceeds attn_max_len (the res-256 canvas regime) and must
    preserve the grid exactly like full attention."""
    lat, unet, variables, _ = unet_env
    kw = dict(UNET_KW)
    kw["attn_max_len"] = 8  # force the window path at the finer levels
    unet_w = mm.UNet(**kw, attn_window=16)
    t0 = jnp.zeros((2,), jnp.int32)
    vs = jax.jit(unet_w.init)(jax.random.PRNGKey(0), lat, t0)
    out = jax.jit(lambda v, x, t: unet_w.apply(v, x, t))(vs, lat, t0)
    np.testing.assert_array_equal(np.asarray(out.C), np.asarray(lat.C))
    assert np.all(np.isfinite(np.asarray(out.F)))


def test_unet_remat_forward(unet_env):
    # `remat=True` must compose with the UNet's grid plumbing: lifted remat
    # re-flattens module outputs into fresh pytrees, so the pinned skip grids
    # have to be rebound for `cat`'s identity contract.  Parameter structure
    # is unchanged, the forward matches the plain UNet up to fusion-order
    # noise.  (Bit-level fwd+grad equivalence of a remat'd stack is covered
    # at stack scale in test_nn.py — full-UNet grad compiles are the CPU
    # suite's long pole.)
    lat, unet, variables, out = unet_env
    t0 = jnp.zeros((2,), jnp.int32)
    unet_r = mm.UNet(**UNET_KW, remat=True)
    out_r = jax.jit(lambda v, x: unet_r.apply(v, x, t0).features)(
        variables, lat)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out.features),
                               rtol=1e-4, atol=1e-5)
