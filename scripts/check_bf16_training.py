"""bf16-vs-fp32 training-quality check: VAE loss curves under both MXU
compute-dtype policies (roadmap: "bf16 end-to-end training run validation").

Trains the same VAE twice from the same init on a fixed 4-shell overfit
workload — once with the conv compute dtype forced to fp32, once bf16
(fp32 params/accumulation in both; only the conv MXU math changes) — and
compares the BCE trajectories.  Pass criterion: the bf16 final BCE is
within ``--tol`` (relative) of fp32's, i.e. mixed precision does not
change optimization behavior (the reference trains fp32-only; bf16 is the
TPU speed lever, `docs/ROADMAP.md` item 2).

Usage: python scripts/check_bf16_training.py [--small] [--steps N]
"""

import argparse
import sys

import numpy as np
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.devices()
    except RuntimeError as e:
        print(f"[check_bf16] backend unavailable ({e}); using CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402
from mink_octtree_stablediffusion_tpu import models as mm  # noqa: E402
from mink_octtree_stablediffusion_tpu import train as mtr  # noqa: E402

from bench_vae_step_common import make_batch  # noqa: E402


def run(dtype, vae, tx, variables, cs, vs, cap, b, res, steps, log_every):
    mt.ops.set_default_compute_dtype(dtype)

    def loss_fn(params, batch_stats, batch, rng):
        c, v = batch
        st = mt.sparse_tensor(c, jnp.ones((cap, 1)), capacity=cap,
                              batch_size=b, valid=v, extent=(res,) * 3)
        out, upd = vae.apply(
            {"params": params, "batch_stats": batch_stats}, st, st.grid,
            rng, train=True, mutable=["batch_stats"])
        out_clss, targets, sout, mean, log_var, z = out
        loss, aux = mm.vae_loss(out_clss, targets, mean, log_var)
        return loss, (aux, upd["batch_stats"])

    step_fn = mtr.make_train_step(loss_fn)
    state = mtr.TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
    rng = jax.random.PRNGKey(1)
    curve = []
    n_fix = cs.shape[0]
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, loss, aux = step_fn(state, (cs[i % n_fix], vs[i % n_fix]), sub)
        if i % log_every == 0 or i == steps - 1:
            curve.append((i, float(aux["bce"])))
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--tol", type=float, default=0.15)
    args = ap.parse_args()

    if args.small:
        b, res, cap, pts = 2, 16, 1024, 300
        kw = dict(channels=(8, 16, 16, 16, 4),
                  encoder_capacities=(512, 256, 64, 64, 64),
                  decoder_capacities=(64, 256, 512, 1024))
    else:
        b, res, cap, pts = 4, 64, 32768, 60000
        kw = dict(channels=(32, 128, 512, 512, 4),
                  encoder_capacities=(16384, 8192, 2048, 2048, 2048),
                  decoder_capacities=(2048, 8192, 16384, 32768))

    rng = np.random.RandomState(0)
    # fixed 4-batch overfit set (the reference's --small_dataset harness)
    cs, vs = make_batch(rng, 4, b, cap, res, pts)
    vae = mm.VAE(**kw)
    tx = mtr.vae_optimizer(1e-3)
    st0 = jax.jit(lambda c, v: mt.sparse_tensor(
        c, jnp.ones((cap, 1)), capacity=cap, batch_size=b, valid=v,
        extent=(res,) * 3))(cs[0], vs[0])
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0), st0, st0.grid,
                                  jax.random.PRNGKey(0))

    log_every = max(args.steps // 10, 1)
    curves = {}
    for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        curves[name] = run(dt, vae, tx, variables, cs, vs, cap, b, res,
                           args.steps, log_every)
        print(f"{name}: " + "  ".join(f"{i}:{l:.4f}"
                                      for i, l in curves[name]), flush=True)
    mt.ops.set_default_compute_dtype(None)

    f32_final = curves["fp32"][-1][1]
    bf16_final = curves["bf16"][-1][1]
    rel = abs(bf16_final - f32_final) / max(f32_final, 1e-8)
    f32_first = curves["fp32"][0][1]
    print(f"final BCE fp32={f32_final:.4f} bf16={bf16_final:.4f} "
          f"rel_diff={rel:.3f}")
    assert f32_final < 0.7 * f32_first, "fp32 run failed to optimize"
    assert bf16_final < 0.7 * f32_first, "bf16 run failed to optimize"
    assert rel < args.tol, f"bf16 diverged from fp32 by {rel:.1%}"
    print("BF16 TRAINING OK")


if __name__ == "__main__":
    main()
