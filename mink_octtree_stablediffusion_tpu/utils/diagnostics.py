"""Environment diagnostics (reference `MinkowskiEngine/diagnostics.py:25-70`:
torch/CUDA/nvcc versions → here jax/jaxlib/flax/optax + device topology)."""

from __future__ import annotations

import platform
import sys


def print_diagnostics(file=sys.stdout):
    import jax
    import jaxlib

    print("=" * 46, file=file)
    print("system:", platform.platform(), file=file)
    print("python:", sys.version.split()[0], file=file)
    print("jax:", jax.__version__, "jaxlib:", jaxlib.__version__, file=file)
    try:
        import flax
        import optax

        print("flax:", flax.__version__, "optax:", optax.__version__,
              file=file)
    except Exception:  # pragma: no cover
        pass
    print("backend:", jax.default_backend(), file=file)
    for d in jax.devices():
        print("  device:", d, file=file)
    print("process_count:", jax.process_count(), file=file)
    print("=" * 46, file=file)


def get_device_memory_info(device=None) -> dict:
    """Device memory statistics (reference `ME.get_gpu_memory_info`,
    `pybind/extern.hpp:832-838`); keys depend on the platform runtime."""
    import jax

    d = device or jax.devices()[0]
    try:
        return dict(d.memory_stats() or {})
    except Exception:
        return {}


def backend_selfcheck(n: int = 2048, res: int = 16, seed: int = 0) -> bool:
    """Fused-graph lookup canary for the current backend.

    Builds a small grid and verifies, inside ONE jit graph that also contains
    a conv-style gather (the combination that exposed a Morton-key
    miscompilation on a TPU backend — see docs/DESIGN.md §7), that every
    valid row finds itself at the kernel center offset.  Returns True when
    the backend is consistent; raise-worthy if not.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from .. import ops, sparse_tensor

    rng = np.random.RandomState(seed)
    coords = np.concatenate(
        [np.zeros((n, 1), np.int32), rng.randint(0, res, (n, 3))],
        axis=1).astype(np.int32)
    cpad, valid = ops.pad_to_capacity(coords, n)
    kernel = rng.randn(27, 3, 4).astype(np.float32)
    spec = ops.KernelSpec(3, 1, ndim=3)

    @jax.jit
    def fused(cpad, valid, kernel):
        grid, inverse, _ = ops.make_grid(cpad, valid, n, batch_size=1)
        nbr = ops.kernel_map(grid, grid, spec)
        feats = jnp.ones((n, 3), jnp.float32) * grid.valid[:, None]
        out = ops.sparse_conv_apply(feats, kernel, nbr)
        return grid.valid, nbr, out

    gv, nbr, _ = fused(jnp.asarray(cpad), jnp.asarray(valid),
                       jnp.asarray(kernel))
    gvn = np.asarray(gv)
    center = np.asarray(nbr)[spec.volume // 2]
    ar = np.arange(n)
    return bool((center[gvn] == ar[gvn]).all())


def backend_differential_suite(n: int = 1024, res: int = 12, seed: int = 0,
                               raise_on_fail: bool = False) -> dict:
    """Per-op accelerator-vs-CPU differential check.

    Runs the engine's core numeric pipeline (geometry build, kernel-map
    search, conv in fp32 and in the bf16 MXU mode, fused Pallas conv,
    feature reduction, global pooling) on the current default backend AND on
    the host CPU backend, and reports the max deviation per op.  This is the
    systematic version of `backend_selfcheck` — the canary that caught a
    real Morton bit-interleave miscompilation inside large fused graphs on
    a TPU backend (docs/DESIGN.md §7).  Run it once at session start on any
    new backend/toolchain.

    Returns {op: {"max_err": float, "tol": float, "ok": bool}, ...,
    "_all_ok": bool}.  On a CPU-only host both runs coincide and every entry
    is exactly 0.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from .. import ops

    rng = np.random.RandomState(seed)
    coords = np.concatenate(
        [np.concatenate([np.full((n // 2, 1), b, np.int32),
                         rng.randint(0, res, (n // 2, 3))], axis=1)
         for b in range(2)]).astype(np.int32)
    cpad, valid = ops.pad_to_capacity(coords, n)
    feats = (rng.randn(n, 8) * valid[:, None]).astype(np.float32)
    kernel = (rng.randn(27, 8, 16) * 0.1).astype(np.float32)
    spec = ops.KernelSpec(3, 1, ndim=3)
    args = tuple(map(jnp.asarray, (cpad, valid, feats, kernel)))

    def pipeline(cpad, valid, feats, kernel, compute_dtype, fused):
        grid, inverse, _ = ops.make_grid(cpad, valid, n, batch_size=2,
                                         extent=(res,) * 3)
        f = ops.reduce_by_inverse(feats, inverse, valid, n, "sum")
        if fused:
            conv = ops.fused_sparse_conv(f, kernel, grid, grid, spec,
                                         compute_dtype=compute_dtype)
        else:
            nbr = ops.kernel_map(grid, grid, spec)
            conv = ops.sparse_conv_apply(f, kernel, nbr,
                                         compute_dtype=compute_dtype)
        bid = jnp.where(grid.valid, grid.coords[:, 0], 2)
        pooled, _ = ops.global_pool(f, bid, 2, grid.valid, "avg")
        return {"geometry_keys": grid.coords.astype(jnp.float32),
                "geometry_valid": grid.valid.astype(jnp.float32),
                "reduce": f, "conv": conv, "global_pool": pooled}

    tols = {"geometry_keys": 0.0, "geometry_valid": 0.0, "reduce": 1e-6,
            "conv": 1e-5, "conv_bf16": 5e-2, "conv_fused_bf16": 5e-2,
            "global_pool": 1e-5}

    def run(device, fused_ok):
        with jax.default_device(device):
            a = tuple(jax.device_put(x, device) for x in args)
            # 'highest': some TPU backends lower fp32 matmuls to bf16 passes
            # by default (docs/DESIGN.md §7) — the fp32 arm must request
            # true fp32 for a cross-backend 1e-5 comparison to be meaningful
            with jax.default_matmul_precision("highest"):
                out = dict(jax.jit(lambda *a: pipeline(
                    *a, compute_dtype=jnp.float32, fused=False))(*a))
            out["conv_bf16"] = jax.jit(
                lambda *a: pipeline(*a, compute_dtype=jnp.bfloat16,
                                    fused=False)["conv"])(*a)
            if fused_ok:
                out["conv_fused_bf16"] = jax.jit(
                    lambda *a: pipeline(*a, compute_dtype=jnp.bfloat16,
                                        fused=True)["conv"])(*a)
            return {k: np.asarray(v, np.float32) for k, v in out.items()}

    cpu = jax.devices("cpu")[0]
    acc = jax.devices()[0]
    accel_is_cpu = acc.platform == "cpu"
    ref = run(cpu, fused_ok=False)
    got = run(acc, fused_ok=not accel_is_cpu)
    # fused-vs-unfused on the accelerator compares against its own bf16 ref
    report = {}
    for k, tol in tols.items():
        if k == "conv_fused_bf16":
            if k not in got:
                continue
            err = float(np.max(np.abs(got[k] - got["conv_bf16"])))
            tol = 1e-2
        elif k == "conv_bf16":
            err = float(np.max(np.abs(got[k] - ref["conv"])))
        else:
            err = float(np.max(np.abs(got[k] - ref[k])))
        report[k] = {"max_err": err, "tol": tol, "ok": err <= tol}
    report["_all_ok"] = all(v["ok"] for k, v in report.items()
                            if k != "_all_ok")
    if raise_on_fail and not report["_all_ok"]:
        bad = {k: v for k, v in report.items()
               if k != "_all_ok" and not v["ok"]}
        raise RuntimeError(f"backend differential failures: {bad}")
    return report
