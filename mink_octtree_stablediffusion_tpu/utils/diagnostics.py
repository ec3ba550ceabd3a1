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
