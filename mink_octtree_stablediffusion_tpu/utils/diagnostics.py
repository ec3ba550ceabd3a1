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
