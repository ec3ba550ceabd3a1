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
