"""Build the native host-kernel library:
``python -m mink_octtree_stablediffusion_tpu.native.build``"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(__file__)


def build(verbose: bool = True) -> str:
    src = os.path.join(HERE, "voxelize.cpp")
    out = os.path.join(HERE, "libvoxelize.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print("built", path)
    from . import available

    sys.exit(0 if available() else 1)
