"""Global engine switches.

Parity with the reference's module-level setters
(`MinkowskiTensor.py:71-103` set_sparse_tensor_operation_mode,
`MinkowskiCoordinateManager.py:53-97` set_memory_manager/coordinate_map_type,
`pybind/extern.hpp:684-690` MinkowskiAlgorithm
DEFAULT/MEMORY_EFFICIENT/SPEED_OPTIMIZED).  Here the knobs are the LUT size
ceiling (query strategy trade) and the conv fusion threshold (peak-memory
trade).
"""

from __future__ import annotations

from enum import Enum

from .ops import lut as _lut
from .ops import conv as _conv


class Algorithm(Enum):
    DEFAULT = "default"
    MEMORY_EFFICIENT = "memory"
    SPEED_OPTIMIZED = "speed"


_DEFAULTS = {
    Algorithm.DEFAULT: dict(lut_max_entries=2_097_152,
                            fused_threshold=1 << 21),
    # smaller LUTs + per-offset conv loop → lower peak memory
    Algorithm.MEMORY_EFFICIENT: dict(lut_max_entries=262_144,
                                     fused_threshold=1 << 18),
    # bigger LUTs + always-fused gather-GEMM → fastest
    Algorithm.SPEED_OPTIMIZED: dict(lut_max_entries=16_777_216,
                                    fused_threshold=1 << 26),
}

_current = Algorithm.DEFAULT


def set_algorithm(mode) -> None:
    """Switch the engine trade-off profile (affects subsequently traced
    computations)."""
    global _current
    mode = Algorithm(mode) if not isinstance(mode, Algorithm) else mode
    cfg = _DEFAULTS[mode]
    _lut.LUT_MAX_ENTRIES = cfg["lut_max_entries"]
    _conv.DEFAULT_FUSED_THRESHOLD = cfg["fused_threshold"]
    _current = mode


def get_algorithm() -> Algorithm:
    return _current
