"""Model summary (reference `utils/summary.py:12-135` torchsummary-style)."""

from __future__ import annotations

from typing import Any

import numpy as np


def count_params(params: Any) -> int:
    import jax

    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def summary(params: Any, depth: int = 2, file=None) -> str:
    """Per-subtree parameter counts down to ``depth`` path segments."""
    import jax

    rows = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        prefix = "/".join(str(k) for k in keys[:depth])
        rows[prefix] = rows.get(prefix, 0) + int(np.prod(leaf.shape))
    total = sum(rows.values())
    width = max((len(k) for k in rows), default=10)
    lines = [f"{'module':<{width}}  params"]
    for k in sorted(rows):
        lines.append(f"{k:<{width}}  {rows[k]:,}")
    lines.append(f"{'TOTAL':<{width}}  {total:,}")
    out = "\n".join(lines)
    if file is not None:
        print(out, file=file)
    return out


def capacity_report(*tensors, names=None) -> str:
    """Occupancy of each SparseTensor's fixed-capacity buffer — the TPU
    analogue of the reference's hash-occupancy reporting
    (`utils/summary.py:32-37`)."""
    lines = ["tensor      occupied / capacity   util"]
    for i, t in enumerate(tensors):
        n = int(t.count())
        name = names[i] if names else f"tensor{i}"
        lines.append(f"{name:<10}  {n:>8} / {t.capacity:<8}  "
                     f"{n / max(t.capacity, 1):.1%}")
    return "\n".join(lines)
