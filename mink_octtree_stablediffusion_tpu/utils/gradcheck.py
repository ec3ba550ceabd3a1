"""Numeric gradient verification (reference `utils/gradcheck.py:34-60` wraps
`torch.autograd.gradcheck`; here `jax.test_util.check_grads`)."""

from __future__ import annotations


def gradcheck(fn, args, order: int = 1, atol: float = 1e-2,
              rtol: float = 1e-2, eps: float = 1e-3) -> bool:
    """True if analytic grads of ``fn(*args)`` match finite differences."""
    from jax.test_util import check_grads

    check_grads(fn, args, order=order, modes=("rev",), atol=atol, rtol=rtol,
                eps=eps)
    return True
