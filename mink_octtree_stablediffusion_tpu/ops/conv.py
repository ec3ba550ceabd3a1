"""Generalized sparse convolution: gather → GEMM → accumulate.

TPU-native replacement for the reference's ConvolutionForward/Backward
(`pybind/extern.hpp:53-182`, gather-GEMM-scatter per kernel offset).  The MXU
formulation here is out-centric: for every kernel offset k the input features
are gathered along the precomputed kernel map and multiplied by W_k as one
(N_out, Cin) x (Cin, Cout) matmul; missing neighbors contribute zero.  The
forward pass is scatter-free (deterministic); JAX autodiff produces the
gather-transpose (segment scatter-add) backward automatically, matching the
reference's ConvolutionBackward semantics.

Kernel layout is (K, Cin, Cout), identical to the reference
(`MinkowskiConvolution.py:272-277`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# default fused gather-GEMM size cutoff; see `config.set_algorithm`
DEFAULT_FUSED_THRESHOLD = 1 << 21

# global MXU precision policy: None = auto (bf16 compute with fp32
# accumulation on accelerator backends — the TPU-native training
# configuration — fp32 everywhere on CPU, keeping host tests bit-exact)
_DEFAULT_COMPUTE_DTYPE = None


def set_default_compute_dtype(dtype) -> None:
    """Override the conv-family compute dtype globally (None = auto).

    Read at TRACE time: functions already jit-compiled keep the policy they
    were traced under — set it before building the train step."""
    global _DEFAULT_COMPUTE_DTYPE
    _DEFAULT_COMPUTE_DTYPE = dtype


def default_compute_dtype():
    """Resolve the active compute dtype for conv GEMMs."""
    if _DEFAULT_COMPUTE_DTYPE is not None:
        return _DEFAULT_COMPUTE_DTYPE
    import jax

    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def gather_rows(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features[idx] with -1 → zero row.  idx [M], features [N, C] → [M, C]."""
    m = idx >= 0
    safe = jnp.where(m, idx, 0)
    return features[safe] * m[:, None].astype(features.dtype)


def sparse_conv_apply(
    features: jnp.ndarray,  # [N_in, Cin]
    kernel: jnp.ndarray,  # [K, Cin, Cout]
    nbr_idx: jnp.ndarray,  # int32[K, N_out]
    bias: jnp.ndarray | None = None,
    fused_threshold: int | None = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Apply a sparse convolution given a precomputed kernel map.

    Two schedules:
      * fused  — gather all K neighborhoods into [N_out, K*Cin] and run ONE
        MXU matmul against the [K*Cin, Cout] reshaped kernel (best utilization;
        used when the gathered buffer is small enough).
      * looped — K sequential (N_out, Cin)x(Cin, Cout) matmuls (bounded peak
        memory for large point counts).
    """
    if fused_threshold is None:
        fused_threshold = DEFAULT_FUSED_THRESHOLD
    k, n_out = nbr_idx.shape
    cin = features.shape[1]
    cout = kernel.shape[2]
    dtype = features.dtype
    # bf16 MXU path: gather/GEMM in compute_dtype, fp32 accumulation
    cd = compute_dtype or dtype
    f = features.astype(cd)
    kern = kernel.astype(cd)

    if k * n_out * cin <= fused_threshold:
        # gather straight into [N_out, K, Cin] (no transpose relayout)
        idx_t = nbr_idx.T  # [N_out, K]
        m = (idx_t >= 0)
        g = f[jnp.where(m, idx_t, 0)] * m[..., None].astype(cd)
        g = g.reshape(n_out, k * cin)
        out = jnp.dot(g, kern.reshape(k * cin, cout),
                      preferred_element_type=jnp.float32)
    else:
        out = jnp.zeros((n_out, cout), dtype=jnp.float32)
        for kk in range(k):
            g = gather_rows(f, nbr_idx[kk])
            out = out + jnp.dot(g, kern[kk],
                                preferred_element_type=jnp.float32)
    out = out.astype(dtype)
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def linear_apply(features: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-volume-1 fast path: plain matmul on features (the reference's
    use_mm path, `MinkowskiConvolution.py:312-316`)."""
    w = kernel[0] if kernel.ndim == 3 else kernel
    out = features @ w.astype(features.dtype)
    if bias is not None:
        out = out + bias.astype(features.dtype)
    return out
