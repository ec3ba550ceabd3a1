"""Per-instance attention over sparse tensors.

TPU-native re-design of the fork's sparse attention
(`MinkowskiEngine/modules/diffusion_block.py:400-649`): voxels of each batch
instance are packed into a static ``[B, L_max, C]`` buffer with a key-padding
mask (the reference computes L_max dynamically with bincount/cumsum —
`diffusion_block.py:594-617`; here L_max is a static capacity, which the
decomposed-features scatter fills in one shot), attention runs as dense
batched MXU matmuls, and rows are scattered back.  Also includes the
Morton-window transformer (`examples/ae_res.py:344-416`): attention within
fixed windows of the Morton-sorted row order — a pure reshape on TPU since
SparseGrid rows are always Morton-sorted.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..tensor import SparseTensor

_NEG = -1e9


def _mha(q, k, v, mask, num_heads: int):
    """Masked multi-head attention core. q [B,Lq,C], k/v [B,Lk,C],
    mask bool[B,Lk] (True = attend)."""
    b, lq, c = q.shape
    lk = k.shape[1]
    hd = c // num_heads
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    logits = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(hd)
    logits = jnp.where(mask[:, None, None, :], logits, _NEG)
    w = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    w = w * mask[:, None, None, :].astype(w.dtype)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    out = (w @ vh).transpose(0, 2, 1, 3).reshape(b, lq, c)
    return out


class SparseAttention(nn.Module):
    """One residual attention layer with to_q / to_kv / to_out projections —
    the reference `sparseAttention` (`diffusion_block.py:400-500`): q/kv
    linears without bias, output linear with bias, residual connection.
    Self-attention by default; pass ``encoder_hidden_state`` [B, S, D_cross]
    for cross-attention (CLIP conditioning)."""

    num_heads: int = 1
    cross_attention_dim: Optional[int] = None

    @nn.compact
    def __call__(self, packed: jnp.ndarray, mask: jnp.ndarray,
                 encoder_hidden_state: Optional[jnp.ndarray] = None,
                 encoder_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, l, c = packed.shape
        residual = packed
        q = nn.Dense(c, use_bias=False, name="to_q")(packed)
        ctx = packed if encoder_hidden_state is None else encoder_hidden_state
        kv = nn.Dense(2 * c, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        if encoder_hidden_state is None:
            kmask = mask
        else:
            kmask = (encoder_mask if encoder_mask is not None
                     else jnp.ones(ctx.shape[:2], bool))
        out = _mha(q, k, v, kmask, self.num_heads)
        out = nn.Dense(c, use_bias=True, name="to_out")(out)
        return out + residual


class SparseTransformer(nn.Module):
    """Pack → attention → unpack on a SparseTensor — the reference
    `sparseTransformer` (`diffusion_block.py:517-649`, single layer,
    nhead=1)."""

    max_len: int
    num_heads: int = 1
    cross_attention_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: SparseTensor,
                 encoder_hidden_state: Optional[jnp.ndarray] = None
                 ) -> SparseTensor:
        # clamp the pack length to this grid's static per-instance bounds:
        # an instance holds at most prod(ceil(extent/stride)) cells (and
        # never more than the whole buffer), so padding past that is
        # guaranteed-masked work — attention is O(L²), and models pass one
        # max_len for all levels (at a 64³-extent UNet's stride-32 level
        # that was 768-padding for ≤8 real tokens).  No parameter shapes
        # depend on L (projections are per-channel, positional encoding is
        # coordinate-based), so the clamp is purely a speed lever.
        max_len = max(min(self.max_len, x.capacity), 1)
        if x.grid.extent is not None:
            cells = int(np.prod([-(-int(e) // int(s)) for e, s in
                                 zip(x.grid.extent, x.grid.stride)]))
            max_len = max(min(max_len, -(-cells // 128) * 128), 1)
        packed, mask, pos = x.decomposed_features(max_len)
        out = SparseAttention(
            num_heads=self.num_heads,
            cross_attention_dim=self.cross_attention_dim,
        )(packed, mask, encoder_hidden_state)
        out = out * mask[..., None].astype(out.dtype)
        return x.from_decomposed(out, pos)


class MortonWindowTransformer(nn.Module):
    """Windowed attention over the Morton order with interval dilation —
    `MortonWindowTransformer` (`examples/ae_res.py:344-416`).  Rows are
    explicitly (batch, morton)-argsorted inside the module (the canonical
    grid order is row-major for bounded grids), attention runs in fixed
    windows over that order, and outputs scatter back to the original rows.
    ``interval`` > 1 strides rows into dilated windows first (the
    reference's interval transpose trick)."""

    window_size: int = 64
    interval: int = 1
    num_heads: int = 1

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        from ..ops.morton import morton_encode

        n, c = x.features.shape
        w, iv = self.window_size, self.interval
        # impose (batch, morton) order locally
        mcode = morton_encode(x.C[:, 1:],
                              jnp.asarray(np.asarray(x.tensor_stride,
                                                     np.int32)))
        big = np.iinfo(np.int32).max
        morder = jnp.lexsort((jnp.where(x.valid, mcode, big),
                              jnp.where(x.valid, x.C[:, 0], big)))
        x_sorted_feats = x.features[morder]
        x_sorted_valid = x.valid[morder]
        x_sorted_bid = jnp.where(x_sorted_valid, x.C[morder, 0], -1)

        pad = (-n) % (w * iv)
        f = jnp.pad(x_sorted_feats, ((0, pad), (0, 0)))
        m = jnp.pad(x_sorted_valid, (0, pad))
        bid = jnp.pad(x_sorted_bid, (0, pad), constant_values=-1)
        if iv > 1:
            f = f.reshape(-1, iv, c).swapaxes(0, 1).reshape(-1, c)
            m = m.reshape(-1, iv).swapaxes(0, 1).reshape(-1)
            bid = bid.reshape(-1, iv).swapaxes(0, 1).reshape(-1)
        nw = f.shape[0] // w
        fw = f.reshape(nw, w, c)
        mw = m.reshape(nw, w)
        bw = bid.reshape(nw, w)
        # attend only within the same batch instance inside a window
        same = (bw[:, :, None] == bw[:, None, :]) & mw[:, None, :]
        q = nn.Dense(c, use_bias=False, name="to_q")(fw)
        kv = nn.Dense(2 * c, use_bias=False, name="to_kv")(fw)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = c // self.num_heads
        qh = q.reshape(nw, w, self.num_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(nw, w, self.num_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(nw, w, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = (qh @ kh.transpose(0, 1, 3, 2)) / np.sqrt(hd)
        logits = jnp.where(same[:, None, :, :], logits, _NEG)
        wts = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        wts = wts * same[:, None, :, :].astype(wts.dtype)
        wts = wts / jnp.maximum(jnp.sum(wts, axis=-1, keepdims=True), 1e-9)
        out = (wts @ vh).transpose(0, 2, 1, 3).reshape(nw * w, c)
        out = nn.Dense(c, use_bias=True, name="to_out")(out)
        if iv > 1:
            out = out.reshape(iv, -1, c).swapaxes(0, 1).reshape(-1, c)
        out = out[:n]
        # scatter residual back to original row order
        residual = jnp.zeros_like(x.features).at[morder].set(out)
        return x.with_features(x.features + residual)
