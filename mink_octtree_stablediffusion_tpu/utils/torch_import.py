"""Import reference torch checkpoints into this framework's parameter trees.

The reference's `(K, Cin, Cout)` Minkowski conv kernels map 1:1 onto our
`SparseConv` kernels, so a trained reference VAE / diffusion UNet can be
carried over exactly.  Layout transforms handled here:

- conv kernels: identity for K>1; `kernel_size=1` convs are stored `(Cin,
  Cout)` by the reference (`use_mm` fast path,
  `MinkowskiConvolution.py:263-276`) and reshape to our `(1, Cin, Cout)`;
- conv bias `(1, Cout)` (`MinkowskiConvolution.py:287`) → `(Cout,)`;
- `MinkowskiBatchNorm` wraps `nn.BatchNorm1d` as `.bn`
  (`MinkowskiNormalization.py:55-102`): weight→scale, bias→bias,
  running_mean/var→batch_stats mean/var;
- `MinkowskiStableInstanceNorm` weight/bias `(1, C//group)`
  (`MinkowskiNormalization.py:329-330`) → `(C//group,)`;
- `nn.Linear` weight `(out, in)` → Dense kernel `(in, out)`;
- attention folding: the reference's `sparseAttention`
  (`diffusion_block.py:400-500`) projects q/kv/out TWICE — its own
  `to_q/to_kv/to_out` linears plus `nn.MultiheadAttention`'s internal
  `in_proj`/`out_proj` (all bias-free except `to_out`,
  `diffusion_block.py:405-431`).  Our `SparseAttention` applies each
  projection once, so the two stages compose into single matrices:
      to_q  ≡ Wq_to^T · Wq_in^T          to_kv ≡ [Wk_to^T·Wk_in^T | Wv_to^T·Wv_in^T]
      to_out ≡ Wo_proj^T · Wo_to^T       (bias: to_out.bias verbatim)
  which is exact — composition of linear maps (softmax sees identical
  logits, scale 1/√(C/heads) matches `nn.MultiheadAttention`).

Module-name translation (reference modules → our flax paths):

    encoder.blockN.layer1.0.net.{0,1}   → encoder/blockN/head/{conv,norm}
    encoder.blockN.layer1.j.(conv|norm)X→ encoder/blockN/blockJ/...
    {stack}.{i}.layer1.0 / .j / .last   → {stack}_{i}/head / blockJ / tail
    attentions.transformer_encoder.*    → blockJ/attentions/SparseAttention_0

(`vae_block.py:180-230` builds the Sequential: geometry op at index 0,
BasicBlocks after, plus a trailing adapt when time-conditioned;
`examples/ae_res.py:436-456,504-544` and `examples/diffusion.py:125-155`
name the stacks.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/Lightning checkpoint as a flat {name: np.ndarray} dict.

    Unwraps Lightning's ``state_dict``/``model.``/``module.`` nesting and
    the reference modules' ``vae.``/``unet.`` prefixes are left intact for
    the caller to strip with `strip_prefix`."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        if hasattr(v, "detach"):
            out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Sub-dict of keys under `prefix` (e.g. "vae."), prefix removed."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _adapt(val: np.ndarray, tmpl: np.ndarray, key: str) -> np.ndarray:
    """Shape-coerce one torch tensor onto our template leaf."""
    val = np.asarray(val, tmpl.dtype)
    if val.shape == tmpl.shape:
        return val
    # (1, C) → (C,): conv bias, StableInstanceNorm weight/bias
    if val.ndim == 2 and val.shape[0] == 1 and val.shape[1:] == tmpl.shape:
        return val[0]
    # (Cin, Cout) volume-1 conv kernel → (1, Cin, Cout)
    if val.ndim == 2 and tmpl.ndim == 3 and tmpl.shape[0] == 1 \
            and val.shape == tmpl.shape[1:]:
        return val[None]
    # torch Linear weight (out, in) → Dense kernel (in, out)
    if val.ndim == 2 and tmpl.ndim == 2 and val.shape == tmpl.shape[::-1]:
        return val.T
    raise ValueError(
        f"{key}: torch shape {val.shape} does not map onto {tmpl.shape}")


_BN = {"scale": "weight", "bias": "bias", "mean": "running_mean",
       "var": "running_var"}


def _norm_key(parts, base: str) -> str:
    """our norm leaf (…/norm1/BatchNorm_0/scale) → torch suffix."""
    kind, leaf = parts[-2], parts[-1]
    if kind.startswith("BatchNorm"):
        return f"{base}.bn.{_BN[leaf]}"
    # StableInstanceNorm / instance variants keep weight/bias names
    return f"{base}.{leaf}"


def _fold_attention(sd: Dict[str, np.ndarray], base: str, tmpl_tree,
                    used: set) -> Dict[str, np.ndarray]:
    """Compose the reference's double q/kv/out projections into our single
    ones (see module docstring).  `base` is
    "...attentions.transformer_encoder"."""
    def take(name):
        used.add(f"{base}.{name}")
        return np.asarray(sd[f"{base}.{name}"], np.float64)

    wq_to = take("to_q.weight")          # (d, dq)
    wkv_to = take("to_kv.weight")        # (2d, dc)
    wo_to = take("to_out.weight")        # (out, d)
    b_out = take("to_out.bias")          # (out,)
    in_proj = take("attn.in_proj_weight")  # (3d, d)
    wo_proj = take("attn.out_proj.weight")  # (d, d)
    d = wq_to.shape[0]
    wq_in, wk_in, wv_in = in_proj[:d], in_proj[d:2 * d], in_proj[2 * d:]
    wk_to, wv_to = wkv_to[:d], wkv_to[d:]
    to_q = wq_to.T @ wq_in.T                     # (dq, d)
    to_kv = np.concatenate([wk_to.T @ wk_in.T, wv_to.T @ wv_in.T], axis=1)
    to_out = wo_proj.T @ wo_to.T                 # (d, out)
    vals = {"to_q/kernel": to_q, "to_kv/kernel": to_kv,
            "to_out/kernel": to_out, "to_out/bias": b_out}
    return {k: np.asarray(v, np.float32) for k, v in vals.items()}


def _stack_tail_index(our_paths, stack: str) -> int:
    """torch Sequential index of the trailing adapt = 1 + #BasicBlocks."""
    n_bb = len({p.split("/")[2] for p in our_paths
                if p.split("/")[1] == stack and
                p.split("/")[2].startswith("block")})
    return 1 + n_bb


def _translate(parts, all_paths) -> Optional[str]:
    """One of our param paths (collection-prefixed, '/'-joined) → torch key.

    Returns None for attention leaves (handled by folding)."""
    stack = parts[1]
    if "attentions" in parts:
        return None
    # top-level modules
    if stack in ("conv_in", "conv_out", "mean_conv", "log_var_conv") or \
            stack.endswith("_cls"):
        leaf = parts[-1]
        return f"{stack}.{leaf}" if len(parts) == 3 else None
    if stack == "time_embedding":
        return f"{stack}.{parts[2]}.{'weight' if parts[3] == 'kernel' else 'bias'}"
    # ResNet stacks: ours "block2_tr_1" → torch "block2_tr.1"; VAE encoder /
    # decoder stacks have no list index ("block3" → "block3")
    if stack[-1].isdigit() and "_" in stack and \
            stack.rsplit("_", 1)[0] in ("block1", "block2", "block3",
                                        "res_mid", "block1_tr", "block2_tr",
                                        "block3_tr"):
        name, idx = stack.rsplit("_", 1)
        tbase = f"{name}.{idx}.layer1"
    else:
        tbase = f"{stack}.layer1"
    sub = parts[2]
    if sub == "head":
        if parts[3] == "conv":
            return f"{tbase}.0.net.0.{parts[-1]}"
        return _norm_key(parts, f"{tbase}.0.net.1")
    if sub == "tail":
        t = _stack_tail_index(all_paths, stack)
        if parts[3] == "conv":
            return f"{tbase}.{t}.net.0.{parts[-1]}"
        return _norm_key(parts, f"{tbase}.{t}.net.1")
    if sub.startswith("block"):
        j = int(sub[len("block"):])
        mod = parts[3]
        if mod in ("conv1", "conv2"):
            return f"{tbase}.{j}.{mod}.{parts[-1]}"
        if mod in ("norm1", "norm2"):
            return _norm_key(parts, f"{tbase}.{j}.{mod}")
        if mod == "time_emb_proj":
            return f"{tbase}.{j}.time_emb_proj." \
                   f"{'weight' if parts[-1] == 'kernel' else 'bias'}"
    raise KeyError("no translation for " + "/".join(parts))


def convert_module(sd: Dict[str, np.ndarray], variables,
                   prefix: str = "", allow_missing: bool = False
                   ) -> Tuple[Any, Dict[str, Any]]:
    """Fill a flax variables tree (params + batch_stats) from a reference
    torch state_dict.  Works for the VAE (`examples/ae_res.py:418-707` —
    pass encoder/decoder variables separately or a combined tree whose
    first-level keys are `encoder`/`decoder`) and the diffusion UNet
    (`examples/diffusion.py:89-265`).

    Returns (new_variables, report) where report lists `missing` (our
    leaves with no torch source) and `unused` (torch keys not consumed).
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)
    paths = ["/".join(str(k.key) for k in p) for p, _ in flat[0]]
    leaves = [l for _, l in flat[0]]
    # VAE trees carry encoder/ decoder as an extra level — fold it into the
    # torch prefix by treating it as part of the module path
    out_leaves = []
    missing, used = [], set()
    attn_cache: Dict[str, Dict[str, np.ndarray]] = {}
    for path, leaf in zip(paths, leaves):
        parts = path.split("/")
        coll, rest = parts[0], parts[1:]
        # encoder./decoder. sub-module prefix (VAE)
        tpre = prefix
        if rest[0] in ("encoder", "decoder"):
            tpre = f"{tpre}{rest[0]}."
            rest = rest[1:]
        scoped = [coll] + rest
        scoped_paths = [p.replace("/encoder/", "/").replace("/decoder/", "/")
                        for p in paths]
        if "attentions" in rest:
            # ...blockJ/attentions/SparseAttention_0/<proj>/<leaf>
            cut = rest.index("attentions")
            tbase_key = _translate(
                [coll] + rest[:cut] + ["conv1", "kernel"], scoped_paths)
            abase = tpre + tbase_key.rsplit(".conv1.kernel", 1)[0] + \
                ".attentions.transformer_encoder"
            if abase not in attn_cache:
                try:
                    attn_cache[abase] = _fold_attention(sd, abase, None, used)
                except KeyError:
                    attn_cache[abase] = {}
            fold = attn_cache[abase]
            key = "/".join(rest[cut + 2:])
            if key in fold:
                out_leaves.append(jax.numpy.asarray(
                    _adapt(fold[key], np.asarray(leaf), path)))
            else:
                missing.append(path)
                out_leaves.append(leaf)
            continue
        try:
            tkey = _translate(scoped, scoped_paths)
        except KeyError:
            tkey = None
        full = None if tkey is None else tpre + tkey
        if full is not None and full in sd:
            used.add(full)
            out_leaves.append(jax.numpy.asarray(
                _adapt(sd[full], np.asarray(leaf), path)))
        else:
            missing.append(path)
            out_leaves.append(leaf)
    if missing and not allow_missing:
        raise KeyError(f"no torch source for {len(missing)} leaves, e.g. "
                       f"{missing[:5]} (pass allow_missing=True to keep "
                       f"initializations)")
    unused = sorted(k for k in sd if k.startswith(prefix) and k not in used
                    and "num_batches_tracked" not in k)
    new_vars = jax.tree_util.tree_unflatten(flat[1], out_leaves)
    return new_vars, {"missing": missing, "unused": unused}
