"""Windowed one-hot gather-GEMM sparse convolution (Pallas, TPU).

The XLA row-gather that drives `ops.conv.sparse_conv_apply` runs far below
streaming bandwidth on narrow rows (docs/DESIGN.md §7) — per-row overhead
dominates.  This kernel removes the row gather entirely by turning it into
MXU work, exploiting a structural property of this engine's kernel maps:
grids are stored in canonical flat-key order and a fixed kernel offset
shifts the flat key by a constant, so ``nbr_idx[k, :]`` is **monotonically
increasing over its valid entries**, and all K neighborhoods of a T-row
output tile live in one narrow contiguous input window.

Per output tile, offsets are processed in delta-sorted BANDS (``group``
offsets sharing the leading-axis displacement, whose flat-key deltas span
~2·S_y instead of the kernel's ~2·S_x — see `_offset_perm`), each band with
its own narrow window:
  1. per band g: ONE DMA of that band's window ``f[lo[t,g] : lo[t,g]+TW]``
     HBM→VMEM (contiguous; channels padded to the 128 lane width);
  2. ``G_k = onehot_k @ window_g`` for the band's offsets — the gather,
     executed as a (T, TW)x(TW, Cin) MXU matmul with
     ``onehot_k[i, j] = (key_window[j] == query_key_k[i])``;
  3. ``out = [G_0 | ... | G_{K-1}] @ W_stack`` — one (T, K*Cin)x(K*Cin,
     Cout) MXU matmul (same contraction as the fused XLA path).

Per-band windows are the speed lever: a union window over all K offsets
spans the whole kernel extent in flat-key space (~17 chunk loops per tile
on the finest octree level), while each band spans barely more than the
tile itself — the gather-matmul FLOPs and window bandwidth drop by the
ratio.  Windows wider than TW (rare: only where occupancy jumps sharply
inside a tile) are handled exactly by looping chunks of TW — never a
fallback, never an approximation.  Banding/monotonicity is a *performance*
property only; the kernel is correct for arbitrary index distributions.

Compute runs in bf16 with fp32 accumulation by default (the one-hot values
and the gathered copies are exact in bf16; only the feature rounding f32→
bf16 is approximate — the framework's established MXU compute mode).  Pass
``compute_dtype=jnp.float32`` for full precision at reduced MXU rate.

This plays the role of the reference's native gather-GEMM-scatter conv
(`pybind/extern.hpp:53-115`) with the gather lifted onto the systolic array.

Backward (custom_vjp) uses the XLA formulation (segment scatter + einsum) —
identical cost to autodiff of the XLA forward, so training is never slower;
a one-hot transpose backward is the next step (docs/ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_ENABLED: bool | None = None  # None = auto (on for TPU-like backends)


def use_onehot_conv(flag: bool | None) -> None:
    """Route bounded-grid convs through the fused Pallas kernel.

    True/False force it; None (default) enables it automatically on
    accelerator backends (CPU keeps the XLA gather path — Mosaic kernels
    don't run there outside interpreter mode)."""
    global _ENABLED
    _ENABLED = flag


def enabled(grid=None) -> bool:
    if _ENABLED is not None:
        flag = _ENABLED
    else:
        flag = jax.default_backend() not in ("cpu",)
    if grid is not None:
        flag = flag and grid.extent is not None
    return flag


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _union_vma(*arrays) -> frozenset:
    """Union of the inputs' varying-manual-axes — under `shard_map` with
    `check_vma=True` the pallas_call out_shape must declare which mesh axes
    the output varies over (it varies wherever any input does)."""
    vma = frozenset()
    for a in arrays:
        vma |= getattr(jax.typeof(a), "vma", frozenset())
    return vma


def _key_layout(cin: int):
    """(separate, cinp): where the flat key travels in the window DMA.

    When the lane padding has spare room (cin % 128 != 0), the key rides a
    spare bitcast lane of an fp32 feature window — free.  When cin is a
    multiple of 128 (the wide reference layers: 128/256/512), an inline key
    lane would pad every matmul by a whole 128-lane block (512→640: a 25%
    MXU tax) and force fp32 window DMAs to keep the bitcast exact; instead
    the keys get their own 128-lane int32 window (lane 0 carries the key —
    Mosaic crashes on any VMEM memref with lane dim < 128) and the features
    ride in the compute dtype (≈40%% less window bandwidth in bf16)."""
    cinp_inline = max(_round_up(cin + 1, 128), 128)
    cinp_plain = max(_round_up(cin, 128), 128)
    return cinp_inline > cinp_plain, cinp_plain


_PACKED = False


def use_packed_window(flag: bool) -> None:
    """Toggle the packed narrow-channel window layout (for A/B benchmarks)."""
    global _PACKED
    _PACKED = flag


def _packed_layout(cin: int):
    """(cs, P, csg) of the packed narrow-channel layout, or None.

    Narrow layers (cin ≤ 63 — the octree decoder's finest levels and the
    3-channel input conv) waste the mandatory 128-lane window: the inline
    layout DMAs fp32 ``[TW, 128]`` rows with only cin+1 lanes used (a 4×
    bandwidth tax at 32 channels, 32× at 3).  Instead, P voxels ride ONE
    window row, each in a cs = roundup(cin+1, 8)-lane slot
    ``[feat_0..cin-1, key, pad]``, plus one constant-1.0 TAG lane at
    ``p*cs`` (so p = (128-1) // cs).  Window DMA bytes, one-hot
    gather-matmul FLOPs and the output-GEMM contraction (the gather
    accumulator keeps csg = roundup(cin, 8) lanes per offset instead of
    128) all shrink ~P×.  The per-slot one-hots are disjoint (keys are
    unique), so instead of 0/1 the slot-s one-hot carries the value 2^s:
    ONE matmul then yields the matched packed row's lanes scaled by 2^s
    AND the slot id itself on the tag lane (2^s·1.0); the slot's feature
    lanes are selected and unscaled by the exact power 2^-s — no second
    matmul, no lane→sublane transpose.

    On-chip verdict (v5e, finest level n=90k/cap=131k 32->32 b=4, bf16):
    exact vs the XLA path and bit-identical to the inline layout
    (scripts/check_packed_tpu.py ALL OK), but SLOWER — fwd 19.6 vs 12.2
    ms, dF 17.0 vs 8.9, dW ~equal: the P× window-byte saving is paid back
    as P compare+cast mask builds over [TW, group*T] plus group·P unscale
    selects per window chunk, and the finest level has VPU headroom but
    no bandwidth headroom only in the window *span*, not its width.
    Stays OFF by default; opt-in via `use_packed_window(True)`."""
    if not _PACKED:
        return None
    cs = _round_up(cin + 1, 8)
    p = (128 - 1) // cs
    if p < 2:
        return None
    return cs, p, _round_up(cin, 8)


# 13.5M: 16M scoped-VMEM limit minus ~2.5M empirical allocator overhead /
# alignment (module-level so tests can shrink it to exercise the band-split
# schedule at cheap widths)
_VMEM_BUDGET = 27 * 2 ** 19


def select_params(cin: int, cout: int, k_pad: int, tile: int, tw: int,
                  compute_dtype, nslots: int = 2) -> tuple | None:
    """Fit (tile, tw, co_t) into the 16M scoped-VMEM limit, or None.

    Mosaic double-buffers every grid-indexed block, so block pairs count
    twice; wide layers would otherwise OOM at AOT compile (e.g. the full
    [27·768, 640] weight block).  Shrinks, in order: the row tile (gather
    accumulator scratch), the DMA window, then the cout block (lane rule:
    multiple of 128 or == cout).  (A/B on the finest octree level showed
    auto-widening the window LOSES: gather-matmul FLOPs scale with tw,
    and spill chunks are cheaper than the extra MXU work.)  None means even
    the smallest legal configuration exceeds the budget (callers fall back
    to the unfused XLA path)."""
    wbytes = jnp.dtype(compute_dtype).itemsize
    sep, cinp = _key_layout(cin)
    packed = _packed_layout(cin)
    if packed is not None:
        cinp = packed[2]  # gcat/weight lanes per offset = csg
    fwbytes = wbytes if sep else 4  # inline/packed layouts DMA fp32 windows

    def est(t, w, c):
        # gcat + feature window + key window (sep only) + weight block
        # + out block + query block.  Mosaic's scoped-vmem stack accounting
        # counts scratch buffers TWICE (measured: a 3.5M gcat showed up as
        # ~7M — a 512-wide layer overflowed by exactly that margin), hence
        # the 2x on gcat and 2*nslots (declared slots x 2) on the windows.
        wlanes = 128 if packed is not None else cinp
        return (2 * t * k_pad * cinp * wbytes +
                2 * nslots * w * wlanes * fwbytes +
                (2 * nslots * w * 128 * 4 if sep else 0) +
                2 * k_pad * cinp * c * wbytes + 2 * t * c * 4 +
                2 * k_pad * t * 4)

    budget = _VMEM_BUDGET
    tiles = [t for t in (tile, tile // 2, tile // 4) if t >= 32] or [32]
    tws = [w for w in (tw, tw // 2) if w >= 128] or [128]
    cos = [c for c in (cout, 512, 384, 256, 128)
           if c == cout or (c < cout and c % 128 == 0)]
    for t in tiles:
        for w in tws:
            for c in cos:
                if est(t, w, c) <= budget:
                    return t, w, c
    return None


def _window_arrays(features, in_keys, tw: int, cin: int, cinp: int,
                   sep: bool, cd, packed=None):
    """(f_aug, k_rep): HBM-side arrays for the window DMAs (see
    `_key_layout`).  Valid keys < 2^30 (flat-key bound); padding clips to
    exactly 2^30 so it can never equal a query key (and, inline, bitcasts
    to a finite float — 0·key stays 0 in the gather matmul)."""
    n = features.shape[0]
    keys = jnp.minimum(in_keys, np.int32(2 ** 30))
    if packed is not None:
        cs, p, _ = packed
        nrow = -(-n // p) + tw
        nv = nrow * p
        fv = jnp.zeros((nv, cs), jnp.float32)
        fv = fv.at[:n, :cin].set(features.astype(jnp.float32))
        kpad = jnp.pad(keys, (0, nv - n), constant_values=np.int32(2 ** 30))
        fv = fv.at[:, cin].set(jax.lax.bitcast_convert_type(
            kpad, jnp.float32))
        f_aug = jnp.pad(fv.reshape(nrow, p * cs),
                        ((0, 0), (0, 128 - p * cs)))
        # constant-1.0 tag lane: the gather matmul lands 2^slot there
        f_aug = f_aug.at[:, p * cs].set(1.0)
        return f_aug, None
    if sep:
        f_aug = jnp.pad(features.astype(cd), ((0, tw), (0, cinp - cin)))
        k_rep = jnp.pad(jnp.pad(keys[:, None], ((0, tw), (0, 0)),
                                constant_values=np.int32(2 ** 30)),
                        ((0, 0), (0, 127)))
        return f_aug, k_rep
    f_aug = jnp.zeros((n + tw, cinp), jnp.float32)
    f_aug = f_aug.at[:n, :cin].set(features.astype(jnp.float32))
    f_aug = f_aug.at[:n, cinp - 1].set(
        jax.lax.bitcast_convert_type(keys, jnp.float32))
    return f_aug, None


def _offset_perm(offs_abs: np.ndarray, s_in: np.ndarray,
                 flat_strides: np.ndarray) -> np.ndarray:
    """Permutation sorting kernel offsets by their flat-key delta.

    A fixed offset shifts every query key by ``(off // stride) ·
    flat_strides`` (the same floor-division the query computation applies),
    so offsets sorted by that delta cluster into bands: consecutive
    ``group``-size bands span a key range of roughly the band's delta spread
    instead of the whole kernel's (for a k=3 cube: 2·S_y instead of 2·S_x —
    a ~Sx/Sy times narrower window).  x-major HYPER_CUBE offsets are already
    sorted; negated (transpose) offsets are reversed, hybrid/custom
    arbitrary — sorting makes banding hold for all of them."""
    deltas = (offs_abs // s_in[None, :]) @ flat_strides
    return np.argsort(deltas, kind="stable")


def _group_bounds(qk: jnp.ndarray, nt: int, tile: int, n_groups: int,
                  group: int, in_keys: jnp.ndarray, tw: int, p: int = 1):
    """Per-(row tile, offset group) window bounds over the sorted keys.

    Returns (lo, nch) int32 FLAT [nt * n_groups] (index ``t*n_groups + g``):
    2D scalar-prefetch operands are lane-padded to 128 in SMEM (a [nt, G]
    i32 bills nt*128*4 bytes — the finest level blew the 1M SMEM budget by
    exactly that), 1D ones are packed.  Groups with no valid query get
    (0, 1): one garbage chunk whose queries are all -1 and can never match a
    window key (keys are clipped to [0, 2^30]), so the gather computes exact
    zeros without a separate empty path."""
    qg = qk.reshape(nt, tile, n_groups, group)
    qv = qg >= 0
    qmin = jnp.min(jnp.where(qv, qg, np.int32(2 ** 30)), axis=(1, 3))
    qmax = jnp.max(jnp.where(qv, qg, np.int32(-1)), axis=(1, 3))
    anyv = jnp.any(qv, axis=(1, 3)).reshape(-1)
    lo = jnp.searchsorted(in_keys, qmin.reshape(-1), side="left")
    hi = jnp.searchsorted(in_keys, qmax.reshape(-1), side="right")
    if p > 1:
        # window rows are PACKED rows of p voxels (see `_packed_layout`)
        lo = lo.astype(jnp.int32) // p
        hi = -(-hi.astype(jnp.int32) // p)
    lo = jnp.where(anyv, (lo.astype(jnp.int32) // 8) * 8, 0)
    nch = jnp.where(anyv,
                    (jnp.maximum(hi.astype(jnp.int32) - lo, 1) - 1) // tw + 1,
                    1)
    return lo.astype(jnp.int32), nch.astype(jnp.int32)


def _window_params(idx_t: jnp.ndarray, tile: int, tw: int):
    """Per-tile union-window start and chunk count over ALL offsets.

    idx_t: int32[n_pad, K] neighbor rows (-1 = missing), n_pad % tile == 0.
    Returns (lo int32[nt], nch int32[nt]).
    """
    n_pad, k = idx_t.shape
    nt = n_pad // tile
    it = idx_t.reshape(nt, tile * k)
    valid = it >= 0
    lo = jnp.min(jnp.where(valid, it, np.int32(2 ** 30)), axis=1)
    hi = jnp.max(jnp.where(valid, it, np.int32(-1)), axis=1)
    any_valid = jnp.any(valid, axis=1)
    # align window starts to the sublane tiling (8) — DMA offsets must be
    # provably 8-divisible on TPU
    lo = jnp.where(any_valid, (lo // 8) * 8, 0).astype(jnp.int32)
    nch = jnp.where(any_valid, (hi - lo) // tw + 1, 0).astype(jnp.int32)
    return lo, nch


@functools.partial(
    jax.jit, static_argnames=("tile", "tw", "compute_dtype", "interpret"))
def onehot_sparse_conv(
    features: jnp.ndarray,  # [N, Cin]
    kernel: jnp.ndarray,  # [K, Cin, Cout]
    nbr_idx: jnp.ndarray,  # int32[K, N_out], -1 = missing neighbor
    tile: int = 256,
    tw: int = 512,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, cin = features.shape
    k, n_out = nbr_idx.shape
    cout = kernel.shape[2]
    nt = -(-n_out // tile)
    n_pad = nt * tile
    cinp = max(_round_up(cin, 128), 128)
    cd = compute_dtype

    idx_t = nbr_idx.T.astype(jnp.int32)
    if n_pad != n_out:
        idx_t = jnp.pad(idx_t, ((0, n_pad - n_out), (0, 0)),
                        constant_values=-1)
    lo, nch = _window_params(idx_t, tile, tw)
    # channel-pad to the lane width; row-pad so chunk DMAs stay in bounds
    f_pad = jnp.pad(features.astype(cd), ((0, tw), (0, cinp - cin)))
    # [K, Cin, Cout] -> [K*CinP, Cout], matching the gcat lane concatenation
    w_stack = jnp.pad(kernel.astype(cd),
                      ((0, 0), (0, cinp - cin), (0, 0))).reshape(
                          k * cinp, cout)

    def kern(lo_ref, nch_ref, idx_ref, f_ref, w_ref, out_ref, fwin, gcat,
             sem):
        t = pl.program_id(0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, tw), 1)
        gcat[...] = jnp.zeros_like(gcat)

        def chunk(c, _):
            base = pl.multiple_of(lo_ref[t] + c * tw, 8)
            cp = pltpu.make_async_copy(f_ref.at[pl.ds(base, tw), :], fwin,
                                       sem)
            cp.start()
            cp.wait()
            w = fwin[:]
            for kk in range(k):
                rel = idx_ref[:, kk:kk + 1] - base  # [T, 1]
                oh = (rel == iota).astype(cd)
                g = jax.lax.dot_general(
                    oh, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sl = slice(kk * cinp, (kk + 1) * cinp)
                gcat[:, sl] = gcat[:, sl] + g.astype(cd)
            return 0

        jax.lax.fori_loop(0, nch_ref[t], chunk, 0)
        out_ref[:] = jax.lax.dot_general(
            gcat[...], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tile, k), lambda t, lo, nch: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            pl.BlockSpec((k * cinp, cout), lambda t, lo, nch: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cout), lambda t, lo, nch: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tw, cinp), cd),
            pltpu.VMEM((tile, k * cinp), cd),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, cout), features.dtype,
                                       vma=_union_vma(features, kernel,
                                                      nbr_idx)),
        interpret=interpret,
    )(lo, nch, idx_t, f_pad, w_stack)
    return out[:n_out]


_SPILL_RING = False  # default pending on-chip Mosaic validation of the
#                      traced ring-slot index (scripts/check_fused_tpu.py)


def use_spill_ring(flag: bool) -> None:
    """Toggle the ring-buffered spill-chunk schedule (a third window slot
    lets chunk c+1 prefetch while chunk c computes; the serial schedule
    start-wait-computes each spill chunk in place).  For A/B benchmarks."""
    global _SPILL_RING
    _SPILL_RING = flag


class _FusedStatic:
    """Hashable static config for the fused conv primitive (custom_vjp
    nondiff arg)."""

    def __init__(self, offs, s_in, extent, tile, tw, group, cd, interpret,
                 s_out=None, ring=None):
        self.offs = tuple(map(tuple, offs))  # absolute units, sign applied
        self.s_in = tuple(s_in)
        self.s_out = tuple(s_out) if s_out is not None else tuple(s_in)
        self.extent = tuple(extent)
        self.tile = tile
        self.tw = tw
        self.group = group
        self.cd = cd
        self.interpret = interpret
        self.ring = _SPILL_RING if ring is None else ring

    def _key(self):
        return (self.offs, self.s_in, self.s_out, self.extent, self.tile,
                self.tw, self.group, jnp.dtype(self.cd).name, self.interpret,
                self.ring)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _FusedStatic) and self._key() == other._key()

    def flipped(self):
        """Static config of the TRANSPOSE direction (for the dF backward):
        grids swap roles, offsets negate, the queried lattice stride becomes
        the forward's output stride."""
        return _FusedStatic([[-o for o in off] for off in self.offs],
                            self.s_out, self.extent, self.tile, self.tw,
                            self.group, self.cd, self.interpret,
                            s_out=self.s_in, ring=self.ring)


_BAND_SPLIT = False


def use_band_split(flag: bool) -> None:
    """Opt into the band-split schedule for over-budget wide layers.

    Measured on v5e (256 rows x 960ch, the reference UNet's widest level):
    the XLA gather path wins 0.41 vs 0.97 ms fwd+bwd — at the channel widths
    that overflow the weight slab, gather rows are wide enough to stream
    efficiently while the split schedule re-streams the slab per row tile —
    so wide layers default to XLA and the split stays opt-in (read at trace
    time)."""
    global _BAND_SPLIT
    _BAND_SPLIT = flag


def conv_schedule(cin: int, cout: int, k_vol: int, group: int, tile: int,
                  tw: int, compute_dtype, nslots: int = 2) -> str | None:
    """Pick the fused schedule: "full" (one kernel holding the whole
    [K·CinP, co_t] weight slab), "split" (per-band kernels), or None (XLA).

    The weight slab re-streams once per row tile, so the split schedule —
    whose per-band slab AND per-band gather accumulator are K/group times
    smaller, allowing a much larger row tile — wins on weight-heavy layers
    where the full schedule's tile was VMEM-shrunk (profiled on v5e: the
    reference UNet's 640ch up-blocks at 4096 rows ran t=32, streaming
    2.8 GB of weights per conv).  Rule: split when its row tile is ≥2× the
    full schedule's (weight traffic at least halves; the band gathers and
    window DMAs are identical in total, the extra cost is just one kernel
    launch and one [N, Cout] sum per additional band).  Layers whose full
    slab exceeds the budget at ANY blocking ("split-or-nothing", e.g.
    960/1280ch) default to the XLA gather path instead — measured faster
    there (wide gather rows stream efficiently; see `use_band_split`)."""
    k_pad = -(-k_vol // group) * group
    p_full = select_params(cin, cout, k_pad, tile, tw, compute_dtype,
                           nslots)
    p_band = _band_params(cin, cout, group, tile, tw, compute_dtype,
                          nslots) if k_vol > group else None
    if p_full is not None:
        # split only pays where the full slab VMEM-shrank the row tile
        # (weight streaming ∝ row-tile count); narrow layers keep the full
        # schedule — their bound is the gather, not the slab
        if (p_band is not None and p_full[0] < tile and
                p_band[0] >= 2 * p_full[0]):
            return "split"
        return "full"
    if p_band is not None and _BAND_SPLIT:
        return "split"
    return None


def _band_params(cin: int, cout: int, group: int, tile: int, tw: int,
                 compute_dtype, nslots: int = 2) -> tuple | None:
    """Blocking for one band of the split schedule.  The per-band slab and
    gather accumulator are K/group times smaller, so a LARGER row tile than
    requested usually fits — and weight traffic scales with the number of
    row tiles, so the biggest fitting tile wins on weight-heavy layers."""
    for t in (4 * tile, 2 * tile, tile):
        p = select_params(cin, cout, group, t, tw, compute_dtype, nslots)
        if p is not None and p[0] == t:
            return p
    return select_params(cin, cout, group, tile, tw, compute_dtype, nslots)


def _flat_geometry(static):
    """(cells, flat_strides) of the input lattice in flat-key space."""
    s_in = np.asarray(static.s_in, np.int64)
    cells = np.asarray([int(np.ceil(e / s)) for e, s in
                        zip(static.extent, s_in)], np.int64)
    flat_strides = np.concatenate(
        [np.cumprod(cells[::-1])[::-1][1:], [1]]).astype(np.int64)
    return s_in, cells, flat_strides


def _fused_impl_split(static, features, kernel, in_coords, in_valid,
                      out_coords, out_valid):
    """Band-split schedule for very wide layers (960/1280-channel UNet
    levels): the full [K·CinP, co_t] weight slab exceeds scoped VMEM at any
    legal blocking, so each delta-sorted band of ``group`` offsets runs the
    standard kernel with its own [group·CinP, co_t] slab and the per-band
    outputs are summed.  Same window DMAs and weight traffic in total; only
    the per-band fp32 accumulations are rounded to the feature dtype before
    the cross-band sum (fp32 features: identical math)."""
    s_in, cells, flat_strides = _flat_geometry(static)
    offs_abs = np.asarray(static.offs, np.int64)
    perm = _offset_perm(offs_abs, s_in, flat_strides)
    g = static.group
    # the per-band blocking usually affords a larger row tile than the
    # caller requested — fewer row tiles = proportionally less weight-slab
    # streaming (see _band_params)
    p = _band_params(features.shape[1], kernel.shape[2], g, static.tile,
                     static.tw, static.cd, 3 if static.ring else 2)
    band_tile = p[0] if p is not None else static.tile
    out = None
    for i in range(0, len(perm), g):
        chunk = [int(j) for j in perm[i:i + g]]
        sub = _FusedStatic([list(static.offs[j]) for j in chunk],
                           static.s_in, static.extent, band_tile,
                           static.tw, g, static.cd, static.interpret,
                           s_out=static.s_out, ring=static.ring)
        o = _fused_impl(sub, features,
                        jnp.take(kernel, jnp.asarray(chunk), axis=0),
                        in_coords, in_valid, out_coords, out_valid)
        out = o if out is None else out + o
    return out


def _fused_impl(static, features, kernel, in_coords, in_valid, out_coords,
                out_valid):
    """Array-level fused one-hot conv forward (see `fused_sparse_conv`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .coords import flat_cell_key

    tile, tw, group = static.tile, static.tw, static.group
    n, cin = features.shape
    k_vol, cout = kernel.shape[0], kernel.shape[2]
    n_out = out_coords.shape[0]
    cd = static.cd
    sep, cinp = _key_layout(cin)
    packed = _packed_layout(cin)
    if packed is not None:
        sep = False
        cs, pk, csg = packed
        cinp = csg  # gcat/weight lanes per offset
    nslots = 3 if static.ring else 2
    k_pad_0 = -(-k_vol // group) * group
    if (k_vol > group and
            conv_schedule(cin, cout, k_vol, group, tile, tw, cd,
                          nslots) == "split"):
        return _fused_impl_split(static, features, kernel, in_coords,
                                 in_valid, out_coords, out_valid)
    params = select_params(cin, cout, k_pad_0, tile, tw, cd, nslots)
    assert params is not None, (
        "fused conv VMEM budget exceeded — fused_sparse_conv should have "
        "fallen back to the XLA path")
    tile, tw, co_t = params
    nt = -(-n_out // tile)
    n_pad = nt * tile

    # --- static flat-key geometry (numpy) ---
    s_in = np.asarray(static.s_in, np.int64)
    cells = np.asarray([int(np.ceil(e / s)) for e, s in
                        zip(static.extent, s_in)], np.int64)
    flat_strides = np.concatenate(
        [np.cumprod(cells[::-1])[::-1][1:], [1]]).astype(np.int64)
    offs_abs = np.asarray(static.offs, np.int64)  # [K, D] coordinate units
    assert k_vol == offs_abs.shape[0]
    n_groups = -(-k_vol // group)
    k_pad = n_groups * group
    # per-group windows: sort offsets into narrow flat-key-delta bands (the
    # kernel and the dW output are permuted consistently, so semantics are
    # order-independent)
    perm = _offset_perm(offs_abs, s_in, flat_strides)
    offs_abs = offs_abs[perm]

    # --- query keys per (out row, offset), -1 = out of bounds/invalid ---
    # General form: query coordinate = out_coord + delta must (a) lie ON the
    # input lattice (transpose convs probe misaligned coordinates for most
    # offsets — flooring them into a cell would falsely match that cell's
    # occupant), (b) lie inside the extent, (c) come from a valid row.
    qc = (out_coords[:, None, 1:] +
          jnp.asarray(offs_abs, jnp.int32)[None])  # [N_out, K, D]
    sj = jnp.asarray(s_in, jnp.int32)
    qpos = jnp.floor_divide(qc, sj)  # [N_out, K, D]
    aligned = jnp.all(qc - qpos * sj == 0, axis=-1)
    ok = jnp.all((qpos >= 0) & (qpos < jnp.asarray(cells, jnp.int32)),
                 axis=-1)
    ok = ok & aligned & out_valid[:, None]
    qkey = (out_coords[:, :1] * np.int32(int(np.prod(cells))) +
            qpos @ jnp.asarray(flat_strides, jnp.int32))  # [N_out, K]
    qk = jnp.where(ok, qkey, np.int32(-1))
    qk = jnp.pad(qk, ((0, n_pad - n_out), (0, k_pad - k_vol)),
                 constant_values=-1)
    # layout [nt, 1, K_pad*T]: per-offset lane-contiguous query rows
    qk_tiles = qk.reshape(nt, tile, k_pad).transpose(0, 2, 1).reshape(
        nt, 1, k_pad * tile)

    # --- per-(tile, group) window bounds over the sorted keys ---
    in_keys = flat_cell_key(in_coords, in_valid, static.s_in,
                            static.extent)  # sorted; INT32_MAX padding
    lo, nch = _group_bounds(qk, nt, tile, n_groups, group, in_keys, tw,
                            packed[1] if packed is not None else 1)

    f_aug, k_rep = _window_arrays(features, in_keys, tw, cin, cinp, sep, cd,
                                  packed)
    # cout tiling (co_t chosen above): the cout grid dim is inner, so the
    # gather accumulator `gcat` is computed once per row tile and reused
    # across weight tiles
    nco = -(-cout // co_t)
    cout_pad = nco * co_t
    w_stack = jnp.pad(jnp.take(kernel, perm, axis=0).astype(cd),
                      ((0, k_pad - k_vol), (0, cinp - cin),
                       (0, cout_pad - cout))).reshape(k_pad * cinp, cout_pad)

    def body(lo_ref, nch_ref, qk_ref, f_ref, k_ref, w_ref, out_ref, fwin2,
             kwin2, gcat, sem2):
        t = pl.program_id(0)
        co = pl.program_id(1)
        n_prog = pl.num_programs(0)

        def mk_dma(tt, gg, s, c):
            base = pl.multiple_of(lo_ref[tt * n_groups + gg], 8) + c * tw
            if sep:
                return (pltpu.make_async_copy(
                    f_ref.at[pl.ds(base, tw), :], fwin2.at[s],
                    sem2.at[s, 0]),
                    pltpu.make_async_copy(
                    k_ref.at[pl.ds(base, tw), :], kwin2.at[s],
                    sem2.at[s, 1]))
            return (pltpu.make_async_copy(
                f_ref.at[pl.ds(base, tw), :], fwin2.at[s], sem2.at[s]),)

        def start(tt, gg, s, c):
            for d in mk_dma(tt, gg, s, c):
                d.start()

        def wait(tt, gg, s, c):
            for d in mk_dma(tt, gg, s, c):
                d.wait()

        def window(s):
            """(fw [TW, CinP] compute dtype, keys_w [TW, 1] int32)."""
            if sep:
                return fwin2[s], kwin2[s][:, 0:1]
            fw_f32 = fwin2[s]
            return fw_f32.astype(cd), jax.lax.bitcast_convert_type(
                fw_f32[:, cinp - 1:cinp], jnp.int32)

        def compute(g, s, first: bool):
            sl_q = slice(g * group * tile, (g + 1) * group * tile)
            qg = qk_ref[0, 0:1, sl_q]  # [1, group*T]
            if packed is not None:
                # slot-tagged one-hot: slot sp contributes 2^sp (disjoint
                # across slots — keys are unique), so one matmul returns
                # the matched row scaled by 2^slot with the slot id on the
                # tag lane; unscaling by 2^-slot is exact
                one = jnp.dtype(cd).type
                fw_f32 = fwin2[s]  # [TW, 128] fp32
                fw = fw_f32.astype(cd)
                scat = None
                for sp in range(pk):
                    keys_s = jax.lax.bitcast_convert_type(
                        fw_f32[:, sp * cs + cin:sp * cs + cin + 1],
                        jnp.int32)
                    # cast+multiply, not select: Mosaic can't relayout the
                    # [TW, group*T] i1 mask for a bf16 select ((8,128) ->
                    # replicated (16,128)), but casts lower fine (the
                    # inline path's one-hot does the same)
                    m = (keys_s == qg).astype(cd) * one(2.0 ** sp)
                    scat = m if scat is None else scat + m
                gfull = jax.lax.dot_general(
                    scat, fw, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [group*T, 128]
                for j in range(group):
                    gj = gfull[j * tile:(j + 1) * tile]  # [T, 128]
                    sc = gj[:, pk * cs:pk * cs + 1]  # [T, 1] == 2^slot
                    acc = None
                    for sp in range(pk):
                        sel = ((sc == np.float32(2.0 ** sp)).astype(
                            jnp.float32) * np.float32(2.0 ** -sp))
                        v = gj[:, sp * cs:sp * cs + csg] * sel
                        acc = v if acc is None else acc + v
                    sl_c = slice((g * group + j) * csg,
                                 (g * group + j + 1) * csg)
                    vj = acc.astype(cd)
                    if first:
                        gcat[:, sl_c] = vj
                    else:
                        gcat[:, sl_c] = gcat[:, sl_c] + vj
                return
            fw, keys_w = window(s)
            oht = (keys_w == qg).astype(cd)  # [TW, group*T]
            gg_ = jax.lax.dot_general(
                oht, fw, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [group*T, CinP]
            for j in range(group):
                sl_c = slice((g * group + j) * cinp,
                             (g * group + j + 1) * cinp)
                v = gg_[j * tile:(j + 1) * tile].astype(cd)
                if first:
                    gcat[:, sl_c] = v
                else:
                    gcat[:, sl_c] = gcat[:, sl_c] + v

        # the gather (per-group window DMAs + one-hot matmuls) runs once per
        # row tile, on the first cout step; later cout steps reuse gcat.
        # The DMA sequence is (t, g) pairs in order; slot parity follows the
        # flat counter t*n_groups+g, the next window always prefetching into
        # the other slot while the current one computes.  Spill chunks
        # (windows wider than TW) ring over {slot, 2}: chunk c+1 prefetches
        # into the other ring slot while chunk c computes (slot 2 exists only
        # when static.ring; the serial fallback start-wait-computes in place).
        @pl.when(co == 0)
        def _():
            for g in range(n_groups):
                slot = jax.lax.rem(t * n_groups + g, 2)
                nch_g = nch_ref[t * n_groups + g]
                if g == 0:
                    @pl.when(t == 0)
                    def _():
                        start(0, 0, 0, 0)

                wait(t, g, slot, 0)
                if static.ring:
                    @pl.when(nch_g > 1)
                    def _(g=g):
                        start(t, g, 2, 1)
                if g + 1 < n_groups:
                    start(t, g + 1, 1 - slot, 0)
                else:
                    @pl.when(t + 1 < n_prog)
                    def _():
                        start(t + 1, 0, 1 - slot, 0)

                compute(g, slot, first=True)

                if static.ring:
                    def spill(c, _, g=g, slot=slot, nch_g=nch_g):
                        cur = jnp.where(jax.lax.rem(c, 2) == 1, 2, slot)
                        wait(t, g, cur, c)

                        @pl.when(c + 1 < nch_g)
                        def _(g=g):
                            nxt = jnp.where(jax.lax.rem(c, 2) == 1, slot, 2)
                            start(t, g, nxt, c + 1)

                        compute(g, cur, first=False)
                        return 0
                else:
                    def spill(c, _, g=g, slot=slot):
                        # serial DMA into this slot
                        start(t, g, slot, c)
                        wait(t, g, slot, c)
                        compute(g, slot, first=False)
                        return 0

                jax.lax.fori_loop(1, nch_g, spill, 0)

        # gcat is fully written every row tile (empty groups compute exact
        # zeros — see _group_bounds), so no zero path is needed
        out_ref[:] = jax.lax.dot_general(
            gcat[...], w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)

    if sep:
        def kern(lo_r, nch_r, qk_r, f_r, k_r, w_r, out_r, fw2, kw2, gc, sm):
            body(lo_r, nch_r, qk_r, f_r, k_r, w_r, out_r, fw2, kw2, gc, sm)

        extra_in = [pl.BlockSpec(memory_space=pl.ANY)]  # keys stay in HBM
        extra_scratch = [pltpu.VMEM((nslots, tw, 128), jnp.int32)]
        fwin_dtype, sem_shape, arrays = cd, (nslots, 2), (f_aug, k_rep)
    else:
        def kern(lo_r, nch_r, qk_r, f_r, w_r, out_r, fw2, gc, sm):
            body(lo_r, nch_r, qk_r, f_r, None, w_r, out_r, fw2, None, gc, sm)

        extra_in = []
        extra_scratch = []
        fwin_dtype, sem_shape, arrays = jnp.float32, (nslots,), (f_aug,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, nco),
        in_specs=[
            pl.BlockSpec((1, 1, k_pad * tile),
                         lambda t, co, lo, nch: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            *extra_in,
            pl.BlockSpec((k_pad * cinp, co_t), lambda t, co, lo, nch: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, co_t), lambda t, co, lo, nch: (t, co),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (nslots, tw, 128 if packed is not None else cinp),
                fwin_dtype),
            *extra_scratch,
            pltpu.VMEM((tile, k_pad * cinp), cd),
            pltpu.SemaphoreType.DMA(sem_shape),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, cout_pad), features.dtype,
            vma=_union_vma(features, kernel, in_coords, out_coords)),
        interpret=static.interpret,
    )(lo, nch, qk_tiles, *arrays, w_stack)
    return out[:n_out, :cout]


def _extract_nbr(static, in_coords, in_valid, out_coords, out_valid):
    """Materialize the kernel map `int32[K, N_out]` with ONE fused pass.

    Trick: run the one-hot gather with the input ROW INDEX as the feature,
    base-256-digit encoded over three channels so every value is exact in
    bf16 (indices < 2^24 → each digit <= 255, and a one-hot matmul of
    integers <= 255 with fp32 accumulation is exact); a +1 on the low digit
    distinguishes row 0 from "no neighbor".  Used by the custom_vjp backward
    (the reference's ConvolutionBackward receives the same cached kernel map
    from its manager, `pybind/extern.hpp:87-115`)."""
    n = in_coords.shape[0]
    n_out = out_coords.shape[0]
    k_vol = len(static.offs)
    assert n <= (1 << 24), "extend the digit encoding for capacities > 2^24"
    idx = jnp.arange(n, dtype=jnp.int32)
    feats = jnp.stack([idx // 65536, (idx // 256) % 256, idx % 256 + 1],
                      axis=1).astype(jnp.float32)
    w_id = np.zeros((k_vol, 3, 3 * k_vol), np.float32)
    for kk in range(k_vol):
        w_id[kk, 0, 3 * kk] = 1.0
        w_id[kk, 1, 3 * kk + 1] = 1.0
        w_id[kk, 2, 3 * kk + 2] = 1.0
    dig = _fused_impl(static, feats, jnp.asarray(w_id), in_coords, in_valid,
                      out_coords, out_valid)  # [N_out, 3K]
    hi = jnp.round(dig[:, 0::3]).astype(jnp.int32)  # [N_out, K]
    mid = jnp.round(dig[:, 1::3]).astype(jnp.int32)
    lo1 = jnp.round(dig[:, 2::3]).astype(jnp.int32)
    nbr = jnp.where(lo1 > 0, hi * 65536 + mid * 256 + lo1 - 1, -1)
    return nbr.T  # [K, N_out]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_conv(static, features, kernel, in_coords, in_valid, out_coords,
                out_valid):
    return _fused_impl(static, features, kernel, in_coords, in_valid,
                       out_coords, out_valid)


def _fused_fwd(static, features, kernel, in_coords, in_valid, out_coords,
               out_valid):
    out = _fused_impl(static, features, kernel, in_coords, in_valid,
                      out_coords, out_valid)
    return out, (features, kernel, in_coords, in_valid, out_coords,
                 out_valid)


def _dk_params(cin: int, cout: int, k_pad: int, group: int, tile: int,
               tw: int, nslots: int = 2, compute_dtype=jnp.bfloat16):
    """Blocking of the fused dW kernel: the fp32 accumulator is tiled over a
    (k-group, cout) grid so it fits scoped VMEM at ANY layer width (wide
    layers previously fell back to the XLA gather transpose — the measured
    hot spot of the VAE train step's backward).  Returns
    (tile, tw, co_t, gpp) or None, where gpp = k-groups per accumulator
    pass: the window DMA re-runs once per (pass, cout-tile), so narrow
    layers whose full accumulator fits keep the single-pass schedule and
    only wide layers pay extra passes."""
    sep, cinp = _key_layout(cin)
    cout_pad = max(_round_up(cout, 128), 128)
    n_groups = -(-k_pad // group)

    def est(t, w, c, gp):
        # accumulator pair + windows (scratch counts twice — see
        # select_params) + g block pair + query block pair
        # inline layout DMAs fp32 windows; sep windows ride compute dtype
        fwb = 4 if not sep else jnp.dtype(compute_dtype).itemsize
        return (2 * gp * group * cinp * c * 4 +
                2 * nslots * w * cinp * fwb +
                (2 * nslots * w * 128 * 4 if sep else 0) +
                2 * t * c * 4 + 2 * k_pad * t * 4)

    budget = _VMEM_BUDGET
    # group*tile is the qk lane-block width — must stay 128-aligned
    tiles = [t for t in (tile, tile // 2)
             if t >= 32 and (group * t) % 128 == 0] or [128]
    tws = [w for w in (tw, tw // 2) if w >= 128] or [128]
    # cout tiles must DIVIDE the padded width — a non-dividing tile pads the
    # accumulator rows past cout (640 -> 768 at c=256: 20% wasted MXU work,
    # measured a net step regression)
    cos = [c for c in (cout_pad, 512, 384, 256, 128)
           if c == cout_pad or
           (c < cout_pad and c % 128 == 0 and cout_pad % c == 0)]
    # fewest window passes first: maximize gpp, then co_t, then row tile
    gpps = [g for g in (n_groups, n_groups // 2, 2, 1)
            if 1 <= g <= n_groups and n_groups % g == 0]
    for gp in sorted(set(gpps), reverse=True):
        for t in tiles:
            for w in tws:
                for c in cos:
                    if est(t, w, c, gp) <= budget:
                        return t, w, c, gp
    return None


def _dkernel_fused(static, features, g, in_coords, in_valid, out_coords,
                   out_valid, k_vol: int, cin: int, cout: int):
    """dW via the forward's one-hot structure, no gather and no scatter:
    per output tile, ``B_k = onehot_kᵀ · g_tile`` and ``dW_k += windowᵀ ·
    B_k`` — two MXU matmuls per offset, accumulated in a persistent fp32
    output block (XLA's scatter-add lowering for the same contraction
    measured ~30x slower on TPU).  The accumulator is blocked over a
    (k-group, cout-tile) grid with the row tile innermost, so it fits scoped
    VMEM at any (Cin, Cout); the window DMA re-runs per (kg, co) pass —
    bandwidth traded for staying on the MXU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .coords import flat_cell_key

    group = static.group
    n = features.shape[0]
    n_out = out_coords.shape[0]
    cd = static.cd
    sep, cinp = _key_layout(cin)
    nslots = 3 if static.ring else 2
    coutp = max(_round_up(cout, 128), 128)
    k_pad0 = -(-k_vol // group) * group
    params = _dk_params(cin, cout, k_pad0, group, static.tile, static.tw,
                        nslots, cd)
    assert params is not None, "dW blocking infeasible — caller gates this"
    tile, tw, co_t, gpp = params
    nco = coutp // co_t if coutp % co_t == 0 else -(-coutp // co_t)
    cout_pad = nco * co_t
    nt = -(-n_out // tile)
    n_pad = nt * tile

    s_in = np.asarray(static.s_in, np.int64)
    cells = np.asarray([int(np.ceil(e / s)) for e, s in
                        zip(static.extent, s_in)], np.int64)
    flat_strides = np.concatenate(
        [np.cumprod(cells[::-1])[::-1][1:], [1]]).astype(np.int64)
    offs_abs = np.asarray(static.offs, np.int64)
    n_groups = -(-k_vol // group)
    k_pad = n_groups * group
    # same banded offset order as the forward (dW rows un-permuted at return)
    perm = _offset_perm(offs_abs, s_in, flat_strides)
    offs_abs = offs_abs[perm]

    qc = (out_coords[:, None, 1:] + jnp.asarray(offs_abs, jnp.int32)[None])
    sj = jnp.asarray(s_in, jnp.int32)
    qpos = jnp.floor_divide(qc, sj)
    aligned = jnp.all(qc - qpos * sj == 0, axis=-1)
    ok = jnp.all((qpos >= 0) & (qpos < jnp.asarray(cells, jnp.int32)),
                 axis=-1)
    ok = ok & aligned & out_valid[:, None]
    qkey = (out_coords[:, :1] * np.int32(int(np.prod(cells))) +
            qpos @ jnp.asarray(flat_strides, jnp.int32))
    qk = jnp.where(ok, qkey, np.int32(-1))
    qk = jnp.pad(qk, ((0, n_pad - n_out), (0, k_pad - k_vol)),
                 constant_values=-1)
    # [nt, 1, K_pad*T] with k-groups contiguous in the lane dim, so the
    # (1, 1, group*T) block at lane-index kg selects one k-group (Mosaic
    # block rule: trailing dims divisible by (8, 128) or equal to the array)
    qk_tiles = qk.reshape(nt, tile, k_pad).transpose(0, 2, 1).reshape(
        nt, 1, k_pad * tile)

    in_keys = flat_cell_key(in_coords, in_valid, static.s_in, static.extent)
    lo, nch = _group_bounds(qk, nt, tile, n_groups, group, in_keys, tw)

    f_aug, k_rep = _window_arrays(features, in_keys, tw, cin, cinp, sep, cd)
    g_pad = jnp.zeros((n_pad, cout_pad), cd)
    g_pad = g_pad.at[:n_out, :cout].set(g.astype(cd))

    def body(lo_ref, nch_ref, qk_ref, f_ref, k_ref, g_ref, out_ref, fwin2,
             kwin2, sem2):
        # grid (kg, co, t), t innermost: the (kg, co) accumulator block is
        # revisited across consecutive t steps; pass kg covers offset groups
        # [kg*gpp, (kg+1)*gpp), each with its own narrow window (the window
        # DMAs re-run once per pass — bandwidth traded for a VMEM-sized
        # accumulator)
        kg = pl.program_id(0)
        t = pl.program_id(2)
        n_prog = pl.num_programs(2)

        def mk_dma(tt, gg, s, c):
            base = pl.multiple_of(
                lo_ref[tt * n_groups + kg * gpp + gg], 8) + c * tw
            if sep:
                return (pltpu.make_async_copy(
                    f_ref.at[pl.ds(base, tw), :], fwin2.at[s],
                    sem2.at[s, 0]),
                    pltpu.make_async_copy(
                    k_ref.at[pl.ds(base, tw), :], kwin2.at[s],
                    sem2.at[s, 1]))
            return (pltpu.make_async_copy(
                f_ref.at[pl.ds(base, tw), :], fwin2.at[s], sem2.at[s]),)

        def start(tt, gg, s, c):
            for d in mk_dma(tt, gg, s, c):
                d.start()

        def wait(tt, gg, s, c):
            for d in mk_dma(tt, gg, s, c):
                d.wait()

        def window(s):
            if sep:
                return fwin2[s], kwin2[s][:, 0:1]
            fw_f32 = fwin2[s]
            return fw_f32.astype(cd), jax.lax.bitcast_convert_type(
                fw_f32[:, cinp - 1:cinp], jnp.int32)

        def compute(g, s):
            fw, keys_w = window(s)
            gt = g_ref[...]  # [T, co_t]
            sl_q = slice(g * group * tile, (g + 1) * group * tile)
            qg = qk_ref[0, 0:1, sl_q]  # [1, group*T]
            oht = (keys_w == qg).astype(cd)  # [TW, group*T]
            for j in range(group):
                oht_j = oht[:, j * tile:(j + 1) * tile]  # [TW, T]
                b = jax.lax.dot_general(
                    oht_j, gt, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [TW, co_t]
                dw = jax.lax.dot_general(
                    fw, b.astype(cd),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [CinP, co_t]
                sl_r = slice((g * group + j) * cinp,
                             (g * group + j + 1) * cinp)
                out_ref[sl_r, :] = out_ref[sl_r, :] + dw

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        for g in range(gpp):
            slot = jax.lax.rem(t * gpp + g, 2)
            nch_g = nch_ref[t * n_groups + kg * gpp + g]
            if g == 0:
                @pl.when(t == 0)
                def _():
                    start(0, 0, 0, 0)

            wait(t, g, slot, 0)
            if static.ring:
                @pl.when(nch_g > 1)
                def _(g=g):
                    start(t, g, 2, 1)
            if g + 1 < gpp:
                start(t, g + 1, 1 - slot, 0)
            else:
                @pl.when(t + 1 < n_prog)
                def _():
                    start(t + 1, 0, 1 - slot, 0)

            compute(g, slot)

            if static.ring:
                def spill(c, _, g=g, slot=slot, nch_g=nch_g):
                    cur = jnp.where(jax.lax.rem(c, 2) == 1, 2, slot)
                    wait(t, g, cur, c)

                    @pl.when(c + 1 < nch_g)
                    def _(g=g):
                        nxt = jnp.where(jax.lax.rem(c, 2) == 1, slot, 2)
                        start(t, g, nxt, c + 1)

                    compute(g, cur)
                    return 0
            else:
                def spill(c, _, g=g, slot=slot):
                    start(t, g, slot, c)
                    wait(t, g, slot, c)
                    compute(g, slot)
                    return 0

            jax.lax.fori_loop(1, nch_g, spill, 0)

    if sep:
        def kern(lo_r, nch_r, qk_r, f_r, k_r, g_r, out_r, fw2, kw2, sm):
            body(lo_r, nch_r, qk_r, f_r, k_r, g_r, out_r, fw2, kw2, sm)

        extra_in = [pl.BlockSpec(memory_space=pl.ANY)]
        extra_scratch = [pltpu.VMEM((nslots, tw, 128), jnp.int32)]
        fwin_dtype, sem_shape, arrays = cd, (nslots, 2), (f_aug, k_rep)
    else:
        def kern(lo_r, nch_r, qk_r, f_r, g_r, out_r, fw2, sm):
            body(lo_r, nch_r, qk_r, f_r, None, g_r, out_r, fw2, None, sm)

        extra_in = []
        extra_scratch = []
        fwin_dtype, sem_shape, arrays = jnp.float32, (nslots,), (f_aug,)

    n_passes = n_groups // gpp
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_passes, nco, nt),
        in_specs=[
            pl.BlockSpec((1, 1, gpp * group * tile),
                         lambda kg, co, t, lo, nch: (t, 0, kg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            *extra_in,
            pl.BlockSpec((tile, co_t), lambda kg, co, t, lo, nch: (t, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gpp * group * cinp, co_t),
                               lambda kg, co, t, lo, nch: (kg, co),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslots, tw, cinp), fwin_dtype),
            *extra_scratch,
            pltpu.SemaphoreType.DMA(sem_shape),
        ],
    )
    dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (k_pad * cinp, cout_pad), jnp.float32,
            vma=_union_vma(features, g, in_coords, out_coords)),
        interpret=static.interpret,
    )(lo, nch, qk_tiles, *arrays, g_pad)
    # rows are in banded (permuted) offset order — take them back out in
    # the caller's original order
    inv = np.argsort(perm)
    return dw.reshape(k_pad, cinp, cout_pad)[jnp.asarray(inv), :cin, :cout]


def _dkernel_gather(features, nbr_idx, g):
    """dW via row gather + einsum (the classic transpose; fallback when the
    fused dW kernel's accumulator exceeds VMEM)."""
    idx_t = nbr_idx.T  # [N_out, K]
    m = idx_t >= 0
    safe = jnp.where(m, idx_t, 0)
    gathered = features[safe] * m[..., None].astype(features.dtype)
    return jnp.einsum("nkc,no->kco", gathered, g)


def _fused_bwd(static, res, g):
    features, kernel, ic, iv, oc, ov = res
    k_vol = len(static.offs)
    cin, cout = kernel.shape[1], kernel.shape[2]
    k_pad = -(-k_vol // static.group) * static.group
    nslots = 3 if static.ring else 2
    nbr = None
    if conv_schedule(cout, cin, k_vol, static.group, static.tile,
                     static.tw, static.cd, nslots) is None:
        # flipped direction over VMEM budget: gather/scatter transpose
        nbr = _extract_nbr(static, ic, iv, oc, ov)
        dfeat, _ = _xla_backward(features, kernel, nbr, g)
    else:
        # dF is the TRANSPOSE-direction conv of the cotangent with the
        # channel-swapped kernel — one more fused pass (grids swap roles,
        # offsets negate), not a row gather + scatter
        dfeat = _fused_impl(static.flipped(), g.astype(features.dtype),
                            jnp.swapaxes(kernel, 1, 2), oc, ov, ic, iv)
    if _dk_params(cin, cout, k_pad, static.group, static.tile,
                  static.tw, nslots, static.cd) is not None:
        dkernel = _dkernel_fused(static, features, g, ic, iv, oc, ov,
                                 k_vol, cin, cout)
    else:
        if nbr is None:
            nbr = _extract_nbr(static, ic, iv, oc, ov)
        dkernel = _dkernel_gather(features, nbr, g)
    dkernel = dkernel.astype(kernel.dtype)
    f0 = jax.dtypes.float0
    return (dfeat, dkernel, np.zeros(ic.shape, f0), np.zeros(iv.shape, f0),
            np.zeros(oc.shape, f0), np.zeros(ov.shape, f0))


_fused_conv.defvjp(_fused_fwd, _fused_bwd)


def fused_sparse_conv(
    features: jnp.ndarray,  # [N_in, Cin], rows in in_grid canonical order
    kernel: jnp.ndarray,  # [K, Cin, Cout]
    in_grid,
    out_grid,
    spec,
    bias: jnp.ndarray | None = None,
    tile: int = 128,
    tw: int = 256,
    group: int | None = None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sparse conv with the neighbor SEARCH fused into the Pallas kernel.

    Replaces kernel-map build + gather (the two narrow-gather stages that
    dominate the XLA pipeline) with in-kernel flat-key matching: the one-hot
    is built by comparing each output row's precomputed query key (the flat
    key of ``out_coord + delta_k``, with lattice-alignment and bounds masks,
    so plain, strided, transposed and generative convs all work) against the
    input window's keys, which travel either in a spare bitcast lane of the
    feature window (when Cin's lane padding has room) or in their own
    128-lane int32 window (Cin a multiple of 128 — avoids the 512→640
    key-lane MXU tax and lets features ride in the compute dtype; see
    `_key_layout`).  No ``int32[K, N_out]`` kernel map is ever
    materialized in the forward; the LUT/search machinery
    (`ops.neighbors.grid_lookup`) is bypassed entirely.

    Requires a bounded grid (``extent``) and rows in canonical flat-key order
    (`ops.coords.flat_cell_key` — what `make_grid` produces).  Window starts
    per (tile, offset band) come from two `searchsorted` calls over the
    sorted key array (2·G per tile instead of K*N_out lookups).

    Scheduling: offsets are delta-sorted into bands of ``group`` (one wide
    compare + one MXU matmul per band — few, large ops instead of K small
    ones), each band reading its own narrow window (see `_offset_perm`); the
    window DMAs are double-buffered along the flat (tile, band) sequence
    (the next band's window prefetches while the current one computes), so
    HBM latency hides behind the MXU.  Spill chunks (windows wider than
    ``tw``) run serially — they are data-rare and exact.

    Differentiable: the custom_vjp backward extracts the kernel map with one
    extra fused pass (`_extract_nbr`) and applies the standard
    gather/scatter transpose.
    """
    assert in_grid.extent is not None, "fused conv requires a bounded grid"
    if group is None:
        # offsets are processed `group` at a time, each group with its own
        # window; one band = offsets sharing the leading-axis displacement
        # (after delta-sorting), whose flat keys span ~2*S_y instead of the
        # kernel's ~2*S_x (k3 cube: 9, k2 transpose: 4) — the window unit
        group = max(spec.volume // spec.kernel_size[0], 1)
    if conv_schedule(features.shape[1], kernel.shape[2], spec.volume,
                     group, tile, tw, compute_dtype,
                     3 if _SPILL_RING else 2) is None:
        # over the VMEM budget: unfused XLA path (measured faster than the
        # band-split schedule at the reference's over-budget wide layers —
        # see `use_band_split`)
        from .conv import sparse_conv_apply
        from .neighbors import kernel_map
        nbr = kernel_map(in_grid, out_grid, spec)
        return sparse_conv_apply(features, kernel, nbr, bias,
                                 compute_dtype=compute_dtype)
    offs = spec.absolute_offsets(in_grid.stride)
    if spec.transpose:
        offs = -offs
    from .coords import _tuplize

    static = _FusedStatic(np.asarray(offs, np.int64).tolist(),
                          _tuplize(in_grid.stride, in_grid.ndim),
                          in_grid.extent, tile, tw, group, compute_dtype,
                          interpret,
                          s_out=_tuplize(out_grid.stride, out_grid.ndim))
    out = _fused_conv(static, features, kernel, in_grid.coords,
                      in_grid.valid, out_grid.coords, out_grid.valid)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _xla_backward(features, kernel, nbr_idx, g):
    """Cotangents via the XLA gather/scatter formulation — the exact
    transpose the reference's ConvolutionBackward computes
    (`pybind/extern.hpp:87-115`)."""
    k, n_out = nbr_idx.shape
    n, cin = features.shape
    idx_t = nbr_idx.T  # [N_out, K]
    m = idx_t >= 0
    safe = jnp.where(m, idx_t, 0)
    gathered = features[safe] * m[..., None].astype(features.dtype)
    dkernel = jnp.einsum("nkc,no->kco", gathered, g)
    gw = jnp.einsum("no,kco->nkc", g, kernel) * m[..., None].astype(g.dtype)
    dfeat = jnp.zeros_like(features).at[safe.reshape(-1)].add(
        gw.reshape(n_out * k, cin))
    return dfeat, dkernel


@jax.custom_vjp
def onehot_conv(features, kernel, nbr_idx):
    return onehot_sparse_conv(features, kernel, nbr_idx)


def _fwd(features, kernel, nbr_idx):
    return onehot_sparse_conv(features, kernel, nbr_idx), (
        features, kernel, nbr_idx)


def _bwd(res, g):
    features, kernel, nbr_idx = res
    dfeat, dkernel = _xla_backward(features, kernel, nbr_idx, g)
    return dfeat, dkernel, np.zeros(nbr_idx.shape, dtype=jax.dtypes.float0)


onehot_conv.defvjp(_fwd, _bwd)
