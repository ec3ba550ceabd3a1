"""Headline benchmark: single generalized sparse conv forward, k=3, ~26k pts.

Reproduces the reference's benchmark workload (`docs/benchmark.md:14-37`):
`MinkowskiConvolution(in=3, out=32, kernel_size=3, stride=1)` over an
average ScanNet-room-sized cloud (26,098 points, 5 cm voxels).  The upstream
baseline is 0.093 s forward on a Titan X → 280,619 points/sec; the timed
region includes coordinate hashing + kernel-map build + conv per iteration,
like the reference's (which builds its kernel map inside the forward).

Timing protocol: the conv pipeline is chained inside `lax.scan` with
*distinct* per-step features and a loop-carried coordinate dependence, and
per-step time is the slope between a short and a long chain — this cancels
dispatch/transport latency and defeats any execution memoization, giving
honest on-chip time (remote-TPU tunnels otherwise make async timing
meaningless).

Prints one JSON line per metric (`{"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}`): first the secondary DDIM-sampling metric (delegated to
`bench_ddim.py` in a subprocess, BEFORE this process acquires the device),
then the headline conv-throughput metric last.
"""

import json
import os
import sys
import time

import numpy as np

import jax

# Fall back to CPU if the TPU backend is unreachable.  The flaky tunnel has
# two failure modes: device enumeration RAISES, or it HANGS indefinitely —
# probe in a subprocess with a hard deadline so the bench always completes.
def _backend_alive(timeout_s: float = 150.0) -> bool:
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _probe_with_retries(attempts: int = 4, wait_s: float = 120.0) -> bool:
    """The tunnel's outages last minutes — retry before giving up the chip
    (a CPU-fallback number recorded by the driver is worth several minutes
    of waiting)."""
    for i in range(attempts):
        if _backend_alive():
            return True
        if i + 1 < attempts:
            print(f"[bench] backend probe {i + 1}/{attempts} failed; "
                  f"retrying in {wait_s:.0f}s", file=sys.stderr)
            time.sleep(wait_s)
    return False


if not _probe_with_retries():
    print("[bench] default backend unavailable (raise or hang); using CPU",
          file=sys.stderr)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import mink_octtree_stablediffusion_tpu as mt  # noqa: E402

N_POINTS = 26098  # docs/benchmark.md:28 (MinkowskiEngine avg ScanNet points)
CAPACITY = 32768
BASELINE_PPS = N_POINTS / 0.093  # Titan X fwd k=3 (docs/benchmark.md:35)
CIN, COUT, K = 3, 32, 3
EXTENT = (160, 160, 60)  # ~8m x 8m x 3m room at 5 cm voxels

# v5e (v5 lite) public peaks — the roofline MFU is judged against
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def conv_pair_count(coords: np.ndarray) -> int:
    """Exact (in,out) pair count of the k=3 generalized sparse conv on the
    unique voxel set — the algorithmic MXU work is pairs * 2 * Cin * Cout
    FLOPs, independent of how the kernel tiles it."""
    uniq = np.unique(coords, axis=0)
    s = set(map(tuple, uniq))
    pairs = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                pairs += sum((x + dx, y + dy, z + dz) in s
                             for (x, y, z) in s)
    return pairs


def scannet_like_cloud(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Room-like cloud: mostly 2D surfaces (floor/walls) + clutter."""
    n_floor, n_wall, n_clutter = n // 3, n // 3, n - 2 * (n // 3)
    floor = np.stack([rng.randint(0, 160, n_floor),
                      rng.randint(0, 160, n_floor),
                      rng.randint(0, 3, n_floor)], 1)
    wall = np.stack([rng.randint(0, 3, n_wall),
                     rng.randint(0, 160, n_wall),
                     rng.randint(0, 60, n_wall)], 1)
    blob = rng.randn(n_clutter, 3) * 12 + np.array([80, 80, 20])
    clutter = np.clip(blob, 0, [159, 159, 59]).astype(np.int64)
    return np.concatenate([floor, wall, clutter]).astype(np.int32)


def emit_ddim_metric(timeout_s: float = 2400.0) -> None:
    """Run the 64-step DDIM sampling bench (BASELINE.md's second target
    metric) in a subprocess and forward its JSON line.  Runs before this
    process opens the device so the two benches never contend for the
    chip; failures are reported on stderr and never block the conv metric.
    """
    import subprocess
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_ddim.py")
    try:
        r = subprocess.run([sys.executable, script], capture_output=True,
                           timeout=timeout_s, text=True)
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                print(line, flush=True)
                return
        print(f"[bench] bench_ddim produced no metric (rc={r.returncode}): "
              f"{r.stderr[-500:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("[bench] bench_ddim timed out; skipping DDIM metric",
              file=sys.stderr)


def main():
    if "--conv_only" not in sys.argv:
        emit_ddim_metric()
    rng = np.random.RandomState(0)
    cloud = scannet_like_cloud(rng, N_POINTS)
    coords = np.concatenate([np.zeros((N_POINTS, 1), np.int32), cloud], 1)
    cpad, valid = mt.ops.pad_to_capacity(coords, CAPACITY)
    kernel = (rng.randn(K ** 3, CIN, COUT) * 0.1).astype(np.float32)
    spec = mt.ops.KernelSpec(K, 1, 1, ndim=3)
    cpj, vj, kj = map(jnp.asarray, (cpad, valid, kernel))

    def chain(steps):
        @jax.jit
        def run(cpad, valid, feats, kernel):
            def body(carry, f_i):
                grid, inverse, _ = mt.ops.make_grid(
                    carry, valid, CAPACITY, batch_size=1, extent=EXTENT)
                f = mt.ops.reduce_by_inverse(f_i, inverse, valid, CAPACITY,
                                             "sum")
                if mt.ops.onehot_conv.enabled(grid):
                    # fused Pallas path: neighbor search + gather + GEMM in
                    # one kernel (same work the XLA branch does in stages)
                    out = mt.ops.fused_sparse_conv(f, kernel, grid, grid,
                                                   spec, tile=256, tw=512)
                else:
                    nbr = mt.ops.kernel_map(grid, grid, spec)
                    out = mt.ops.sparse_conv_apply(f, kernel, nbr)
                s = jnp.sum(out)
                # loop-carried dependence; numerically zero at runtime
                return carry + (s * 1e-30).astype(jnp.int32), s
            _, sums = jax.lax.scan(body, cpad, feats)
            return jnp.sum(sums)
        return run

    def timed(steps, trials=3):
        run = chain(steps)
        fs = jnp.asarray((rng.randn(steps, CAPACITY, CIN) *
                          valid[None, :, None]).astype(np.float32))
        float(jnp.sum(fs))
        float(run(cpj, vj, fs, kj))  # compile + warm
        best = float("inf")
        for _ in range(trials):
            fs2 = jnp.asarray((rng.randn(steps, CAPACITY, CIN) *
                               valid[None, :, None]).astype(np.float32))
            float(jnp.sum(fs2))  # stage
            t0 = time.perf_counter()
            float(run(cpj, vj, fs2, kj))  # value fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    s0, s1 = 4, 24
    t0, t1 = timed(s0), timed(s1)
    per_iter = max((t1 - t0) / (s1 - s0), 1e-9)
    pps = N_POINTS / per_iter

    # roofline accounting (VERDICT r3): algorithmic conv FLOPs / bytes of
    # the timed op vs the v5e peaks.  With Cin=3 this workload is
    # gather/bandwidth-bound by construction (the reference picked it);
    # scripts/bench_conv_shapes.py reports MFU at real layer widths.
    pairs = conv_pair_count(coords[:, 1:])
    flops = 2.0 * pairs * CIN * COUT
    # feature bytes actually moved (fp32): gathered input rows + written
    # output rows; coordinate/index traffic excluded (lower bound)
    n_unique = len(np.unique(coords, axis=0))
    bytes_moved = 4.0 * (pairs * CIN + n_unique * COUT)
    print(json.dumps({
        "metric": "sparse_conv_fwd_k3_points_per_sec",
        "value": round(pps, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps / BASELINE_PPS, 3),
        "achieved_tflops": round(flops / per_iter / 1e12, 4),
        # the fused conv's MXU GEMMs run in bf16 (onehot_conv default
        # compute_dtype); fp32 is only the HBM storage dtype, so the bf16
        # peak is the right denominator (ADVICE r4)
        "compute_dtype": "bfloat16",
        "mfu_bf16_peak": round(flops / per_iter / V5E_PEAK_BF16_FLOPS, 6),
        "hbm_gbps_algorithmic": round(bytes_moved / per_iter / 1e9, 2),
        "hbm_frac_peak": round(bytes_moved / per_iter / V5E_HBM_BYTES_PER_S,
                               4),
    }))


if __name__ == "__main__":
    main()
