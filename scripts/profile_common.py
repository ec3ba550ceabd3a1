"""Shared device-plane op attribution from a jax.profiler trace.

Used by profile_unet_step.py / profile_vae_step.py: run one compiled step
under `jax.profiler.trace`, then aggregate the device-side "XLA Ops" events
from the emitted trace.json.gz, attributing time to framework stages via the
HLO metadata op_name paths.  Ground truth where chain-slope microbenches are
noise-limited (sub-ms layers)."""

import collections
import glob
import gzip
import json
import os
import re
import time

import jax


STAGES = (
    ("attention", re.compile(r"Attention|attention|softmax|dot_general.*attn")),
    ("norm", re.compile(r"Norm|norm_|instance|group_norm")),
    ("fused_conv", re.compile(r"pallas|onehot|fused")),
    ("convgather", re.compile(r"gather|take|dynamic_slice")),
    ("scatter", re.compile(r"scatter|add_any|segment")),
    ("sort", re.compile(r"sort")),
    ("matmul", re.compile(r"dot_general|einsum|conv_general")),
)


def classify(op_name: str) -> str:
    for tag, pat in STAGES:
        if pat.search(op_name):
            return tag
    return "other"


def profile_step(step, inputs, trace_dir: str, top: int = 40) -> None:
    out = step(*inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = step(*inputs)
    jax.block_until_ready(out)
    print(f"wall (async, tunnel-polluted): {time.perf_counter()-t0:.3f}s",
          flush=True)

    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = step(*inputs)
        jax.block_until_ready(out)

    traces = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    assert traces, "no trace emitted"
    d = json.load(gzip.open(sorted(traces)[-1]))
    evs = d.get("traceEvents", [])
    dev_pid = None
    ops_tid = None
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e.get("args", {}).get("name", ""):
                dev_pid = e["pid"]
    for e in evs:
        if (e.get("ph") == "M" and e.get("pid") == dev_pid and
                e.get("name") == "thread_name" and
                e.get("args", {}).get("name") == "XLA Ops"):
            ops_tid = e.get("tid")
    assert dev_pid is not None and ops_tid is not None, "no device plane"

    per_op = collections.Counter()
    per_stage = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in evs:
        if (e.get("ph") == "X" and e.get("pid") == dev_pid and
                e.get("tid") == ops_tid):
            arg = e.get("args", {})
            name = arg.get("tf_op") or arg.get("long_name") or e["name"]
            dur = e.get("dur", 0.0)  # microseconds
            total += dur
            key = name if name != e["name"] else e["name"]
            per_op[key] += dur
            counts[key] += 1
            per_stage[classify(key)] += dur
    print(f"\ndevice total: {total/1e3:.2f} ms over "
          f"{sum(counts.values())} op executions")
    print("\n=== by stage class ===")
    for k, v in per_stage.most_common():
        print(f"  {k:12s} {v/1e3:9.2f} ms  ({100*v/max(total,1e-9):.1f}%)")
    print(f"\n=== top {top} ops ===")
    for k, v in per_op.most_common(top):
        print(f"  {v/1e3:9.3f} ms  x{counts[k]:<5d} {k[:140]}")
