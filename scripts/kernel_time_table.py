#!/usr/bin/env python3
"""On-chip kernel-time table from a JAX profiler trace of the bench.

Runs the warmed call-methylation pipeline once under
jax.profiler.trace(), then parses the perfetto trace
(plugins/profile/*/\*.trace.json.gz) and aggregates device-track event
durations by kernel name.  Prints a table of device time per kernel so
the ABEA fill's measured on-chip time can be compared against its
computed roofline (BENCH.md "ABEA fill roofline").

Usage: python scripts/kernel_time_table.py [outdir]
"""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def parse_trace(trace_dir):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device tracks: process names containing "TPU" / "/device:"
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e.get("tid"))] = e["args"].get(
                    "name", "")
    # device tracks only: accept accelerator process names ("TPU" or
    # "/device:TPU"), NOT host CPU tracks whose names merely contain
    # "device".  On a multi-chip run durations would sum across chips,
    # so keep one pid (the busiest) and say so.
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device:" in n}
    per_kernel = defaultdict(float)
    per_kernel_n = defaultdict(int)
    total = 0.0
    matched = 0
    per_pid = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_name.get((e["pid"], e.get("tid")), "")
        # XLA op tracks nest under "XLA Ops"/"Steps"; keep leaf op rows
        if "Ops" not in tname:
            continue
        dur = float(e.get("dur", 0.0)) / 1e6   # us -> s
        name = e.get("name", "?")
        per_kernel[name] += dur
        per_kernel_n[name] += 1
        total += dur
        per_pid[e["pid"]] += dur
        matched += 1
    if not matched:
        raise SystemExit(
            f"no device op events matched in {path} "
            f"(device pids seen: {sorted(dev_pids)}; a trace-format "
            "change must fail loudly, not print a zero table)")
    if len(per_pid) > 1:
        print(f"[ktt] NOTE: {len(per_pid)} device pids in trace; "
              "durations are summed across chips", file=sys.stderr)
    return path, per_kernel, per_kernel_n, total


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else None
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="f5c_tpu_ktt_", dir=shm)
    trace_dir = outdir or os.path.join(tmp, "trace")
    try:
        bam, genome, reads, n_reads, slow5 = bench.setup_dataset(
            tmp, blow5=True)
        out = os.path.join(tmp, "o.tsv")
        # two warmups (compile + residual first-call costs)
        bench.run_once(bam, genome, reads, out, slow5)
        bench.run_once(bam, genome, reads, out, slow5)
        import jax

        with jax.profiler.trace(trace_dir):
            wall, pipe = bench.run_once(bam, genome, reads, out, slow5)
        print(f"[ktt] measured wall {wall:.3f}s "
              f"({pipe.counters['processed']} reads)", file=sys.stderr)
        path, per_kernel, per_n, total = parse_trace(trace_dir)
        print(f"[ktt] trace {path}", file=sys.stderr)
        rows = sorted(per_kernel.items(), key=lambda kv: -kv[1])
        print(f"{'device s':>10} {'calls':>6}  kernel")
        shown = 0.0
        for name, dur in rows[:25]:
            print(f"{dur:10.4f} {per_n[name]:6d}  {name[:90]}")
            shown += dur
        print(f"{total:10.4f} {'':6}  TOTAL device op time "
              f"({100 * total / wall:.1f}% of {wall:.3f}s wall)")
    finally:
        # the generated dataset always lives under tmp; only the trace
        # dir outlives the run (it is outside tmp when outdir is given)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
