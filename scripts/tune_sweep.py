#!/usr/bin/env python3
"""On-chip tuning sweep for the call-methylation pipeline.

Sweeps the runtime-read knobs (F5C_TPU_WAVE, F5C_TPU_HMM_META,
F5C_TPU_EVENTS_ENGINE) inside ONE process so compiled kernels are
reused across configs wherever launch shapes coincide.  Each config is
run twice (first run pays any new-shape compiles) and the second wall
time is recorded.  Prints one JSON line per config and a final summary
sorted by reads/s.

Usage: python scripts/tune_sweep.py [--quick]
"""

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    quick = "--quick" in sys.argv
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="f5c_tpu_sweep_", dir=shm)
    results = []
    try:
        bam, genome, reads, n_reads, slow5 = bench.setup_dataset(
            tmp, blow5=True)
        waves = ["32", "64", "112"] if not quick else ["32", "64"]
        configs = [dict(F5C_TPU_WAVE=w) for w in waves]
        configs += [dict(F5C_TPU_WAVE="16")] if not quick else []
        out = os.path.join(tmp, "o.tsv")

        def run_config(cfg, label):
            for k in ("F5C_TPU_WAVE", "F5C_TPU_HMM_META",
                      "F5C_TPU_EVENTS_ENGINE"):
                os.environ.pop(k, None)
            os.environ.update(cfg)
            # two warm-ups like bench.main: the first pays new-shape
            # compiles (and retries once on a transient pool-side
            # UNAVAILABLE wedge), the second flushes residual
            # first-call costs so every config is ranked fairly
            for attempt in range(2):
                try:
                    bench.run_once(bam, genome, reads, out, slow5)
                    break
                except RuntimeError as e:
                    if attempt == 1 or "UNAVAILABLE" not in str(e):
                        raise
                    print(f"[sweep] device claim failed ({e}); "
                          "retrying once", file=sys.stderr)
                    import time as _time
                    _time.sleep(30)
            bench.run_once(bam, genome, reads, out, slow5)
            best = None
            for _ in range(2):
                wall, pipe = bench.run_once(bam, genome, reads, out,
                                            slow5)
                if best is None or wall < best[0]:
                    best = (wall, pipe)
            wall, pipe = best
            n = pipe.counters["processed"]
            rec = {"config": label, "reads_per_s": round(n / wall, 2),
                   "wall_s": round(wall, 3),
                   "stages": {k: round(v, 3)
                              for k, v in pipe.stage_time.items()}}
            print(json.dumps(rec), flush=True)
            results.append(rec)
            return rec

        best = None
        for cfg in configs:
            rec = run_config(cfg, f"wave={cfg['F5C_TPU_WAVE']}")
            if best is None or rec["reads_per_s"] > best[1]:
                best = (cfg, rec["reads_per_s"])
        bw = best[0]["F5C_TPU_WAVE"]
        for pk in ("0", "1"):
            run_config(dict(F5C_TPU_WAVE=bw, F5C_TPU_HMM_META=pk),
                       f"wave={bw} hmm_meta={pk}")
        run_config(dict(F5C_TPU_WAVE=bw, F5C_TPU_EVENTS_ENGINE="device"),
                   f"wave={bw} events=device")
        results.sort(key=lambda r: -r["reads_per_s"])
        print("[sweep] ranking:", file=sys.stderr)
        for r in results:
            print(f"  {r['reads_per_s']:8.2f} reads/s  {r['config']}"
                  f"  stages={r['stages']}", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
