#!/usr/bin/env python3
"""Microbenchmark the host load path (_worker_load) piece by piece.

Pure host-side: fetch (BLOW5 zstd decode) vs native prep_read vs the
Python wrapper around them.  No device needed.

Usage: python scripts/host_load_prof.py
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import bench  # noqa: E402
from f5c_tpu import native  # noqa: E402
from f5c_tpu.io.fasta import FastaIndex  # noqa: E402
from f5c_tpu.io.slow5 import Slow5File  # noqa: E402
from f5c_tpu.models import builtin_model  # noqa: E402
from f5c_tpu.pipeline import runner  # noqa: E402


def main():
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="f5c_tpu_prof_", dir=shm)
    bam, genome, reads, n_reads, slow5 = bench.setup_dataset(
        tmp, blow5=True)
    fa = FastaIndex(reads)
    names = fa.names()
    seqs = {n: fa.fetch(n) for n in names}
    model = builtin_model("dna_r9_nucleotide")
    runner._worker_init("dna_r9_nucleotide", None, False)

    best = {}
    for trial in range(4):
        f5 = Slow5File(slow5)
        # --- fetch only ---
        t0 = time.time()
        sigs = {n: f5.get(n) for n in names}
        t_fetch = time.time() - t0

        # --- prep_read (native detect+ranks+MoM in one call) ---
        t0 = time.time()
        preps = {}
        for n in names:
            sig = sigs[n]
            preps[n] = native.prep_read(
                sig.raw, sig.digitisation, sig.offset, sig.range,
                seqs[n], model.k, model.level_mean, rna=False,
                keep_pa=False)
        t_prep = time.time() - t0

        # --- native stage split (repeat pieces separately) ---
        t0 = time.time()
        for n in names:
            sig = sigs[n]
            pa = sig.to_pa()
        t_pa = time.time() - t0

        # --- full _worker_load (what the pipeline actually runs) ---
        t0 = time.time()
        for n in names:
            runner._worker_load((n, slow5, seqs[n], False))
        t_full = time.time() - t0

        # --- _finish_load alone (dict assembly) using prep results ---
        t0 = time.time()
        for n in names:
            et, ranks, sc, pa = preps[n]
            sig = sigs[n]
            runner._finish_load(model, False, seqs[n], et.start,
                                et.length, et.mean, et.stdv,
                                sig.nsample, sig.sample_rate, None,
                                ranks=ranks, sc=sc)
        t_finish = time.time() - t0

        for k, v in [("fetch", t_fetch), ("prep_read", t_prep),
                     ("to_pa", t_pa), ("worker_load_total", t_full),
                     ("finish_load", t_finish)]:
            best[k] = min(best.get(k, 1e9), v)
        print(f"trial {trial}: fetch {t_fetch*1e3:.1f}ms "
              f"prep {t_prep*1e3:.1f}ms to_pa {t_pa*1e3:.1f}ms "
              f"full {t_full*1e3:.1f}ms finish {t_finish*1e3:.1f}ms")

    print("\nbest-of-4 (ms):")
    for k, v in best.items():
        print(f"  {k:20s} {v*1e3:8.1f}")
    wrapper = best["worker_load_total"] - best["fetch"] - best["prep_read"]
    print(f"  {'=> wrapper overhead':20s} {wrapper*1e3:8.1f}")

    # detect-only breakdown via env knob if present
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
