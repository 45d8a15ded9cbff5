"""Whole-dataset stage oracles (slow): every read of ecoli_2kb_region
through events -> MoM -> ABEA -> recalibration, vs the reference's debug
fixtures.  Run with ``pytest -m slow`` (skipped by default).
"""

import os
import re
from multiprocessing import Pool

import numpy as np
import pytest

from tests.conftest import ECOLI_DIR, needs_reference

pytestmark = [pytest.mark.slow, needs_reference]

_model = None


def _process(args):
    global _model
    from f5c_tpu.io.fast5 import read_fast5_signal
    from f5c_tpu.models import builtin_model
    from f5c_tpu.ops.abea_ref import (
        align,
        estimate_scalings_using_mom,
        postalign,
        recalibrate_model,
    )
    from f5c_tpu.ops.events_ref import detect_events

    if _model is None:
        _model = builtin_model("dna_r9_nucleotide")
    model = _model
    qname, seq, path = args
    sig = read_fast5_signal(path)
    et = detect_events(sig.to_pa())
    dbg = []
    sc = estimate_scalings_using_mom(seq, model, et.mean, debug_lines=dbg)
    res = align(seq, et.mean, model, sc)
    recal = None
    if not res.failed:
        post = postalign(res.pairs, seq, len(seq) - model.k + 1, model)
        ok, rc = recalibrate_model(model, et.mean, post, seq)
        if ok:
            recal = (rc.shift, rc.scale, rc.var)
    return dbg, (res.sum_emission, res.n_aligned, res.avg_log_emission), recal


def test_fullset_stage_oracles():
    from f5c_tpu.io.bam import BamReader
    from f5c_tpu.io.fasta import FastaIndex
    from f5c_tpu.io.readdb import scan_fast5_dirs

    bam = BamReader(os.path.join(ECOLI_DIR, "reads.sorted.bam"))
    fa = FastaIndex(os.path.join(ECOLI_DIR, "reads.fasta"))
    paths = scan_fast5_dirs([os.path.join(ECOLI_DIR, "fast5_files")])
    tasks = [(r.qname, fa.fetch(r.qname), paths[r.qname])
             for r in bam if not r.is_unmapped]
    assert len(tasks) == 143

    with Pool(min(16, os.cpu_count() or 4)) as p:
        results = p.map(_process, tasks)

    # --- est_scalings: numeric match at print precision ---
    exp_est = open(os.path.join(ECOLI_DIR, "est_scalings.exp")).read().splitlines()
    est_lines = [l for r in results for l in r[0]]
    assert len(est_lines) == len(exp_est)
    bad = 0
    for a, b in zip(est_lines, exp_est):
        va = [float(x) for x in re.findall(r"-?[\d.]+", a)]
        vb = [float(x) for x in re.findall(r"-?[\d.]+", b)]
        if not all(abs(x - y) <= 0.05 for x, y in zip(va, vb)):
            bad += 1
    assert bad == 0, f"{bad} est_scaling lines beyond tolerance"

    # --- adaptive: path length within +-2, avg emission close ---
    exp_ada = []
    for l in open(os.path.join(ECOLI_DIR, "adaptive.exp")):
        m = re.match(r"sum_emission (-?[\d.]+), n_aligned_events ([\d.]+), "
                     r"avg_log_emission (-?[\d.]+)", l)
        if m:
            exp_ada.append(tuple(float(x) for x in m.groups()))
    ada = [r[1] for r in results]
    assert len(ada) == len(exp_ada)
    for i, (a, b) in enumerate(zip(ada, exp_ada)):
        assert abs(a[1] - b[1]) <= 2, f"read {i}: n_aligned {a[1]} vs {b[1]}"
        assert abs(a[2] - b[2]) <= 0.01, f"read {i}: avg emission"

    # --- recalibration: all calibrated reads, values at print precision ---
    exp_rc = []
    for l in open(os.path.join(ECOLI_DIR, "recalib_scalings.exp")):
        m = re.match(r"shift: (-?[\d.]+) scale: (-?[\d.]+) var: (-?[\d.]+)", l)
        exp_rc.append(tuple(float(x) for x in m.groups()))
    recal = [r[2] for r in results if r[2] is not None]
    assert len(recal) == len(exp_rc)
    for i, (a, b) in enumerate(zip(recal, exp_rc)):
        assert all(abs(x - y) <= 0.05 for x, y in zip(a, b)), \
            f"read {i}: recal {a} vs {b}"
