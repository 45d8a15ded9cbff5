"""Production ring kernel vs the XLA fallback (F5C_TPU_FILL=xla): the
two surviving ABEA implementations must produce identical alignments on
real reads, and the ring kernel must actually be the faster one (the
perf guard from VERDICT r2 item 7 — the superseded abea_pallas /
abea_pallas8 / abea_kr generations were deleted)."""

import os
import time

import numpy as np
import pytest

from conftest import ECOLI_DIR, needs_reference

pytestmark = [needs_reference]

N_READS = 16


def _load_batch():
    from f5c_tpu import native
    from f5c_tpu.io.bam import BamReader
    from f5c_tpu.io.fasta import FastaIndex
    from f5c_tpu.io.fast5 import read_fast5_signal
    from f5c_tpu.io.readdb import scan_fast5_dirs
    from f5c_tpu.models import builtin_model
    from f5c_tpu.pipeline.runner import ReadRecord

    model = builtin_model("dna_r9_nucleotide")
    bam = BamReader(os.path.join(ECOLI_DIR, "reads.sorted.bam"))
    fa = FastaIndex(os.path.join(ECOLI_DIR, "reads.fasta"))
    paths = scan_fast5_dirs([os.path.join(ECOLI_DIR, "fast5_files")])
    batch = []
    for i, rec in enumerate(r for r in bam if not r.is_unmapped):
        if len(batch) >= N_READS:
            break
        seq = fa.fetch(rec.qname)
        sig = read_fast5_signal(paths[rec.qname])
        et = native.detect_events(sig.to_pa())
        ranks = native.kmer_ranks(seq, model.k)
        sc = native.mom_scalings(et.mean, ranks, model.level_mean)
        batch.append(ReadRecord(
            qname=rec.qname, read_idx=i, tid=rec.tid, pos=rec.pos,
            cigar=rec.cigar, is_reverse=rec.is_reverse, seq=seq,
            event_means=et.mean, n_events=et.mean.shape[0], scaling=sc))
    return model, batch


def _align(model, kernel):
    from f5c_tpu.pipeline.runner import Options, Pipeline

    _, batch = _load_batch()   # fresh records (align mutates them)
    pipe = Pipeline.bare(Options(), model)
    old = os.environ.get("F5C_TPU_FILL")
    os.environ["F5C_TPU_FILL"] = kernel
    try:
        t0 = time.time()
        pipe.align_batch(batch)
        dt = time.time() - t0
    finally:
        if old is None:
            os.environ.pop("F5C_TPU_FILL", None)
        else:
            os.environ["F5C_TPU_FILL"] = old
    return batch, dt


def test_ring_matches_xla_fallback_and_wins():
    import jax

    from f5c_tpu import native

    if jax.default_backend() == "cpu":
        pytest.skip("kernel comparison needs the chip")
    if not native.available():
        pytest.skip("native host library unavailable")
    model, _ = _load_batch()

    ring, _ = _align(model, "ring")          # warm-up / compile
    xla, _ = _align(model, "xla")
    ring2, t_ring = _align(model, "ring")    # timed, warm
    xla2, t_xla = _align(model, "xla")

    n_ok = 0
    for a, b in zip(ring, xla):
        assert a.status == b.status, a.qname
        if a.status:
            continue
        n_ok += 1
        np.testing.assert_array_equal(a.pairs, b.pairs, err_msg=a.qname)
        assert a.scaling.shift == b.scaling.shift, a.qname
        assert a.scaling.scale == b.scaling.scale, a.qname
        assert a.scaling.var == b.scaling.var, a.qname
    assert n_ok >= N_READS - 2

    # perf guard: the production kernel must beat its fallback
    assert t_ring <= t_xla, (
        f"ring kernel ({t_ring:.2f}s) slower than the XLA fallback "
        f"({t_xla:.2f}s) on {N_READS} reads — kernel regression")
