"""End-to-end with gapped CIGARs (I/D/S ops) — real alignments are never
pure matches, and the CIGAR walks (meth.c get_aligned_segments,
eventalign.c:1121-1188) only show their logic with indels.

Construction: take a real read R and build a reference contig by
mutating it — delete a block (becomes an insertion in the read) and
insert a block (becomes a deletion), plus soft-clipped edges — then
align R with the exact CIGAR describing those edits.
"""

import io
import os

import numpy as np
import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")

CLIP = 50        # soft-clipped prefix/suffix of the read
M1 = 1200        # first match block
INS = 40         # read bases absent from the reference
M2 = 900         # second match block
DEL = 60         # reference bases absent from the read


@pytest.fixture(scope="module")
def indel_dataset(tmp_path_factory):
    from f5c_tpu.io.bam import write_bam
    from f5c_tpu.io.fasta import FastaIndex
    from f5c_tpu.io.readdb import ReadDB

    tmp = str(tmp_path_factory.mktemp("indel"))
    fa = FastaIndex(os.path.join(ECOLI, "reads.fasta"))
    name = fa.names()[0]
    read = fa.fetch(name)
    assert len(read) > CLIP * 2 + M1 + INS + M2 + 100
    m3 = len(read) - CLIP * 2 - M1 - INS - M2   # trailing match block
    # reference: matches read minus the inserted block, plus a deleted one
    rng = np.random.default_rng(99)
    del_block = "".join(rng.choice(list("ACGT"), DEL))
    p = CLIP
    ref = (read[p:p + M1] + del_block
           + read[p + M1 + INS:p + M1 + INS + M2]
           + read[p + M1 + INS + M2:len(read) - CLIP])
    cigar = [(4, CLIP), (0, M1), (1, INS), (0, M2), (2, DEL), (0, m3),
             (4, CLIP)]
    # sanity: read bases consumed == len(read); ref consumed == len(ref)
    assert sum(ln for op, ln in cigar if op in (0, 1, 4)) == len(read)
    assert sum(ln for op, ln in cigar if op in (0, 2)) == len(ref)

    genome = os.path.join(tmp, "genome.fa")
    reads = os.path.join(tmp, "reads.fasta")
    with open(genome, "w") as g:
        g.write(f">ctg\n{ref}\n")
    with open(reads, "w") as r:
        r.write(f">{name}\n{read}\n")

    class Rec:
        pass

    rec = Rec()
    rec.qname = name
    rec.flag = 0
    rec.tid = 0
    rec.pos = 0
    rec.mapq = 60
    rec.cigar = cigar
    rec.seq = read
    bam = os.path.join(tmp, "indel.bam")
    write_bam(bam, [("ctg", len(ref))], [rec])
    ReadDB(reads).build(fast5_dirs=[os.path.join(ECOLI, "fast5_files")])
    return bam, genome, reads, ref


def test_indel_methylation(indel_dataset):
    from f5c_tpu.pipeline.runner import Options, Pipeline

    bam, genome, reads, ref = indel_dataset
    p = Pipeline(bam, genome, reads, Options(min_mapq=0))
    buf = io.StringIO()
    p.call_methylation(out=buf)
    rows = [l.split("\t") for l in buf.getvalue().splitlines()[1:]]
    assert p.counters["processed"] == 1
    assert len(rows) > 20
    # sites land on reference CpGs and scores are sane: the matched
    # blocks are genuine signal, so most calls should be confidently
    # unmethylated (native E. coli control data)
    for r in rows:
        start = int(r[2])
        assert ref[start:start + 2] == "CG"
    llrs = np.array([float(r[5]) for r in rows])
    assert np.isfinite(llrs).all()
    assert np.mean(llrs < 0) > 0.6


def test_indel_eventalign(indel_dataset):
    from f5c_tpu.pipeline import eventalign as EA
    from f5c_tpu.pipeline.runner import Options, Pipeline

    bam, genome, reads, ref = indel_dataset
    p = Pipeline(bam, genome, reads, Options(min_mapq=0))
    batch = next(p.batches())
    p.align_batch(batch)
    ok = [r for r in batch if not r.status and r.b2e_start is not None]
    assert len(ok) == 1
    r = ok[0]
    engine = EA.EventalignEngine(p.model)
    recs = engine.realign_batch(ok, [p._fetch_ref_segment(r)])[id(r)]
    n = recs.ref_position.shape[0]
    assert n > 1000
    # alignment spans both sides of the deletion
    del_start = M1
    del_end = M1 + DEL
    assert recs.ref_position.min() < del_start - 50
    assert recs.ref_position.max() > del_end + 50
    # emission quality on M states stays good through the indels
    tsv = EA.emit_tsv(recs, r, p.model, "ctg", recs.ref_disamb,
                      recs.ref_offset, r.read_idx)
    rows = [l.split("\t") for l in tsv.splitlines()]
    stds = np.array([abs(float(row[12])) for row in rows
                     if row[9] != "N" * p.model.k])
    assert np.median(stds) < 2.0
    # summary stats account for the skip over the deletion
    s = EA.summarize_alignment(recs, r, nm=INS + DEL)
    assert s["num_skips"] >= 1
    assert s["reference_span"] > 0.9 * len(ref)
