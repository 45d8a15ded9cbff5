"""Multi-host data parallelism: sharded runs merge to the single-run
output deterministically (SURVEY §2.7: per-host read_idx % N sharding +
freq-merge of the associative per-site counts)."""

import io
import os

import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from f5c_tpu.io.bam import write_bam
    from f5c_tpu.io.fasta import FastaIndex
    from f5c_tpu.io.readdb import ReadDB

    tmp = str(tmp_path_factory.mktemp("shard"))
    fa = FastaIndex(os.path.join(ECOLI, "reads.fasta"))
    names = fa.names()[:6]
    genome = os.path.join(tmp, "genome.fa")
    reads = os.path.join(tmp, "reads.fasta")
    with open(genome, "w") as g, open(reads, "w") as r:
        for n in names:
            seq = fa.fetch(n)
            g.write(f">{n}\n{seq}\n")
            r.write(f">{n}\n{seq}\n")

    class Rec:
        pass

    recs = []
    for i, n in enumerate(names):
        rec = Rec()
        rec.qname = n
        rec.flag = 0
        rec.tid = i
        rec.pos = 0
        rec.mapq = 60
        rec.cigar = [(0, fa.entries[n].length)]
        rec.seq = fa.fetch(n)
        recs.append(rec)
    bam = os.path.join(tmp, "self.bam")
    write_bam(bam, [(n, fa.entries[n].length) for n in names], recs)
    ReadDB(reads).build(fast5_dirs=[os.path.join(ECOLI, "fast5_files")])
    return bam, genome, reads


def _run(bam, genome, reads, shard=None):
    from f5c_tpu.pipeline.runner import Options, Pipeline

    opt = Options(min_mapq=0, meth_out_version=1)
    if shard:
        opt.shard_index, opt.shard_count = shard
    p = Pipeline(bam, genome, reads, opt)
    buf = io.StringIO()
    p.call_methylation(out=buf)
    return buf.getvalue().splitlines()[1:]  # drop header


def test_two_shards_merge_to_single_run(dataset):
    bam, genome, reads = dataset
    single = _run(bam, genome, reads)
    s0 = _run(bam, genome, reads, shard=(0, 2))
    s1 = _run(bam, genome, reads, shard=(1, 2))
    assert sorted(s0 + s1) == sorted(single)
    assert len(s0) > 0 and len(s1) > 0


def test_sharded_freq_merge(dataset, tmp_path):
    from f5c_tpu.pipeline.freq import freq_merge, meth_freq

    bam, genome, reads = dataset
    single = _run(bam, genome, reads)
    header = ("chromosome\tstart\tend\tread_name\tlog_lik_ratio\t"
              "log_lik_methylated\tlog_lik_unmethylated\t"
              "num_calling_strands\tnum_cpgs\tsequence\n")
    # single-run frequency table
    buf_all = io.StringIO()
    meth_freq(io.StringIO(header + "\n".join(single) + "\n"), out=buf_all)
    # per-shard tables merged with freq-merge
    paths = []
    for i in range(2):
        rows = _run(bam, genome, reads, shard=(i, 2))
        fbuf = io.StringIO()
        meth_freq(io.StringIO(header + "\n".join(rows) + "\n"), out=fbuf)
        p = tmp_path / f"shard{i}.freq.tsv"
        p.write_text(fbuf.getvalue())
        paths.append(str(p))
    merged = io.StringIO()
    freq_merge(paths, out=merged)
    assert merged.getvalue() == buf_all.getvalue()
