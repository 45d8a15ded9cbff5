"""R10.4 and RNA004 configurations end-to-end THROUGH THE CLI.

The reference ships built-in 9-mer tables for R10.4.1 and RNA004
(src/model.h / src/methmodel.c — stripped blobs in this checkout, and
not obtainable offline), so the supported workflow is user-supplied
model files: ``--pore r10 --kmer-model <file> --meth-model <file>``
(see USAGE.md).  These tests drive that workflow with full-size
real-format files (``#k 9`` header + 4^9 / 5^9 rows, the format of
test/r9-models/*.model), and the RNA004 ``--m6anet`` output path with
the vendored 5-mer RNA004 table.
"""

import os

import numpy as np
import pytest

K9 = 9


def _write_model(path, kmer_bytes, means, stdvs, k):
    """Vectorised f5c/nanopolish model-file writer (row order = rank)."""
    km_str = kmer_bytes.view(f"S{k}").ravel().astype(f"U{k}")
    lines = np.char.add(
        np.char.add(np.char.add(km_str, "\t"), np.char.mod("%.2f", means)),
        np.char.add(np.char.add("\t", np.char.mod("%.2f", stdvs)), "\n"))
    with open(path, "w") as f:
        f.write(f"#k\t{k}\n")
        f.write("".join(lines.tolist()))


@pytest.fixture(scope="module")
def r10_models(tmp_path_factory):
    """Full-size 9-mer nucleotide + CpG model files (synthetic levels —
    the real R10.4.1 tables are not redistributable from this checkout,
    but the files are byte-format-identical to ONT/f5c model files)."""
    tmp = tmp_path_factory.mktemp("r10models")
    rng = np.random.default_rng(5)

    n4 = 4 ** K9
    means4 = rng.uniform(60.0, 130.0, n4).astype(np.float32)
    stdv4 = rng.uniform(1.2, 3.0, n4).astype(np.float32)
    bases4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    i4 = np.arange(n4, dtype=np.int64)
    km4 = np.stack([bases4[(i4 >> (2 * p)) & 3]
                    for p in range(K9 - 1, -1, -1)], axis=1)
    nuc = str(tmp / "r10ish.nucleotide.9mer.model")
    _write_model(nuc, km4, means4, stdv4, K9)

    n5 = 5 ** K9
    bases5 = np.frombuffer(b"ACGMT", dtype=np.uint8)
    i5 = np.arange(n5, dtype=np.int64)
    dig = np.stack([(i5 // 5 ** p) % 5
                    for p in range(K9 - 1, -1, -1)], axis=1)  # (n5, 9)
    km5 = bases5[dig]
    has_m = (dig == 3).any(axis=1)
    # non-M kmers share the nucleotide levels (digit 4=T -> base 3)
    d4 = np.where(dig == 4, 3, dig)
    rank4 = np.zeros(n5, np.int64)
    for c in range(K9):
        rank4 = rank4 * 4 + d4[:, c]
    means5 = means4[rank4].astype(np.float32)
    stdv5 = stdv4[rank4].astype(np.float32)
    shift_m = rng.uniform(-8, 8, n5).astype(np.float32)
    means5[has_m] = 90.0 + shift_m[has_m]
    stdv5[has_m] = 2.0
    meth = str(tmp / "r10ish.cpg.9mer.model")
    _write_model(meth, km5, means5, stdv5, K9)
    return nuc, meth, means4


@pytest.fixture(scope="module")
def r10_ds(tmp_path_factory, r10_models):
    """Synthetic R10 dataset: read + squiggle drawn from the 9-mer
    model, BLOW5 with an R10-ish kit header (autodetect coverage)."""
    from f5c_tpu.io.bam import write_bam
    from f5c_tpu.io.fast5 import Signal
    from f5c_tpu.io.readdb import ReadDB
    from f5c_tpu.io.slow5 import write_blow5
    from f5c_tpu.models import load_model_file

    nuc_path, meth_path, _means4 = r10_models
    tmp = str(tmp_path_factory.mktemp("r10ds"))
    nuc = load_model_file(nuc_path)

    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), p=[.3, .2, .2, .3], size=900))
    ranks = nuc.kmer_ranks(seq)
    spb = rng.integers(5, 12, ranks.shape[0])
    sig_pa = np.repeat(nuc.level_mean[ranks], spb)
    sig_pa = sig_pa + rng.normal(0, 1.0, sig_pa.shape[0])
    digitisation, offset, range_ = 8192.0, 0.0, 1500.0
    raw = np.clip(sig_pa * digitisation / range_ - offset, -32000,
                  32000).astype(np.int16)
    sig = Signal(raw=raw, digitisation=digitisation, offset=offset,
                 range=range_, sample_rate=4000.0, read_id="r10-read")
    blow5 = os.path.join(tmp, "sig.blow5")
    write_blow5(blow5, [sig],
                attrs={"sequencing_kit": "sqk-lsk114"})

    genome = os.path.join(tmp, "g.fa")
    reads = os.path.join(tmp, "r.fa")
    with open(genome, "w") as g:
        g.write(f">ctg\n{seq}\n")
    with open(reads, "w") as r:
        r.write(f">r10-read\n{seq}\n")

    class Rec:
        pass

    rec = Rec()
    rec.qname = "r10-read"
    rec.flag = 0
    rec.tid = 0
    rec.pos = 0
    rec.mapq = 60
    rec.cigar = [(0, len(seq))]
    rec.seq = seq
    bam = os.path.join(tmp, "b.bam")
    write_bam(bam, [("ctg", len(seq))], [rec])
    ReadDB(reads).build()
    return tmp, bam, genome, reads, blow5, seq


def test_r10_call_methylation_cli(r10_ds, r10_models, tmp_path):
    """USAGE.md R10 recipe: --pore r10 --kmer-model F --meth-model F."""
    from f5c_tpu.cli import main

    tmp, bam, genome, reads, blow5, seq = r10_ds
    nuc_path, meth_path, _ = r10_models
    out = str(tmp_path / "meth.tsv")
    rc = main(["call-methylation", "-b", bam, "-g", genome, "-r", reads,
               "--slow5", blow5, "--min-mapq", "0",
               "--pore", "r10", "--kmer-model", nuc_path,
               "--meth-model", meth_path,
               "--min-recalib-events", "100", "-o", out])
    assert rc == 0
    rows = [ln.split("\t") for ln in open(out).read().splitlines()[1:]]
    assert len(rows) > 3
    for r in rows:
        start = int(r[2])
        assert seq[start:start + 2] == "CG"
        assert np.isfinite(float(r[5]))


def test_r10_eventalign_cli(r10_ds, r10_models, tmp_path):
    from f5c_tpu.cli import main

    tmp, bam, genome, reads, blow5, seq = r10_ds
    nuc_path, _meth_path, _ = r10_models
    out = str(tmp_path / "ea.tsv")
    rc = main(["eventalign", "-b", bam, "-g", genome, "-r", reads,
               "--slow5", blow5, "--min-mapq", "0",
               "--pore", "r10", "--kmer-model", nuc_path,
               "--min-recalib-events", "100", "-o", out])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) > 100
    cols = lines[1].split("\t")
    assert len(cols[2]) == K9          # reference_kmer is a 9-mer
    assert len(cols[9]) == K9          # model_kmer


def test_rna004_m6anet_cli(tmp_path):
    """RNA004 m6anet output path e2e: autodetected RNA004 chemistry from
    the SLOW5 header + --m6anet emission (eventalign.c:2186-2302)."""
    from f5c_tpu.cli import main
    from f5c_tpu.io.bam import write_bam
    from f5c_tpu.io.fast5 import Signal
    from f5c_tpu.io.readdb import ReadDB
    from f5c_tpu.io.slow5 import write_blow5
    from f5c_tpu.models import builtin_model

    model = builtin_model("rna004_nucleotide")
    rng = np.random.default_rng(13)
    seq = "".join(rng.choice(list("ACGT"), 500))
    ranks = model.kmer_ranks(seq)
    levels = model.level_mean[ranks[::-1]]       # RNA: 3'->5'
    # enough samples per base that the RNA event detector finds >1
    # event/kmer (events_per_base < 1 makes p_stay negative — the same
    # degenerate-transition regime as the reference, hmm.c:261)
    spb = rng.integers(20, 40, levels.shape[0])
    sig_pa = np.repeat(levels, spb).astype(np.float32)
    sig_pa = sig_pa + rng.normal(0, 1.0, sig_pa.shape[0]).astype(np.float32)
    digitisation, offset, range_ = 8192.0, 0.0, 1200.0
    raw = np.clip(sig_pa * digitisation / range_ - offset, -32000,
                  32000).astype(np.int16)
    sig = Signal(raw=raw, digitisation=digitisation, offset=offset,
                 range=range_, sample_rate=3000.0, read_id="rna004-read")
    tmp = str(tmp_path)
    blow5 = os.path.join(tmp, "rna.blow5")
    write_blow5(blow5, [sig], attrs={"experiment_type": "rna",
                                     "sequencing_kit": "sqk-rna004"})
    genome = os.path.join(tmp, "g.fa")
    reads = os.path.join(tmp, "r.fa")
    with open(genome, "w") as g:
        g.write(f">tx1\n{seq}\n")
    with open(reads, "w") as r:
        r.write(f">rna004-read\n{seq.replace('T', 'U')}\n")

    class Rec:
        pass

    rec = Rec()
    rec.qname = "rna004-read"
    rec.flag = 0
    rec.tid = 0
    rec.pos = 0
    rec.mapq = 60
    rec.cigar = [(0, len(seq))]
    rec.seq = seq
    bam = os.path.join(tmp, "b.bam")
    write_bam(bam, [("tx1", len(seq))], [rec])
    ReadDB(reads).build()

    out = os.path.join(tmp, "m6a.tsv")
    rc = main(["eventalign", "-b", bam, "-g", genome, "-r", reads,
               "--slow5", blow5, "--min-mapq", "0", "--m6anet",
               "--min-recalib-events", "100", "-o", out])
    assert rc == 0
    lines = open(out).read().splitlines()
    # m6anet header (eventalign.c:1664-1675)
    assert lines[0].startswith("contig\tposition\treference_kmer\t"
                               "read_index\tevent_level_mean")
    assert len(lines) > 50
    cols = lines[1].split("\t")
    assert cols[0] == "tx1"
    assert len(cols[2]) == model.k       # collapsed per-position kmer
    # one row per ref position (collapsed), positions strictly increasing
    pos = [int(ln.split("\t")[1]) for ln in lines[1:]]
    assert pos == sorted(set(pos))
