"""resquiggle structural tests on the vendored single read."""

import io
import os
import re

import numpy as np
import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")


class _Args:
    reads = os.path.join(ECOLI, "single_read", "read1.fasta")
    fast5_dir = [os.path.join(ECOLI, "fast5_files")]
    slow5 = None
    rna = False
    pore = "r9"
    kmer_model = None
    threads = None
    batchsize = 512
    device = "auto"
    paf = False


def _run(paf: bool) -> str:
    from f5c_tpu.pipeline.resquiggle import run_resquiggle

    args = _Args()
    args.paf = paf
    buf = io.StringIO()
    run_resquiggle(args, out=buf)
    return buf.getvalue()


def test_tsv_output():
    out = _run(paf=False)
    lines = out.splitlines()
    assert lines[0] == "read_id\tkmer_idx\tstart_raw_idx\tend_raw_idx"
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) > 1000
    # kmer indices are 0..n_kmers-1 in order
    kidx = np.array([int(r[1]) for r in rows])
    np.testing.assert_array_equal(kidx, np.arange(len(rows)))
    # signal ranges are valid and non-decreasing where present
    prev_end = 0
    for r in rows:
        if r[2] == ".":
            assert r[3] == "."
            continue
        s, e = int(r[2]), int(r[3])
        assert e > s >= 0
        assert s >= prev_end - 1000  # loose monotonicity across stays
        prev_end = e


def test_paf_output():
    out = _run(paf=True)
    line = out.strip().splitlines()[0]
    f = line.split("\t")
    nsample, start_raw, end_raw = int(f[1]), int(f[2]), int(f[3])
    assert 0 <= start_raw < end_raw <= nsample
    assert f[4] == "+"
    n_kmers = int(f[6])
    matches = int(f[9])
    assert 0 < matches <= n_kmers
    ss = [x for x in f if x.startswith("ss:Z:")][0][5:]
    consumed = sum(int(m) for m in re.findall(r"(\d+)[I,]", ss))
    assert consumed == end_raw - start_raw
