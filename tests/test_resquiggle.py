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


def test_native_tsv_emitter_matches_python(monkeypatch):
    """The native per-kmer TSV emitter (f5chost.cpp
    f5c_emit_resquiggle_tsv) is byte-identical to the Python loop,
    DNA and RNA, including unaligned kmers; malformed event indices
    raise instead of reading wild memory."""
    import io
    from types import SimpleNamespace

    import numpy as np
    import f5c_tpu.native as nm
    from f5c_tpu.pipeline import resquiggle as rsq

    if not nm.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    for nk, rna in ((257, False), (257, True), (1, False)):
        ne = nk * 2 + 4
        b2s = (np.arange(nk, dtype=np.int32) * 2).astype(np.int32)
        b2e = b2s + 1
        mask = rng.random(nk) < 0.3
        b2s[mask] = -1
        b2e[mask] = -1
        r = SimpleNamespace(
            qname="rq", seq="A" * (nk + 5), b2e_start=b2s, b2e_stop=b2e,
            event_starts=np.cumsum(rng.integers(1, 9, ne)).astype(np.int64),
            event_lengths=rng.uniform(0.5, 20.0, ne).astype(np.float32),
            scaling=None, nsample=0)
        nat, py = io.StringIO(), io.StringIO()
        rsq._emit_read(r, 6, rna, False, nat)
        monkeypatch.setattr(nm, "available", lambda: False)
        rsq._emit_read(r, 6, rna, False, py)
        monkeypatch.undo()
        assert nat.getvalue() == py.getvalue()

    bad = SimpleNamespace(
        qname="rq", seq="A" * 6,
        b2e_start=np.array([9999], np.int32),
        b2e_stop=np.array([9999], np.int32),
        event_starts=np.arange(4, dtype=np.int64),
        event_lengths=np.ones(4, np.float32), scaling=None, nsample=0)
    with pytest.raises(IndexError):
        rsq._emit_read(bad, 6, False, False, io.StringIO())
