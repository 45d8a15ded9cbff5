"""Pipeline pieces: vectorised scaling ops, meth-freq, freq-merge, helpers."""

import io

import numpy as np
import pytest

from f5c_tpu.models import builtin_model
from f5c_tpu.ops.abea_ref import (
    align,
    estimate_scalings_using_mom,
    postalign,
)
from f5c_tpu.ops.scaling import postalign_np, recalibrate_np
from f5c_tpu.pipeline.freq import freq_merge, meth_freq
from tests.conftest import needs_reference


@needs_reference
def test_postalign_np_matches_reference(read1_seq, read1_events):
    model = builtin_model("dna_r9_nucleotide")
    sc = estimate_scalings_using_mom(read1_seq, model, read1_events.mean)
    res = align(read1_seq, read1_events.mean, model, sc)
    n_kmers = len(read1_seq) - model.k + 1
    ref = postalign(res.pairs, read1_seq, n_kmers, model)
    ranks = model.kmer_ranks(read1_seq)
    fast = postalign_np(res.pairs, ranks, n_kmers)
    np.testing.assert_array_equal(fast.base_to_event_start,
                                  ref.base_to_event_start)
    np.testing.assert_array_equal(fast.base_to_event_stop,
                                  ref.base_to_event_stop)
    assert fast.events_per_base == ref.events_per_base
    np.testing.assert_array_equal(fast.hmm_states, ref.hmm_states)
    np.testing.assert_array_equal(fast.cal_kmer_idx, ref.cal_kmer_idx)
    np.testing.assert_array_equal(fast.cal_event_idx, ref.cal_event_idx)
    ok, rc = recalibrate_np(model.level_mean, model.level_stdv, ranks,
                            read1_events.mean, fast)
    assert ok
    assert rc.shift == pytest.approx(3.181, abs=0.005)


METH_TSV = """chromosome\tstart\tend\tread_name\tlog_lik_ratio\tlog_lik_methylated\tlog_lik_unmethylated\tnum_calling_strands\tnum_cpgs\tsequence
chr1\t100\t100\tr1\t3.10\t-10.0\t-13.1\t1\t1\tAAAAACGAAAA
chr1\t100\t100\tr2\t-4.00\t-14.0\t-10.0\t1\t1\tAAAAACGAAAA
chr1\t100\t100\tr3\t1.00\t-10.0\t-11.0\t1\t1\tAAAAACGAAAA
chr1\t200\t206\tr1\t6.00\t-20.0\t-26.0\t1\t2\tAAAAACGTTTCGAAAAA
chr2\t50\t50\tr1\t-9.00\t-30.0\t-21.0\t1\t1\tAAAAACGAAAA
"""


def test_meth_freq():
    out = io.StringIO()
    meth_freq(io.StringIO(METH_TSV), out=out)
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("chromosome\tstart\tend\tnum_cpgs_in_group")
    rows = {tuple(l.split("\t")[:3]): l.split("\t") for l in lines[1:]}
    # chr1:100 -> 2 calls above threshold (r3 at |1.0| excluded), 1 meth
    r = rows[("chr1", "100", "100")]
    assert r[4] == "2" and r[5] == "1" and r[6] == "0.500"
    # chr1:200 group of 2 cpgs counts double
    r = rows[("chr1", "200", "206")]
    assert r[3] == "2" and r[4] == "2" and r[5] == "2" and r[6] == "1.000"
    # chr2 unmethylated
    r = rows[("chr2", "50", "50")]
    assert r[5] == "0" and r[6] == "0.000"


def test_meth_freq_split_groups():
    out = io.StringIO()
    meth_freq(io.StringIO(METH_TSV), split_groups=True, out=out)
    lines = out.getvalue().splitlines()
    rows = {tuple(l.split("\t")[:3]) for l in lines[1:]}
    # the 2-cpg group at 200 splits at CG offsets within the sequence
    # (offsets relative to the first CG in the context string)
    assert ("chr1", "200", "200") in rows
    assert ("chr1", "205", "205") in rows


def test_freq_merge(tmp_path):
    h = ("chromosome\tstart\tend\tnum_cpgs_in_group\tcalled_sites\t"
         "called_sites_methylated\tmethylated_frequency\tgroup_sequence\n")
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    a.write_text(h + "chr1\t10\t10\t1\t4\t1\t0.250\tAACGTT\n"
                     "chr1\t20\t20\t1\t2\t2\t1.000\tAACGTT\n")
    b.write_text(h + "chr1\t10\t10\t1\t6\t4\t0.667\tAACGTT\n"
                     "chr2\t5\t5\t1\t1\t0\t0.000\tAACGTT\n")
    out = io.StringIO()
    freq_merge([str(a), str(b)], out=out)
    lines = out.getvalue().splitlines()
    rows = {tuple(l.split("\t")[:2]): l.split("\t") for l in lines[1:]}
    r = rows[("chr1", "10")]
    assert r[4] == "10" and r[5] == "5" and r[6] == "0.500"
    assert ("chr1", "20") in rows and ("chr2", "5") in rows


def _freq_both_engines(path, monkeypatch, **kw):
    """Run meth_freq on a file through both engines; returns (py, native)
    as (output, error-str) pairs."""
    import os

    outs = []
    for eng in ("python", "native"):
        monkeypatch.setenv("F5C_TPU_FREQ_ENGINE", eng)
        buf = io.StringIO()
        err = None
        try:
            with open(path) as fh:
                meth_freq(fh, out=buf, **kw)
        except ValueError as e:
            err = str(e)
        outs.append((buf.getvalue(), err))
    return outs


@pytest.fixture()
def _needs_native():
    from f5c_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")


def test_meth_freq_native_engine(tmp_path, monkeypatch, _needs_native):
    """The C++ accumulator (f5chost.cpp f5c_freq_*) is byte-identical to
    the Python engine, including split-groups mode and the vendored
    full-dataset fixture."""
    p = tmp_path / "calls.tsv"
    p.write_text(METH_TSV)
    py, nat = _freq_both_engines(str(p), monkeypatch)
    assert py == nat and py[1] is None and py[0]
    py, nat = _freq_both_engines(str(p), monkeypatch, split_groups=True)
    assert py == nat

    exp = "/root/reference/test/ecoli_2kb_region/meth.exp"
    import os
    if os.path.exists(exp):
        big = tmp_path / "full.tsv"
        big.write_text(METH_TSV.splitlines()[0] + "\n" + open(exp).read())
        py, nat = _freq_both_engines(str(big), monkeypatch)
        assert py == nat and py[0].count("\n") > 100


def test_meth_freq_native_reject_path(tmp_path, monkeypatch, _needs_native):
    """Lines the strict native parser can't be certain about (CPython
    number spellings: underscores, inf/nan) fall back to exact Python
    semantics; CRLF, blank lines and a missing final newline normalise
    identically; malformed rows raise the same located error."""
    hdr = METH_TSV.splitlines()[0] + "\n"
    p = tmp_path / "weird.tsv"
    with open(p, "w", newline="") as f:
        f.write(hdr
                + "chr1\t10\t10\tr1\t2_5.0\t-1\t-2\t1\t1\tAACGA\n"
                + "chr1\t20\t20\tr2\tinf\t-1\t-2\t1\t1\tAACGA\r\n"
                + "   \n\n"
                + "chr1\t3_0\t30\tr3\t5.0\t-1\t-2\t1\t1\tAACGA\n"
                + "chr1\t40\t40\tr4\tnan\t-1\t-2\t1\t1\tAACGA\n"
                + "chr1\t50\t50\tr5\t-9.0\t-1\t-2\t1\t1\tTTCGA")
    py, nat = _freq_both_engines(str(p), monkeypatch)
    assert py == nat and py[1] is None
    assert "chr1\t30\t" in py[0]          # underscore int parsed as 30

    bad = tmp_path / "bad.tsv"
    bad.write_text(hdr + "chr1\t10\t10\tr1\t5.0\t-1\t-2\t1\t1\tAACGA\n"
                       + "chr1\tfoo\t10\tr1\tbad\n")
    py, nat = _freq_both_engines(str(bad), monkeypatch)
    assert py[1] and nat[1]
    assert "line 3" in py[1] and "line 3" in nat[1]
    assert py[1] == nat[1]


def test_freq_merge_native_engine(tmp_path, monkeypatch, _needs_native):
    """The native k-way merge (f5chost.cpp f5c_freq_merge) is
    byte-identical to the Python engine: merged keys sum, ties take the
    first file's row bytes, pass-through rows keep their extra columns,
    header mismatch and malformed rows raise the same errors."""
    h = ("chromosome\tstart\tend\tnum_cpgs_in_group\tcalled_sites\t"
         "called_sites_methylated\tmethylated_frequency\tgroup_sequence\n")
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    c = tmp_path / "c.tsv"
    a.write_text(h + "chr1\t10\t10\t1\t4\t1\t0.250\tAACGTT\n"
                     "chr1\t20\t20\t1\t2\t2\t1.000\tAACGTT\textra\tcols\n"
                     "chr2\t7\t9\t2\t3\t0\t0.000\tTTCGAA\n")
    b.write_text(h + "chr1\t10\t10\t1\t6\t4\t0.667\tZZDIFFERENT\n"
                     "chr1\t20\t20\t1\t1\t0\t0.000\tAACGTT\n"
                     "chr2\t5\t5\t1\t1\t0\t0.000\tAACGTT\n\n")
    c.write_text(h + "chr0\t1\t1\t1\t16\t16\t1.000\tCGCGCG\n")

    def run(paths, eng):
        monkeypatch.setenv("F5C_TPU_FREQ_ENGINE", eng)
        p = tmp_path / f"out_{eng}.tsv"
        with open(p, "w") as out:
            freq_merge(paths, out=out)
        return p.read_text()

    paths = [str(a), str(b), str(c)]
    got_py = run(paths, "python")
    got_nat = run(paths, "native")
    assert got_py == got_nat
    # merged row sums counts but keeps the FIRST file's sequence bytes
    assert "chr1\t10\t10\t1\t10\t5\t0.500\tAACGTT" in got_nat
    assert "ZZDIFFERENT" not in got_nat
    # pass-through keeps extra columns verbatim
    assert "AACGTT\textra\tcols" in got_nat

    # header mismatch: same error both engines
    d = tmp_path / "d.tsv"
    d.write_text("other\theader\nchr1\t1\t1\t1\t1\t1\t1.000\tA\n")
    for eng in ("python", "native"):
        monkeypatch.setenv("F5C_TPU_FREQ_ENGINE", eng)
        with pytest.raises(ValueError, match="differing headers"):
            with open(tmp_path / "x.tsv", "w") as out:
                freq_merge([str(a), str(d)], out=out)

    # malformed row: located error with the same line number
    e = tmp_path / "e.tsv"
    e.write_text(h + "chr1\t1\t1\t1\t1\t1\t1.000\tA\n"
                   + "chr1\tnotanint\t2\t1\t1\t1\t1.000\tA\n")
    errs = []
    for eng in ("python", "native"):
        monkeypatch.setenv("F5C_TPU_FREQ_ENGINE", eng)
        with pytest.raises(ValueError) as ei:
            with open(tmp_path / "y.tsv", "w") as out:
                freq_merge([str(e)], out=out)
        errs.append(str(ei.value))
    assert "line 3" in errs[0] and "line 3" in errs[1]
