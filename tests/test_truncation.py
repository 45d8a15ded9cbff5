"""Corrupt-input robustness: truncated/garbled BLOW5 and BAM files must
fail with a clean Python exception — never hang, crash the process, or
silently return wrong data.  The reference covers this class with its
valgrind CI tier and skip-and-count handling (f5cio.c:308-318); here the
readers are pure Python/ctypes, so the contract is a catchable error.
"""

import glob
import os

import numpy as np
import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")


@pytest.fixture(scope="module")
def blow5(tmp_path_factory):
    from f5c_tpu.io.fast5 import read_fast5_signal
    from f5c_tpu.io.slow5 import write_blow5

    tmp = tmp_path_factory.mktemp("trunc")
    paths = sorted(glob.glob(os.path.join(ECOLI, "fast5_files",
                                          "*.fast5")))[:6]
    sigs = [read_fast5_signal(p) for p in paths]
    out = str(tmp / "s.blow5")
    write_blow5(out, sigs, rec_press="zstd")
    return out, [s.read_id for s in sigs]


def _truncate_to(src, dst, n):
    with open(src, "rb") as f:
        data = f.read()
    with open(dst, "wb") as f:
        f.write(data[:n])
    return dst


def test_truncated_blow5_fails_cleanly(blow5, tmp_path):
    from f5c_tpu.io.slow5 import Slow5File

    src, ids = blow5
    size = os.path.getsize(src)
    # cut at several points: inside the header, at 25/50/90% of the body
    for frac in (0.001, 0.25, 0.5, 0.9):
        t = _truncate_to(src, str(tmp_path / f"t{frac}.blow5"),
                         max(4, int(size * frac)))
        try:
            f5 = Slow5File(t, create_index_if_missing=False)
            for rid in ids:
                try:
                    sig = f5.get(rid)
                    # a record that decodes must decode correctly
                    assert sig.raw.dtype == np.int16
                except (KeyError, RuntimeError, ValueError, EOFError,
                        OSError, IndexError, NotImplementedError):
                    pass
        except (RuntimeError, ValueError, EOFError, OSError,
                IndexError, NotImplementedError):
            pass  # clean failure at open is fine


def test_garbled_blow5_records_fail_cleanly(blow5, tmp_path):
    """Flip bytes inside the record area: decompression/codec layers
    must raise, not segfault or return silently-wrong signals of the
    wrong length."""
    from f5c_tpu.io.slow5 import Slow5File

    src, ids = blow5
    with open(src, "rb") as f:
        data = bytearray(f.read())
    rng = np.random.default_rng(7)
    body_start = len(data) // 2
    for pos in rng.integers(body_start, len(data), 50):
        data[pos] ^= 0xFF
    t = str(tmp_path / "garbled.blow5")
    with open(t, "wb") as f:
        f.write(bytes(data))
    try:
        f5 = Slow5File(t, create_index_if_missing=False)
    except (RuntimeError, ValueError, EOFError, OSError):
        return
    for rid in ids:
        try:
            f5.get(rid)
        except (KeyError, RuntimeError, ValueError, EOFError, OSError,
                IndexError, NotImplementedError):
            pass


def test_truncated_bam_fails_cleanly(tmp_path):
    from f5c_tpu.io.bam import BamReader

    src = os.path.join(ECOLI, "reads.sorted.bam")
    size = os.path.getsize(src)
    for frac in (0.01, 0.3, 0.7):
        t = _truncate_to(src, str(tmp_path / f"t{frac}.bam"),
                         max(10, int(size * frac)))
        try:
            n = 0
            for rec in BamReader(t):
                n += 1
                assert rec.qname
        except (RuntimeError, ValueError, EOFError, OSError,
                IndexError, KeyError):
            pass


def test_svb_zd_truncation_raises(blow5):
    """The native svb-zd decoder bounds every read by the blob size:
    truncated blobs and corrupt count prefixes raise ValueError instead
    of reading out of bounds (f5chost.cpp f5c_svb_zd_decode)."""
    from f5c_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    s = rng.integers(-500, 500, 4096).astype(np.int16)
    blob = native.svb_zd_encode(s)
    np.testing.assert_array_equal(native.svb_zd_decode(blob), s)
    for cut in (4, 16, blob.shape[0] // 2, blob.shape[0] - 1):
        with pytest.raises(ValueError):
            native.svb_zd_decode(blob[:cut])
    huge = blob.copy()
    huge[:4] = np.frombuffer((1 << 30).to_bytes(4, "little"), np.uint8)
    with pytest.raises(ValueError):
        native.svb_zd_decode(huge)


def test_corrupt_idx_rebuilds(blow5, tmp_path):
    """A corrupt .idx next to a healthy BLOW5 is rebuilt, not fatal."""
    import shutil

    from f5c_tpu.io.slow5 import Slow5File

    src, ids = blow5
    t = str(tmp_path / "ok.blow5")
    shutil.copyfile(src, t)
    with open(t + ".idx", "wb") as f:
        f.write(b"garbage idx content")
    f5 = Slow5File(t)
    sig = f5.get(ids[0])
    assert sig.nsample > 0


def test_truncated_fast5_fails_cleanly(tmp_path):
    from f5c_tpu.io.fast5 import read_fast5_signal

    src = sorted(glob.glob(os.path.join(ECOLI, "fast5_files",
                                        "*.fast5")))[0]
    with open(src, "rb") as f:
        data = f.read()
    for frac in (0.01, 0.5, 0.95):
        t = str(tmp_path / f"t{frac}.fast5")
        with open(t, "wb") as f:
            f.write(data[:int(len(data) * frac)])
        with pytest.raises((OSError, RuntimeError, ValueError, KeyError,
                            EOFError)):
            read_fast5_signal(t)


def test_pipeline_counts_bad_signal_on_truncated_blow5(blow5, tmp_path):
    """End to end: a pipeline pointed at a truncated BLOW5 skips-and-
    counts unreadable records (the default --skip-unreadable yes) rather
    than dying."""
    from f5c_tpu.models import builtin_model
    from f5c_tpu.pipeline.runner import (Options, Pipeline, ReadRecord,
                                         _worker_init)

    src, ids = blow5
    t = _truncate_to(src, str(tmp_path / "half.blow5"),
                     os.path.getsize(src) // 2)
    pipe = Pipeline.bare(Options(), builtin_model("dna_r9_nucleotide"))
    _worker_init("dna_r9_nucleotide", None, False)
    batch = [ReadRecord(qname=rid, read_idx=i, tid=0, pos=0, cigar=[],
                        is_reverse=False, seq="ACGT" * 300,
                        signal_path=t) for i, rid in enumerate(ids)]
    pipe._load_batch(None, batch, keep_raw=False)
    assert pipe.counters["bad_signal"] >= 1
