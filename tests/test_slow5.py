"""SLOW5/BLOW5 reader/writer/index round trips."""

import glob
import os

import numpy as np
import pytest

from f5c_tpu import native
from f5c_tpu.io.fast5 import Signal, read_fast5_signal
from f5c_tpu.io.slow5 import (Slow5File, _svb_zd_decode, _svb_zd_encode,
                              write_blow5, write_slow5)

ECOLI = "/root/reference/test/ecoli_2kb_region"


def _signals(n=4):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        ln = int(rng.integers(100, 5000))
        raw = rng.integers(-100, 2000, ln).astype(np.int16)
        out.append(Signal(raw=raw, digitisation=8192.0, offset=13.0,
                          range=1467.61, sample_rate=4000.0,
                          read_id=f"read-{i:04d}"))
    return out


def test_svb_zd_roundtrip():
    rng = np.random.default_rng(1)
    for n in (0, 1, 3, 4, 1000):
        s = rng.integers(-30000, 30000, n).astype(np.int16)
        blob = _svb_zd_encode(s)
        out = _svb_zd_decode(blob)
        np.testing.assert_array_equal(out, s)


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_svb_native_vs_numpy():
    rng = np.random.default_rng(2)
    s = rng.integers(-500, 3000, 4097).astype(np.int16)
    b_nat = native.svb_zd_encode(s).tobytes()
    # decode the native blob with the numpy fallback path
    import f5c_tpu.io.slow5 as s5

    count = int.from_bytes(b_nat[:4], "little")
    assert count == s.shape[0]
    arr = np.frombuffer(b_nat, dtype=np.uint8)
    out = native.svb_zd_decode(arr)
    np.testing.assert_array_equal(out, s)


@pytest.mark.parametrize("rec_press,sig_press", [
    ("zlib", "svb-zd"), ("none", "none"), ("zlib", "none"),
    ("none", "svb-zd")])
def test_blow5_roundtrip(tmp_path, rec_press, sig_press):
    sigs = _signals()
    path = str(tmp_path / "t.blow5")
    write_blow5(path, sigs, rec_press=rec_press, sig_press=sig_press,
                attrs={"experiment_type": "genomic_dna"})
    with Slow5File(path) as f:
        assert f.header.rec_press == rec_press
        assert f.header.sig_press == sig_press
        assert f.header.attrs["experiment_type"] == ["genomic_dna"]
        assert set(f.read_ids()) == {s.read_id for s in sigs}
        for s in sigs:
            got = f.get(s.read_id)
            np.testing.assert_array_equal(got.raw, s.raw)
            assert got.digitisation == s.digitisation
            assert got.sample_rate == s.sample_rate
    # index persisted; reload without scanning
    assert os.path.exists(path + ".idx")
    f2 = Slow5File(path, create_index_if_missing=False)
    got = f2.get(sigs[2].read_id)
    np.testing.assert_array_equal(got.raw, sigs[2].raw)
    f2.close()


def test_slow5_ascii_roundtrip(tmp_path):
    sigs = _signals(3)
    path = str(tmp_path / "t.slow5")
    write_slow5(path, sigs, attrs={"experiment_type": "genomic_dna"})
    with Slow5File(path) as f:
        for s in sigs:
            got = f.get(s.read_id)
            np.testing.assert_array_equal(got.raw, s.raw)
        all_sigs = list(f)
        assert len(all_sigs) == 3


@pytest.mark.skipif(not os.path.isdir(ECOLI), reason="dataset missing")
def test_fast5_to_blow5_conversion(tmp_path):
    paths = sorted(glob.glob(os.path.join(ECOLI, "fast5_files",
                                          "*.fast5")))[:5]
    sigs = [read_fast5_signal(p) for p in paths]
    out = str(tmp_path / "ecoli.blow5")
    write_blow5(out, sigs)
    with Slow5File(out) as f:
        for s in sigs:
            got = f.get(s.read_id)
            np.testing.assert_array_equal(got.raw, s.raw)
            np.testing.assert_allclose(got.to_pa(), s.to_pa())


def test_ex_zd_roundtrip(tmp_path):
    """ex-zd v0 signal codec (slow5lib slow5_press.c:1233-1848): encode
    -> BLOW5 write -> read back bit-identical, including quantised and
    exception-heavy signals."""
    import numpy as np

    from f5c_tpu.io.fast5 import Signal
    from f5c_tpu.io.slow5 import (Slow5File, _ex_zd_decode, _ex_zd_encode,
                                  write_blow5)

    rng = np.random.default_rng(7)
    sigs = [
        rng.normal(500, 30, 8000).astype(np.int16),      # typical signal
        (rng.integers(100, 400, 512) * 8).astype(np.int16),   # q = 3
        np.array([0, 30000, -30000, 17], np.int16),      # exception-heavy
        np.array([42], np.int16),
    ]
    for s in sigs:
        assert np.array_equal(_ex_zd_decode(_ex_zd_encode(s)), s)
    path = str(tmp_path / "exzd.blow5")
    write_blow5(path, [
        Signal(read_id=f"r{i}", raw=s, digitisation=8192.0, offset=10.0,
               range=1500.0, sample_rate=4000.0)
        for i, s in enumerate(sigs)
    ], sig_press="ex-zd")
    with Slow5File(path) as f:
        assert f.header.sig_press == "ex-zd"
        for i, s in enumerate(sigs):
            got = f.get(f"r{i}")
            assert np.array_equal(got.raw, s)
