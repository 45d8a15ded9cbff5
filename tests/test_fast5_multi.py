"""Multi-read FAST5 layout (read_<uuid>/Raw/Signal + per-read
channel_id), the post-2019 ONT container format."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def _make_multi_fast5(path, n_reads=3):
    rng = np.random.default_rng(31)
    sigs = {}
    with h5py.File(path, "w") as f:
        for i in range(n_reads):
            rid = f"0000-{i:04d}"
            raw = rng.integers(-100, 2000, int(rng.integers(500, 3000))
                               ).astype(np.int16)
            grp = f.create_group(f"read_{rid}")
            grp.create_dataset("Raw/Signal", data=raw)
            ch = grp.create_group("channel_id")
            ch.attrs["digitisation"] = 8192.0
            ch.attrs["offset"] = float(i)
            ch.attrs["range"] = 1467.6
            ch.attrs["sampling_rate"] = 4000.0
            sigs[rid] = raw
    return sigs


def test_multi_read_fast5(tmp_path):
    from f5c_tpu.io.fast5 import Fast5File, read_fast5_signal

    path = str(tmp_path / "multi.fast5")
    sigs = _make_multi_fast5(path)
    with Fast5File(path) as f:
        assert f.is_multi
        assert set(f.read_ids()) == set(sigs)
        for rid, raw in sigs.items():
            got = f.get_signal(rid)
            np.testing.assert_array_equal(got.raw, raw)
            assert got.read_id == rid
    # scan_fast5_dirs maps every read to the container
    from f5c_tpu.io.readdb import scan_fast5_dirs

    mapping = scan_fast5_dirs([str(tmp_path)])
    assert set(mapping) == set(sigs)
    sig = read_fast5_signal(mapping["0000-0001"], read_id="0000-0001")
    np.testing.assert_array_equal(sig.raw, sigs["0000-0001"])
