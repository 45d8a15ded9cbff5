"""FAST5 (HDF5) raw-signal reader.

Supports single-read FAST5 (``/Raw/Reads/Read_N/Signal`` +
``/UniqueGlobalKey/channel_id``) and multi-read FAST5
(``/read_<uuid>/Raw/Signal`` + per-read ``channel_id``), covering the same
surface as the reference's minimal HDF5 layer (src/fast5lite.h:42-495).

This is host-side I/O: signals are decoded into float32 numpy arrays and
batched before being shipped to the device.  Reads are fetched through a
thread pool at the pipeline layer (HDF5 access is serialised per file
handle, so we open one handle per fetch, which the OS page cache makes
cheap for repeated files).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:
    import h5py

    _HAVE_H5PY = True
except ImportError:  # pragma: no cover - h5py is present in the target env
    _HAVE_H5PY = False


@dataclass
class Signal:
    """Raw ADC samples + channel calibration (fast5lite.h fast5_t)."""

    raw: np.ndarray          # int16/float ADC values, length nsample
    digitisation: float
    offset: float
    range: float
    sample_rate: float
    read_id: str = ""

    @property
    def nsample(self) -> int:
        return int(self.raw.shape[0])

    def to_pa(self) -> np.ndarray:
        """ADC -> picoamps: (raw + offset) * range / digitisation
        (f5c.c:691-696)."""
        raw_unit = np.float32(self.range) / np.float32(self.digitisation)
        return ((self.raw.astype(np.float32) + np.float32(self.offset))
                * raw_unit)


class Fast5File:
    """One FAST5 file; iterate read ids or fetch a read's signal."""

    def __init__(self, path: str):
        if not _HAVE_H5PY:
            raise RuntimeError("h5py is required for FAST5 input")
        self.path = path
        self._h5 = h5py.File(path, "r")
        self.is_multi = "UniqueGlobalKey" not in self._h5

    def close(self):
        self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def read_ids(self) -> list[str]:
        if self.is_multi:
            out = []
            for key in self._h5.keys():
                if key.startswith("read_"):
                    out.append(key[len("read_"):])
            return out
        reads = self._h5["Raw/Reads"]
        out = []
        for key in reads.keys():
            rid = reads[key].attrs.get("read_id")
            if rid is not None:
                out.append(rid.decode() if isinstance(rid, bytes) else str(rid))
        return out

    def get_signal(self, read_id: str | None = None) -> Signal:
        """Fetch raw signal + channel params.

        For single-read files ``read_id`` may be None (there is only one).
        """
        if self.is_multi:
            if read_id is None:
                read_id = self.read_ids()[0]
            grp = self._h5[f"read_{read_id}"]
            raw = _read_signal_dataset(grp["Raw/Signal"])
            ch = grp["channel_id"].attrs
            rid = read_id
        else:
            reads = self._h5["Raw/Reads"]
            key = next(iter(reads.keys()))
            rgrp = reads[key]
            raw = _read_signal_dataset(rgrp["Signal"])
            ch = self._h5["UniqueGlobalKey/channel_id"].attrs
            rid = rgrp.attrs.get("read_id", b"")
            rid = rid.decode() if isinstance(rid, bytes) else str(rid)
        return Signal(
            raw=np.asarray(raw),
            digitisation=float(ch["digitisation"]),
            offset=float(ch["offset"]),
            range=float(ch["range"]),
            sample_rate=float(ch["sampling_rate"]),
            read_id=rid,
        )


VBZ_FILTER_ID = 32020   # ONT vbz HDF5 filter (fast5lite.h:63)


def _read_signal_dataset(ds) -> np.ndarray:
    """Read a Signal dataset, decoding vbz-compressed chunks directly.

    The ONT vbz filter (id 32020) is zstd over a StreamVByte stream of
    zigzag-delta int16s; the reference requires the HDF5 plugin and
    errors without it (fast5lite.h:296-298) — here the chunks are read
    raw and decoded with the same svb machinery as BLOW5 signals.
    """
    try:
        return ds[()]
    except OSError:
        pass  # missing filter plugin: decode manually below
    filters = ds._filters if hasattr(ds, "_filters") else {}
    if str(VBZ_FILTER_ID) not in {str(k) for k in filters}:
        raise OSError(f"cannot read dataset {ds.name}: unknown filter")
    import zstandard

    n = ds.shape[0]
    chunk = ds.chunks[0] if ds.chunks else n
    out = np.empty(n, dtype=np.int16)
    dctx = zstandard.ZstdDecompressor()
    for start in range(0, n, chunk):
        _, blob = ds.id.read_direct_chunk((start,))
        svb = dctx.decompress(blob, max_output_size=chunk * 8 + 16)
        count = min(chunk, n - start)
        out[start : start + count] = _vbz_svb_decode(svb, count)
    return out


def _vbz_svb_decode(svb: bytes, count: int) -> np.ndarray:
    """StreamVByte zigzag-delta decode with an external element count
    (vbz chunks carry no count prefix, unlike BLOW5 svb-zd blobs)."""
    from .. import native

    blob = np.empty(4 + len(svb), dtype=np.uint8)
    blob[:4] = np.frombuffer(np.uint32(count).tobytes(), dtype=np.uint8)
    blob[4:] = np.frombuffer(svb, dtype=np.uint8)
    if native.available():
        return native.svb_zd_decode(blob, count)
    from .slow5 import _svb_zd_decode

    return _svb_zd_decode(blob.tobytes())


def read_fast5_signal(path: str, read_id: str | None = None) -> Signal:
    with Fast5File(path) as f:
        return f.get_signal(read_id)
