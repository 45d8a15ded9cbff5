"""BAM reader: header, alignment records, CIGAR, and load filters.

A from-scratch binary BAM parser (the reference links htslib for this;
SAM/BAM is a fixed on-disk spec).  Covers what the pipeline needs:
file-order iteration over a coordinate-sorted BAM, qname/flag/tid/pos/
mapq/CIGAR/sequence, reverse-strand detection, and reference span.
BAI-backed region queries are handled in ``bai.py``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .bgzf import decompress_all

# flag bits (SAM spec)
FUNMAP = 0x4
FREVERSE = 0x10
FSECONDARY = 0x100
FQCFAIL = 0x200
FDUP = 0x400
FSUPPLEMENTARY = 0x800

# CIGAR op codes: MIDNSHP=X
CIGAR_OPS = "MIDNSHP=X"
CMATCH, CINS, CDEL, CREF_SKIP, CSOFT_CLIP, CHARD_CLIP, CPAD, CEQUAL, CDIFF = (
    range(9)
)
# ops that consume the reference
_REF_CONSUME = {CMATCH, CDEL, CREF_SKIP, CEQUAL, CDIFF}

_SEQ_NT16 = "=ACMGRSVTWYHKDBN"


@dataclass
class BamRecord:
    qname: str
    flag: int
    tid: int
    pos: int          # 0-based leftmost ref position
    mapq: int
    cigar: list[tuple[int, int]]   # (op, length)
    l_seq: int
    _seq_packed: bytes
    _aux: bytes = b""

    def aux_int(self, tag: str, default: int = 0) -> int:
        """Integer aux field (e.g. NM), htslib bam_aux2i semantics."""
        data = self._aux
        t = tag.encode()
        i = 0
        n = len(data)
        sizes = {ord("c"): 1, ord("C"): 1, ord("s"): 2, ord("S"): 2,
                 ord("i"): 4, ord("I"): 4, ord("f"): 4, ord("d"): 8,
                 ord("A"): 1}
        fmts = {ord("c"): "<b", ord("C"): "<B", ord("s"): "<h",
                ord("S"): "<H", ord("i"): "<i", ord("I"): "<I"}
        while i + 3 <= n:
            this = data[i:i + 2]
            typ = data[i + 2]
            i += 3
            if typ in sizes:
                if this == t and typ in fmts:
                    return struct.unpack(fmts[typ], data[i:i + sizes[typ]])[0]
                i += sizes[typ]
            elif typ in (ord("Z"), ord("H")):
                j = data.index(b"\x00", i)
                i = j + 1
            elif typ == ord("B"):
                sub = data[i]
                cnt = struct.unpack("<i", data[i + 1:i + 5])[0]
                i += 5 + sizes.get(sub, 1) * cnt
            else:
                break
        return default

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FUNMAP)

    @property
    def is_secondary(self) -> bool:
        return bool(self.flag & FSECONDARY)

    @property
    def is_supplementary(self) -> bool:
        return bool(self.flag & FSUPPLEMENTARY)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FREVERSE)

    @property
    def seq(self) -> str:
        out = []
        for i in range(self.l_seq):
            b = self._seq_packed[i >> 1]
            out.append(_SEQ_NT16[(b >> 4) if i % 2 == 0 else (b & 0xF)])
        return "".join(out)

    def ref_end(self) -> int:
        """One past the last reference base consumed (bam_endpos)."""
        end = self.pos
        for op, ln in self.cigar:
            if op in _REF_CONSUME:
                end += ln
        return end


class BamReader:
    """Loads a BAM and iterates alignment records in file order."""

    def __init__(self, path: str):
        self.path = path
        data = decompress_all(path)
        if data[:4] != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        l_text = struct.unpack("<i", data[4:8])[0]
        self.header_text = data[8 : 8 + l_text].rstrip(b"\x00").decode(
            "latin1"
        )
        off = 8 + l_text
        n_ref = struct.unpack("<i", data[off : off + 4])[0]
        off += 4
        self.references: list[str] = []
        self.ref_lengths: list[int] = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", data[off : off + 4])[0]
            off += 4
            self.references.append(
                data[off : off + l_name - 1].decode("latin1")
            )
            off += l_name
            self.ref_lengths.append(
                struct.unpack("<i", data[off : off + 4])[0]
            )
            off += 4
        self._data = data
        self._records_off = off

    def __iter__(self):
        data = self._data
        off = self._records_off
        n = len(data)
        unpack_core = struct.Struct("<iiBBHHHiiii").unpack
        while off + 4 <= n:
            block_size = struct.unpack("<i", data[off : off + 4])[0]
            off += 4
            rec = data[off : off + block_size]
            off += block_size
            (refID, pos, l_rn, mapq, _bin, n_cig, flag, l_seq,
             _nrid, _npos, _tlen) = unpack_core(rec[:32])
            qname = rec[32 : 32 + l_rn - 1].decode("latin1")
            p = 32 + l_rn
            cig_raw = struct.unpack(f"<{n_cig}I", rec[p : p + 4 * n_cig])
            cigar = [(c & 0xF, c >> 4) for c in cig_raw]
            p += 4 * n_cig
            seq_packed = rec[p : p + (l_seq + 1) // 2]
            p += (l_seq + 1) // 2 + l_seq   # skip qual
            yield BamRecord(
                qname=qname,
                flag=flag,
                tid=refID,
                pos=pos,
                mapq=mapq,
                cigar=cigar,
                l_seq=l_seq,
                _seq_packed=seq_packed,
                _aux=rec[p:],
            )


def write_bam(path: str, references: list[tuple[str, int]], records,
              header_text: str = ""):
    """Write a minimal BAM (used by tests, --skip-ultra deferral, and the
    synthetic-data generator).  ``records`` yields BamRecord-like objects
    with qname/flag/tid/pos/mapq/cigar/seq fields."""
    from .bgzf import BgzfWriter

    _nt16 = {c: i for i, c in enumerate(_SEQ_NT16)}
    with BgzfWriter(path) as w:
        if not header_text:
            header_text = "".join(
                f"@SQ\tSN:{n}\tLN:{ln}\n" for n, ln in references)
        hdr = header_text.encode()
        w.write(b"BAM\x01" + struct.pack("<i", len(hdr)) + hdr)
        w.write(struct.pack("<i", len(references)))
        for name, ln in references:
            nb = name.encode() + b"\x00"
            w.write(struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln))
        for r in records:
            qname = r.qname.encode() + b"\x00"
            cig = b"".join(struct.pack("<I", (ln << 4) | op)
                           for op, ln in r.cigar)
            seq = r.seq
            packed = bytearray((len(seq) + 1) // 2)
            for i, c in enumerate(seq):
                v = _nt16.get(c, 15)
                if i % 2 == 0:
                    packed[i >> 1] = v << 4
                else:
                    packed[i >> 1] |= v
            qual = b"\xff" * len(seq)
            body = (struct.pack("<iiBBHHHiiii", r.tid, r.pos, len(qname),
                                r.mapq, 0, len(r.cigar), r.flag, len(seq),
                                -1, -1, 0)
                    + qname + cig + bytes(packed) + qual)
            w.write(struct.pack("<i", len(body)) + body)


def passes_load_filters(rec: BamRecord, min_mapq: int = 20,
                        keep_secondary: bool = False) -> bool:
    """The batch loader's record filter (reference f5cio.c:550-560):
    mapped, mapq >= min, secondary dropped (supplementary kept)."""
    if rec.is_unmapped or rec.mapq < min_mapq:
        return False
    if rec.is_secondary and not keep_secondary:
        return False
    return True
