"""meth-freq / freq-merge: aggregate per-read calls into per-site
methylation frequencies (reference src/freq.c, src/freq_merge.c)."""

from __future__ import annotations

import sys
from dataclasses import dataclass, field


@dataclass
class SiteStats:
    group_size: int
    sequence: str
    num_reads: int = 0
    called_sites: int = 0
    called_sites_methylated: int = 0


HEADERS = {
    ("chromosome\tstart\tend\tread_name\tlog_lik_ratio\t"
     "log_lik_methylated\tlog_lik_unmethylated\tnum_calling_strands\t"
     "num_cpgs\tsequence"): (1, "cpgs"),
    ("chromosome\tstart\tend\tread_name\tlog_lik_ratio\t"
     "log_lik_methylated\tlog_lik_unmethylated\tnum_calling_strands\t"
     "num_motifs\tsequence"): (1, "motifs"),
    ("chromosome\tstrand\tstart\tend\tread_name\tlog_lik_ratio\t"
     "log_lik_methylated\tlog_lik_unmethylated\tnum_calling_strands\t"
     "num_cpgs\tsequence"): (2, "cpgs"),
    ("chromosome\tstrand\tstart\tend\tread_name\tlog_lik_ratio\t"
     "log_lik_methylated\tlog_lik_unmethylated\tnum_calling_strands\t"
     "num_motifs\tsequence"): (2, "motifs"),
}


def meth_freq(lines, call_threshold: float = 2.5, split_groups: bool = False,
              out=sys.stdout):
    """Aggregate a call-methylation TSV stream into site frequencies."""
    it = iter(lines)
    header = next(it).rstrip("\n")
    if header not in HEADERS:
        raise ValueError(f"unrecognised header: {header!r}")
    version, motif_word = HEADERS[header]
    sites: dict[tuple, SiteStats] = {}

    for lineno, line in enumerate(it, start=2):
        if not line.strip():
            continue
        cols = line.rstrip("\n").split("\t")
        try:
            if version == 2:
                chrom = cols[0]
                start_i, end_i = int(cols[2]), int(cols[3])
                llr = float(cols[5])
                num_sites = int(cols[9])
                sequence = cols[10]
            else:
                chrom = cols[0]
                start_i, end_i = int(cols[1]), int(cols[2])
                llr = float(cols[4])
                num_sites = int(cols[8])
                sequence = cols[9]
        except (IndexError, ValueError) as e:
            raise ValueError(
                f"malformed call-methylation TSV at line {lineno} "
                f"({len(cols)} fields): {line[:80]!r}") from e
        if abs(llr) < call_threshold:
            continue
        is_meth = llr > 0
        if split_groups and num_sites > 1:
            first_cg = sequence.find("CG")
            pos = first_cg
            while pos != -1:
                key = (chrom, start_i + pos - first_cg, start_i + pos - first_cg)
                ss = sites.setdefault(key, SiteStats(1, "split-group"))
                ss.num_reads += 1
                ss.called_sites += 1
                if is_meth:
                    ss.called_sites_methylated += 1
                pos = sequence.find("CG", pos + 1)
        else:
            key = (chrom, start_i, end_i)
            ss = sites.setdefault(key, SiteStats(num_sites, sequence))
            ss.num_reads += 1
            ss.called_sites += num_sites
            if is_meth:
                ss.called_sites_methylated += num_sites

    out.write(f"chromosome\tstart\tend\tnum_{motif_word}_in_group\t"
              "called_sites\tcalled_sites_methylated\t"
              "methylated_frequency\tgroup_sequence\n")
    for key in sorted(sites):
        chrom, start, end = key
        ss = sites[key]
        if ss.called_sites > 0:
            f = ss.called_sites_methylated / ss.called_sites
            out.write(f"{chrom}\t{start}\t{end}\t{ss.group_size}\t"
                      f"{ss.called_sites}\t{ss.called_sites_methylated}\t"
                      f"{f:.3f}\t{ss.sequence}\n")


def freq_merge(paths: list[str], out=sys.stdout):
    """k-way merge of sorted meth-freq TSVs, summing counts per site
    (reference src/freq_merge.c)."""
    import heapq

    files = [open(p) for p in paths]
    headers = [f.readline().rstrip("\n") for f in files]
    if len(set(headers)) != 1:
        raise ValueError("input files have differing headers")
    out.write(headers[0] + "\n")

    def rows(f):
        for lineno, line in enumerate(f, start=2):
            if not line.strip():
                continue
            c = line.rstrip("\n").split("\t")
            try:
                if len(c) < 8:
                    raise IndexError(f"{len(c)} fields, expected 8")
                yield (c[0], int(c[1]), int(c[2])), c
            except (IndexError, ValueError) as e:
                raise ValueError(
                    f"malformed frequency TSV line {lineno} in "
                    f"{getattr(f, 'name', '<stream>')}: {line[:80]!r}"
                ) from e

    merged = heapq.merge(*(rows(f) for f in files), key=lambda x: x[0])
    pending_key = None
    pend = None
    for key, c in merged:
        if key == pending_key:
            pend[4] = str(int(pend[4]) + int(c[4]))
            pend[5] = str(int(pend[5]) + int(c[5]))
        else:
            if pend is not None:
                _emit_freq_row(pend, out)
            pending_key, pend = key, list(c)
    if pend is not None:
        _emit_freq_row(pend, out)
    for f in files:
        f.close()


def _emit_freq_row(c, out):
    called = int(c[4])
    meth = int(c[5])
    c[6] = f"{meth / called:.3f}" if called else "0.000"
    out.write("\t".join(c) + "\n")
