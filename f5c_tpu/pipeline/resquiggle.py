"""resquiggle: align the raw signal to the basecalled read itself.

Port of the reference's resquiggle tool (src/resquiggle.c): FASTQ/FASTA
reads + FAST5/SLOW5 signals (no genome, no BAM) -> events -> ABEA against
the read -> calibration QC -> per-kmer signal start/end TSV (default) or
a PAF-like line with the ``ss:Z:`` run-length signal string (-c).  RNA
flips the base-to-event map in place before output
(src/resquiggle.c:345-356).

The compute path is the same device ABEA + native postalign used by
call-methylation/eventalign; only the data source differs.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..io.fasta import read_fastx
from ..models import builtin_model, load_model_file

TSV_HEADER = "read_id\tkmer_idx\tstart_raw_idx\tend_raw_idx\n"


def _make_pipeline_bare(args):
    from .runner import Options, Pipeline

    opt = Options(rna=getattr(args, "rna", False),
                  pore=getattr(args, "pore", "r9"),
                  kmer_model_path=getattr(args, "kmer_model", None),
                  batch_reads=getattr(args, "batchsize", 512),
                  device=getattr(args, "device", "auto"),
                  events_engine=getattr(args, "events_engine", "auto"),
                  verbose=getattr(args, "verbose", 0))
    if getattr(args, "profile", None):
        from ..profiles import apply_profile

        apply_profile(opt, args.profile)
    if getattr(args, "threads", None):
        opt.num_proc = args.threads
    if opt.kmer_model_path:
        model = load_model_file(opt.kmer_model_path)
    elif opt.rna:
        model = builtin_model("rna004_nucleotide" if opt.pore == "rna004"
                              else "rna_r9_nucleotide")
    else:
        model = builtin_model("dna_r9_nucleotide")
    return Pipeline.bare(opt, model)


def run_resquiggle(args, out=sys.stdout):
    from .runner import ReadRecord, _worker_init, _worker_load

    pipe = _make_pipeline_bare(args)
    opt = pipe.opt
    # reference: default TSV, -c selects PAF (resquiggle.c:46)
    paf = bool(getattr(args, "paf", False))
    if not paf:
        out.write(TSV_HEADER)

    # signal source: FAST5 directory scan or SLOW5 file
    mapping = {}
    if getattr(args, "fast5_dir", None):
        from ..io.readdb import scan_fast5_dirs

        mapping = scan_fast5_dirs(args.fast5_dir)
    slow5 = getattr(args, "slow5", None)

    _worker_init("custom" if opt.kmer_model_path else
                 ("rna004_nucleotide" if opt.rna and opt.pore == "rna004"
                  else "rna_r9_nucleotide" if opt.rna
                  else "dna_r9_nucleotide"),
                 opt.kmer_model_path, opt.rna)

    k = pipe.model.k
    batch: list[ReadRecord] = []
    read_idx = 0

    def flush(batch):
        if not batch:
            return
        if pipe.supports_waves():
            # wave pipeline: load/detect overlaps the device fills,
            # same schedule as call-methylation (align only here)
            pipe.align_batch_waved(batch)
        else:
            t0 = time.time()
            for r in batch:
                qname, data = _worker_load((r.qname, r.signal_path,
                                            r.seq, False))
                if data is None:
                    pipe.counters["bad_signal"] += 1
                    r.status |= 0x2
                    continue
                r.event_means = data["event_means"]
                r.n_events = r.event_means.shape[0]
                r.scaling = data["scaling"]
                r.sample_rate = data["sample_rate"]
                r.event_starts = data["event_starts"]
                r.event_lengths = data["event_lengths"]
                r.event_stdvs = data["event_stdvs"]
                r.nsample = data["nsample"]
            pipe.stage_time["events"] += time.time() - t0
            pipe.align_batch(batch)
        t0 = time.time()
        for r in batch:
            if r.status:
                pipe._count_failure(r)
                continue
            pipe.counters["processed"] += 1
            _emit_read(r, k, opt.rna, paf, out)
        pipe.stage_time["output"] += time.time() - t0

    for name, seq, _qual in read_fastx(args.reads):
        seq = seq.upper().replace("U", "T") if opt.rna else seq.upper()
        path = mapping.get(name, "")
        if slow5:
            path = slow5
        if not path:
            pipe.counters["bad_signal"] += 1
            continue
        pipe.counters["total_reads"] += 1
        batch.append(ReadRecord(
            qname=name, read_idx=read_idx, tid=-1, pos=0,
            cigar=[(0, len(seq))], is_reverse=False, seq=seq,
            signal_path=path))
        read_idx += 1
        if len(batch) >= opt.batch_reads:
            flush(batch)
            batch = []
    flush(batch)
    pipe.report()


def _emit_read(r, k: int, rna: bool, paf: bool, out):
    """Per-kmer signal ranges (src/resquiggle.c:317-456)."""
    n_kmers = len(r.seq) - k + 1
    b2e_start = np.asarray(r.b2e_start).copy()
    b2e_stop = np.asarray(r.b2e_stop).copy()
    if rna:
        # reverse the map and swap start/stop (resquiggle.c:345-356)
        b2e_start, b2e_stop = b2e_stop[::-1].copy(), b2e_start[::-1].copy()
    ev_start = r.event_starts
    ev_len = r.event_lengths

    if not paf:
        from .. import native

        if native.available():
            out.write(native.emit_resquiggle_tsv(
                r.qname, n_kmers, rna, b2e_start, b2e_stop,
                ev_start, ev_len))
            return

    parts = []
    ci = 0
    d = 0
    ff = True
    matches = 0
    sig_start2 = -1
    sig_end2 = -1
    read_start = -1
    read_end = -1
    rows = []
    for j in range(n_kmers):
        se = int(b2e_start[j])
        ee = int(b2e_stop[j])
        if se == -1:
            sig_s = sig_e = -1
            if not ff:
                d += 1
        else:
            sig_s = int(ev_start[se])
            if ff:
                sig_start2 = sig_s
                read_start = j
                ci = sig_s
                ff = False
            sig_e = int(ev_start[ee]) + int(ev_len[ee])
            sig_end2 = sig_e
            read_end = j
            if paf:
                if d > 0:
                    parts.append(f"{d}D")
                    d = 0
                if j == 0:
                    ci = sig_s
                mi = sig_s - ci
                ci += mi
                if mi:
                    parts.append(f"{mi}I")
                mi = sig_e - sig_s
                ci += mi
                if mi:
                    matches += 1
                    parts.append(f"{mi},")
        if not paf:
            kcol = n_kmers - j - 1 if rna else j
            scol = "." if sig_s < 0 else str(sig_s)
            ecol = "." if sig_e < 0 else str(sig_e)
            rows.append(f"{r.qname}\t{kcol}\t{scol}\t{ecol}\n")
    if paf:
        if sig_start2 == -1:
            return
        t_start = n_kmers - read_start if rna else read_start
        t_end = n_kmers - 1 - read_end if rna else read_end + 1
        out.write(
            f"{r.qname}\t{r.nsample}\t{sig_start2}\t{sig_end2}\t+\t"
            f"{r.qname}\t{n_kmers}\t{t_start}\t{t_end}\t"
            f"{matches}\t{n_kmers}\t255\t"
            f"sc:f:{r.scaling.scale:f}\tsh:f:{r.scaling.shift:f}\t"
            f"ss:Z:{''.join(parts)}\n")
    else:
        out.writelines(rows)
