"""RNA path: event reversal, RNA detector params, resquiggle RNA output.

No RNA dataset is vendored (test/rna is download-only in the reference),
so these tests synthesize a squiggle from the RNA pore model: a random
transcript's kmers are emitted 3'->5' (RNA translocates 3' first), each
held for several samples, and the full RNA pipeline must recover the
read (events reversed after detection, f5c.c:711-721; base-to-event map
flipped at resquiggle output, resquiggle.c:345-356)."""

import io
import os

import numpy as np
import pytest

from f5c_tpu.models import builtin_model


def _synth_rna(rng, n_bases=400, samples_per_base=10):
    model = builtin_model("rna_r9_nucleotide")
    k = model.k
    seq = "".join(rng.choice(list("ACGT"), n_bases))
    ranks = model.kmer_ranks(seq)
    # RNA signal is read 3'->5': emit the LAST kmer first
    levels = model.level_mean[ranks[::-1]]
    spb = rng.integers(6, 14, levels.shape[0])
    sig = np.repeat(levels, spb).astype(np.float32)
    sig = sig + rng.normal(0, 1.0, sig.shape[0]).astype(np.float32)
    # back to ADC counts for the Signal container
    digitisation, offset, range_ = 8192.0, 0.0, 1200.0
    raw = np.clip(sig * digitisation / range_ - offset, -32000,
                  32000).astype(np.int16)
    from f5c_tpu.io.fast5 import Signal

    return seq, Signal(raw=raw, digitisation=digitisation, offset=offset,
                       range=range_, sample_rate=3000.0,
                       read_id="rna-read-1")


def test_rna_resquiggle_end_to_end(tmp_path):
    from f5c_tpu.io.slow5 import write_blow5
    from f5c_tpu.pipeline.resquiggle import run_resquiggle

    rng = np.random.default_rng(11)
    seq, sig = _synth_rna(rng)
    blow5 = str(tmp_path / "rna.blow5")
    write_blow5(blow5, [sig], attrs={"experiment_type": "rna"})
    reads = tmp_path / "reads.fastq"
    # RNA basecalls use U
    reads.write_text(f"@{sig.read_id}\n{seq.replace('T', 'U')}\n+\n"
                     f"{'I' * len(seq)}\n")

    class Args:
        pass

    args = Args()
    args.reads = str(reads)
    args.fast5_dir = []
    args.slow5 = blow5
    args.rna = True
    args.pore = "r9"
    args.kmer_model = None
    args.threads = None
    args.batchsize = 512
    args.device = "auto"
    args.paf = False
    buf = io.StringIO()
    run_resquiggle(args, out=buf)
    lines = buf.getvalue().splitlines()
    rows = [l.split("\t") for l in lines[1:]]
    model = builtin_model("rna_r9_nucleotide")
    n_kmers = len(seq) - model.k + 1
    assert len(rows) == n_kmers
    # RNA output walks kmer indices descending (resquiggle.c:412)
    kidx = [int(r[1]) for r in rows]
    assert kidx == list(range(n_kmers - 1, -1, -1))
    mapped = [r for r in rows if r[2] != "."]
    assert len(mapped) > 0.9 * n_kmers
    # signal coordinates are valid
    for r in mapped:
        assert int(r[3]) > int(r[2]) >= 0


def test_rna_event_reversal():
    """Events are detected on the raw signal then reversed to 3'->5'
    base order (f5c.c:711-721)."""
    from f5c_tpu import native
    from f5c_tpu.ops.events_ref import detect_events

    rng = np.random.default_rng(12)
    seq, sig = _synth_rna(rng, n_bases=150)
    pa = sig.to_pa()
    et = detect_events(pa, rna=True)
    assert et.n > 50
    if native.available():
        nat = native.detect_events(pa, rna=True)
        np.testing.assert_array_equal(nat.mean, et.mean)


def test_slow5_rna_autodetect(tmp_path):
    from f5c_tpu.io.slow5 import write_blow5
    from f5c_tpu.pipeline.runner import detect_pore_from_slow5

    rng = np.random.default_rng(13)
    _, sig = _synth_rna(rng, n_bases=60)
    p = str(tmp_path / "rna.blow5")
    write_blow5(p, [sig], attrs={"experiment_type": "rna",
                                 "sequencing_kit": "sqk-rna002"})
    rna, pore = detect_pore_from_slow5(p)
    assert rna is True
    assert pore is None
    p2 = str(tmp_path / "rna4.blow5")
    write_blow5(p2, [sig], attrs={"experiment_type": "rna",
                                  "sequencing_kit": "sqk-rna004"})
    rna, pore = detect_pore_from_slow5(p2)
    assert rna is True and pore == "rna004"
