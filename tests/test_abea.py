"""ABEA, MoM scaling, postalign, recalibration vs reference oracles."""

import numpy as np
import pytest

from f5c_tpu.models import builtin_model
from f5c_tpu.ops.abea_ref import (
    align,
    estimate_scalings_using_mom,
    postalign,
    recalibrate_model,
)
from tests.conftest import needs_reference


@pytest.fixture(scope="module")
def read1_aligned(read1_seq, read1_events):
    model = builtin_model("dna_r9_nucleotide")
    sc = estimate_scalings_using_mom(read1_seq, model, read1_events.mean)
    res = align(read1_seq, read1_events.mean, model, sc)
    return model, sc, res


@needs_reference
def test_mom_scaling_oracle(read1_seq, read1_events):
    model = builtin_model("dna_r9_nucleotide")
    dbg = []
    sc = estimate_scalings_using_mom(read1_seq, model, read1_events.mean,
                                     debug_lines=dbg)
    # single_read/read1.scalings.exp
    assert dbg[0] == "event mean: 91.29 kmer mean: 89.35 shift: 1.95"
    assert dbg[1] == "event sq-mean: 8141.60 kmer sq-mean: 8133.13 scale: 1.00"
    assert sc.var == 1.0


@needs_reference
def test_abea_oracle(read1_aligned):
    _, _, res = read1_aligned
    # single_read/adaptive.exp:
    # sum_emission -20697.529925, n_aligned_events 7206, avg -2.872263
    assert res.n_aligned == 7206
    assert abs(res.sum_emission - -20697.529925) < 0.05
    assert abs(res.avg_log_emission - -2.872263) < 1e-5
    assert not res.failed
    # path properties
    assert res.pairs[0, 0] == 0
    assert np.all(np.diff(res.pairs[:, 0]) >= 0)
    assert np.all(np.diff(res.pairs[:, 1]) >= 0)


@needs_reference
def test_recalibration_oracle(read1_seq, read1_events, read1_aligned):
    model, _, res = read1_aligned
    n_kmers = len(read1_seq) - model.k + 1
    post = postalign(res.pairs, read1_seq, n_kmers, model)
    ok, rc = recalibrate_model(model, read1_events.mean, post, read1_seq)
    assert ok
    # eventalign.summary.exp row for fa9ad683: shift 3.181 scale 0.984 var 1.404
    assert rc.shift == pytest.approx(3.181, abs=0.005)
    assert rc.scale == pytest.approx(0.984, abs=0.005)
    assert rc.var == pytest.approx(1.404, abs=0.005)
    assert 0 < post.events_per_base <= 5.0


@needs_reference
def test_jax_abea_matches_reference(read1_seq, read1_events, read1_aligned):
    from f5c_tpu.ops import abea

    model, sc, ref = read1_aligned
    ranks = model.kmer_ranks(read1_seq)
    batch = abea.make_batch([read1_events.mean], [ranks], model,
                            scalings=[sc])
    n_bands = read1_events.n + ranks.shape[0] + 2
    pk, pe, n, sum_em, max_gap, failed = abea.align_batch(
        batch, n_bands=n_bands, max_pairs=read1_events.n + len(read1_seq))
    n = int(n[0])
    assert n == ref.n_aligned
    assert not bool(failed[0])
    pairs = np.stack(
        [np.asarray(pk[0][:n])[::-1], np.asarray(pe[0][:n])[::-1]], axis=1
    )
    np.testing.assert_array_equal(pairs, ref.pairs)
    assert float(sum_em[0]) == pytest.approx(ref.sum_emission, abs=0.1)


@needs_reference
def test_jax_abea_batched_padding(read1_seq, read1_events, read1_aligned):
    """Two reads of different lengths in one padded batch: results must be
    independent of padding."""
    from f5c_tpu.ops import abea

    model, sc, ref = read1_aligned
    ranks = model.kmer_ranks(read1_seq)
    # second, shorter pseudo-read: a prefix
    e2 = read1_events.mean[:2000]
    r2 = ranks[:800]
    sc2 = estimate_scalings_using_mom(read1_seq[:805], model, e2)
    batch = abea.make_batch([read1_events.mean, e2], [ranks, r2], model,
                            scalings=[sc, sc2])
    n_bands = read1_events.n + ranks.shape[0] + 2
    pk, pe, n, sum_em, _, failed = abea.align_batch(
        batch, n_bands=n_bands, max_pairs=read1_events.n + len(read1_seq))
    n0 = int(n[0])
    assert n0 == ref.n_aligned
    pairs = np.stack(
        [np.asarray(pk[0][:n0])[::-1], np.asarray(pe[0][:n0])[::-1]], axis=1
    )
    np.testing.assert_array_equal(pairs, ref.pairs)
    # the short read aligned something and stayed within its bounds
    n1 = int(n[1])
    assert n1 > 0
    assert np.asarray(pk[1][:n1]).max() < 800
    assert np.asarray(pe[1][:n1]).max() < 2000
