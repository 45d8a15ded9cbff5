import numpy as np
import pytest

from f5c_tpu.models import (
    builtin_model,
    kmer_ranks_dna,
    kmer_ranks_meth,
    load_model_file,
)


def test_kmer_ranks_dna():
    # first base is the most significant 2-bit digit
    assert kmer_ranks_dna("AAAAAA", 6)[0] == 0
    assert kmer_ranks_dna("AAAAAC", 6)[0] == 1
    assert kmer_ranks_dna("TTTTTT", 6)[0] == 4**6 - 1
    assert kmer_ranks_dna("CAAAAA", 6)[0] == 4**5
    ranks = kmer_ranks_dna("ACGTAC", 3)
    assert ranks.shape == (4,)
    assert ranks[0] == (0 << 4) + (1 << 2) + 2  # ACG


def test_kmer_ranks_meth():
    assert kmer_ranks_meth("AAAAAA", 6)[0] == 0
    assert kmer_ranks_meth("AAAAAC", 6)[0] == 1
    assert kmer_ranks_meth("AAAAAM", 6)[0] == 3
    assert kmer_ranks_meth("AAAAAT", 6)[0] == 4
    assert kmer_ranks_meth("TTTTTT", 6)[0] == 5**6 - 1


@pytest.mark.parametrize(
    "model_id,k,n",
    [
        ("dna_r9_nucleotide", 6, 4096),
        ("dna_r9_cpg", 6, 15625),
        ("rna_r9_nucleotide", 5, 1024),
        ("rna004_nucleotide", 5, 1024),
    ],
)
def test_builtin_models(model_id, k, n):
    m = builtin_model(model_id)
    assert m.k == k
    assert m.num_kmers == n
    assert np.all(m.level_stdv > 0)
    assert np.all(np.isfinite(m.level_log_stdv))
    # pA levels are physically bounded
    assert 40 < m.level_mean.mean() < 150


def test_builtin_known_values():
    m = builtin_model("dna_r9_nucleotide")
    # values from the ONT-published table header rows
    assert m.level_mean[0] == pytest.approx(86.486336, abs=1e-4)
    assert m.level_mean[1] == pytest.approx(83.948838, abs=1e-4)


def test_load_model_file_reference():
    import os

    path = "/root/reference/test/r9-models/r9.4_450bps.nucleotide.6mer.template.model"
    if not os.path.isfile(path):
        pytest.skip("reference models not mounted")
    m = load_model_file(path)
    b = builtin_model("dna_r9_nucleotide")
    assert m.k == b.k
    np.testing.assert_array_equal(m.level_mean, b.level_mean)
    np.testing.assert_array_equal(m.level_stdv, b.level_stdv)
