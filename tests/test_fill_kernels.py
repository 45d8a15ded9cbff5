"""The 8-read fill kernel must produce cell-identical traces to the
single-read kernel (which is itself validated against the NumPy ABEA
oracle via the pipeline fixtures)."""

import numpy as np
import pytest

from f5c_tpu.models import builtin_model
from f5c_tpu.ops import abea
from f5c_tpu.ops.abea_pallas import CHUNK, abea_fill_pallas, make_ev_rev
from f5c_tpu.ops.abea_pallas8 import abea_fill_pallas8
from f5c_tpu.ops.abea_ref import Scalings


def test_fill8_matches_fill1():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("Pallas TPU kernels need the chip")
    model = builtin_model("dna_r9_nucleotide")
    rng = np.random.default_rng(0)
    B = 8
    evs, krs = [], []
    for b in range(B):
        nk = int(rng.integers(150, 700))
        nev = int(rng.integers(nk, 2 * nk))
        kr = rng.integers(0, 4096, nk)
        which = np.floor(np.linspace(0, nk, nev, endpoint=False)).astype(int)
        ev = (model.level_mean[kr[which]]
              + rng.normal(0, 0.3, nev)).astype(np.float32)
        evs.append(ev)
        krs.append(kr)
    E, K = 2048, 1024
    db = abea.make_batch(evs, krs, model, pad_events=E, pad_kmers=K,
                         scalings=[Scalings()] * B)
    nb = ((E + K + 2 + CHUNK - 1) // CHUNK) * CHUNK
    ev_rev = make_ev_rev(db)
    tr1 = np.asarray(abea_fill_pallas(db, ev_rev, nb))
    tr8 = np.asarray(abea_fill_pallas8(db, ev_rev, nb))
    ne = np.asarray(db.n_events)
    nk_ = np.asarray(db.n_kmers)
    for i in range(B):
        nbands = int(ne[i] + nk_[i] + 2)
        np.testing.assert_array_equal(tr1[i, :nbands], tr8[i, :nbands])
