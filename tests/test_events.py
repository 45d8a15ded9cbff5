"""Event detection vs the reference --print-events oracle."""

import os
import re

import numpy as np

from tests.conftest import SINGLE_READ_DIR, needs_reference


def load_expected_events():
    path = os.path.join(SINGLE_READ_DIR, "read1.events.exp")
    txt = open(path).read()
    rows = re.findall(r"\{(\d+),([\d.]+),([\d.-]+),([\d.-]+),", txt)
    return np.array([[float(a) for a in r] for r in rows])


@needs_reference
def test_events_match_oracle(read1_events):
    exp = load_expected_events()
    et = read1_events
    assert et.n == len(exp)
    np.testing.assert_array_equal(et.start, exp[:, 0].astype(np.int64))
    np.testing.assert_array_equal(et.length, exp[:, 1].astype(np.float32))
    # fixture printed with 6 decimals
    np.testing.assert_allclose(et.mean, exp[:, 2], atol=1e-6, rtol=0)
    np.testing.assert_allclose(et.stdv, exp[:, 3], atol=1e-6, rtol=0)


@needs_reference
def test_pa_conversion(read1_signal):
    pa = read1_signal.to_pa()
    assert pa.dtype == np.float32
    assert pa.shape[0] == read1_signal.nsample
    # E. coli R9 currents are within sane pA bounds
    assert 0 < np.median(pa) < 200
