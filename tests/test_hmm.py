"""Profile HMM + methylation scoring vs the single-read oracle.

meth_input.exp holds the exact HMM inputs (sequence windows + event
ranges) the reference used for read1; meth.exp holds the resulting
per-site log-likelihoods.  We feed the fixture windows through our
pipeline state (events/scalings computed from the raw signal) and check
the scores under the reference's float tolerance.
"""

import os
import re

import numpy as np
import pytest

from f5c_tpu.models import builtin_model
from f5c_tpu.ops.abea_ref import (
    align,
    estimate_scalings_using_mom,
    postalign,
    recalibrate_model,
)
from f5c_tpu.ops.hmm_ref import profile_hmm_score
from f5c_tpu.pipeline.methylation import (
    methylate,
    reverse_complement,
    reverse_complement_meth,
)
from tests.conftest import SINGLE_READ_DIR, needs_reference


@pytest.fixture(scope="module")
def read1_state(read1_seq, read1_events):
    nuc = builtin_model("dna_r9_nucleotide")
    sc = estimate_scalings_using_mom(read1_seq, nuc, read1_events.mean)
    res = align(read1_seq, read1_events.mean, nuc, sc)
    post = postalign(res.pairs, read1_seq, len(read1_seq) - nuc.k + 1, nuc)
    ok, rc = recalibrate_model(nuc, read1_events.mean, post, read1_seq)
    assert ok
    return rc, post.events_per_base


def load_meth_input():
    calls = []
    path = os.path.join(SINGLE_READ_DIR, "meth_input.exp")
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        m_seq = lines[i].split(" : ")[1]
        m_rc = lines[i + 1].split(" : ")[1]
        m = re.match(
            r"event_start_idx (\d+), event_stop_idx (\d+), "
            r"event_stride (-?\d+), rc (\d)", lines[i + 2])
        calls.append((m_seq, m_rc, int(m.group(1)), int(m.group(2)),
                      int(m.group(3)), int(m.group(4))))
        i += 3
    return calls


@needs_reference
def test_hmm_scores_match_meth_oracle(read1_events, read1_state):
    scaling, epb = read1_state
    cpg = builtin_model("dna_r9_cpg")
    calls = load_meth_input()
    assert len(calls) == 90  # 45 sites x (unmeth, meth)

    scores = [
        profile_hmm_score(ms, mrc, read1_events.mean, scaling, cpg,
                          e1, e2, stride, bool(rcf), epb)
        for ms, mrc, e1, e2, stride, rcf in calls
    ]
    exp = []
    with open(os.path.join(SINGLE_READ_DIR, "meth.exp")) as f:
        for line in f:
            if line.startswith("chromosome"):
                continue
            c = line.split("\t")
            exp.append((float(c[4]), float(c[5]), float(c[6])))
    assert len(exp) == 45
    for j, (e_llr, e_m, e_u) in enumerate(exp):
        u, m = scores[2 * j], scores[2 * j + 1]
        assert abs(m - e_m) <= 0.1 * abs(e_m) + 0.02, f"row {j} ll_meth"
        assert abs(u - e_u) <= 0.1 * abs(e_u) + 0.02, f"row {j} ll_unmeth"
        assert abs((m - u) - e_llr) <= 0.1 * abs(e_llr) + 0.02, f"row {j} llr"


def test_methylate_helpers():
    assert methylate("AACGTTCG") == "AAMGTTMG"
    assert methylate("CGCG") == "MGMG"
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACG") == "CGTT"
    # MG stays MG at the mirrored position
    assert reverse_complement_meth("AMGT") == "AMGT"
    assert reverse_complement_meth("MGAA") == "TTMG"
    assert reverse_complement_meth(methylate("TTCGAA")) == "TTMGAA"
