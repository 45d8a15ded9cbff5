"""ops/hmm_meta.build_inputs rank parity vs native hmm_window_ranks.

Crafted windows force every window-edge case the global rank planes
must correct for (hmm_meta.py docstring):

- forward meth window ending in a C whose NEXT genome base is G
  (window-local methylate keeps C; the global plane made it M);
- reverse meth window starting at a G with a genome C immediately
  before it (window-local revcomp_meth complements the G; the plane
  called it M);
- CpGs interior to windows (normal substitution, both strands);
- windows butting against segment boundaries where the plane's shifted
  adds read the NEXT read's bases.
"""

import os

import numpy as np
import pytest

pytest.importorskip("jax")

from f5c_tpu import native  # noqa: E402

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")

K = 6


def _run_case(refs, items, read_rc):
    """items: (read, sub_start, sub_end, meth). Compare device vs
    native ranks + n_km."""
    from f5c_tpu.ops.hmm_meta import build_inputs, pack_meta
    from f5c_tpu.ops.seq_ranks import pack_codes, seq_codes

    SEG = 32
    n = len(items)
    ref_off = np.zeros(len(refs), np.int64)
    np.cumsum([len(r) for r in refs][:-1], out=ref_off[1:])
    ref_concat = b"".join(refs)
    it_read = np.array([i[0] for i in items], np.int32)
    it_ss = np.array([i[1] for i in items], np.int64)
    it_se = np.array([i[2] for i in items], np.int64)
    it_meth = np.array([i[3] for i in items], np.uint8)
    rc = np.asarray(read_rc, np.uint8)

    n_alloc = 128 // SEG * 8   # one grid row minimum
    ranks_n, n_km_n = native.hmm_window_ranks(
        n, n_alloc, SEG, K, ref_concat, ref_off, it_read, it_ss,
        it_se, it_meth, rc, 15625)

    codes = seq_codes(ref_concat + b"\0" * 8)
    packed = pack_codes(codes, pad_to=1 << 8)
    read_tab = np.zeros((8, 8), np.float32)
    read_tab[:, 2] = 1.0
    read_tab[:len(rc), 5] = rc
    gstart = (ref_off[it_read] + it_ss).astype(np.int32)
    wlen = (it_se - it_ss + 1).astype(np.int32)
    meta = np.zeros((n_alloc, 16), np.uint8)
    meta[:n] = pack_meta(gstart, np.zeros(n, np.int32),
                         np.ones(n, np.int32), wlen, it_meth, it_read)
    out = build_inputs(meta, packed, read_tab, SEG=SEG, k=K,
                       use_i16=True)
    ranks_d = np.asarray(out[0]).reshape(n_alloc, SEG)
    n_km_d = np.asarray(out[1]).reshape(-1)[:n]
    for i in range(n):
        nk = n_km_n[i]
        assert n_km_d[i] == nk, (i, n_km_d[i], nk)
        assert np.array_equal(ranks_d[i, :nk], ranks_n[i, :nk]), \
            (i, ranks_d[i, :nk], ranks_n[i, :nk])


def test_edge_cases_fwd_and_rc():
    #        0123456789012345678
    ref0 = b"AACGTACGTTTCGGATTCG"   # CpGs at 2,6,11,17
    ref1 = b"GGTACGTACCGTAAACGTA"   # starts with G (rc-edge bait)
    refs = [ref0, ref1]
    items = []
    # fwd meth window ending exactly at the C of a CpG (pos 17 of
    # ref0: window [8, 17], next base G at 18 is OUTSIDE the window)
    items.append((0, 8, 17, 1))
    items.append((0, 8, 17, 0))
    # same window extended to include the G: interior CpG
    items.append((0, 8, 18, 1))
    # rc read: window starting at the G of an interior CpG of ref1
    # (C at 9, G at 10): window [10, 18] — plane sees M at 10
    items.append((1, 10, 18, 1))
    items.append((1, 10, 18, 0))
    # rc window NOT on an edge
    items.append((1, 2, 12, 1))
    # window ending at the very end of ref0 (next base = ref1[0] == G
    # in the concat: cross-read bait; ref0[-1] is G so no C edge, use
    # [10, 18] where 18 is 'G'... craft one ending at a C before the
    # boundary: ref0 ends ...TTCG; window [6, 17] ends at C(17)
    items.append((0, 6, 17, 1))
    _run_case(refs, items, read_rc=[0, 1])


def test_cross_read_boundary_c_then_g():
    # ref0 ends in C; ref1 begins with G -> the concat plane fabricates
    # a CpG across the read boundary; window-local semantics must win
    ref0 = b"ATTACGTACATTACCTAGC"
    ref1 = b"GATTACAGGATCCGATTAC"
    items = [
        (0, 7, 18, 1),   # fwd meth window ending at the trailing C
        (0, 7, 18, 0),
        (1, 0, 11, 1),   # fwd meth window starting at the leading G
        (1, 0, 11, 0),
    ]
    _run_case([ref0, ref1], items, read_rc=[0, 0])
    # same windows on reverse-strand reads: the rc first-position edge
    _run_case([ref0, ref1], items, read_rc=[1, 1])


def test_random_windows_match():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    refs = []
    for _ in range(3):
        n = int(rng.integers(60, 120))
        seq = rng.choice(bases, n).tobytes()
        refs.append(seq)
    items = []
    for _ in range(24):
        rd = int(rng.integers(0, 3))
        L = len(refs[rd])
        ss = int(rng.integers(0, L - K - 2))
        se = int(rng.integers(ss + K - 1, min(ss + 37, L - 1)))
        items.append((rd, ss, se, int(rng.integers(0, 2))))
    _run_case(refs, items, read_rc=[0, 1, 1])
