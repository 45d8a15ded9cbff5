"""native.format_meth_rows must be byte-identical to the Python
renderer (runner._render_meth_rows fallback) — including the fast
fixed-point %.2f path (fm_f2), sign/zero/tie edge cases, and both
header layouts."""

import numpy as np
import pytest

from f5c_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _python_rows(contig, qname, strand, starts, ends, llm, llu,
                 strands, ncpg, seqs, version):
    parts = []
    for i in range(len(starts)):
        if version == 1:
            head = f"{contig}\t{starts[i]}\t{ends[i]}\t"
        else:
            head = f"{contig}\t{chr(strand)}\t{starts[i]}\t{ends[i]}\t"
        llr = llm[i] - llu[i]
        parts.append(f"{head}{qname}\t{llr:.2f}\t{llm[i]:.2f}\t"
                     f"{llu[i]:.2f}\t{strands[i]}\t{ncpg[i]}\t"
                     f"{seqs[i]}\n")
    return "".join(parts).encode()


def _check(llm, llu):
    n = len(llm)
    starts = np.arange(1000, 1000 + 10 * n, 10, dtype=np.int64)
    ends = starts + 1
    strands = np.ones(n, np.int32)
    ncpg = np.full(n, 2, np.int32)
    seqs = ["ACGTACGTACG"] * n
    for strand, version in ((0, 1), (ord("+"), 2), (ord("-"), 2)):
        got = native.format_meth_rows(
            "chr20", "read-1", strand, starts, ends,
            np.asarray(llm, np.float64), np.asarray(llu, np.float64),
            strands, ncpg, seqs)
        want = _python_rows("chr20", "read-1", strand, starts, ends,
                            np.asarray(llm, np.float64),
                            np.asarray(llu, np.float64),
                            strands, ncpg, seqs, version)
        assert got == want


def test_edge_values():
    llm = [0.0, -0.0, 0.004999999, 0.005, -0.005, 2.675, -2.675,
           1e15, -1e15, 123.455, -123.455, 0.125, -0.125, 1e-12,
           -1e-12, 99.994999, 99.995001, float("inf"), float("-inf")]
    llu = [0.0] * len(llm)
    _check(llm, llu)
    _check(llu, llm)


def test_soa_matches_python_renderer():
    """_render_meth_rows(MethCalls) through the native SoA formatter
    must equal the legacy ScoredSite/Python rendering byte for byte —
    f32 scores, clip windows, both layouts."""
    from f5c_tpu.pipeline.methylation import MethCalls
    from f5c_tpu.pipeline.runner import _render_meth_rows

    rng = np.random.default_rng(3)
    n = 500
    k = 6
    r_pos = 100
    dis = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).tobytes()
    starts = np.sort(rng.choice(
        np.arange(r_pos + k, r_pos + 3000), n, replace=False
    ).astype(np.int64))
    ends = starts + rng.integers(1, 30, n)
    mc = MethCalls(
        starts=starts, ends=ends,
        n_cpg=rng.integers(1, 9, n).astype(np.int32),
        llu=(rng.standard_normal(n) * 40).astype(np.float32),
        llm=(rng.standard_normal(n) * 40).astype(np.float32),
        dis=dis, r_pos=r_pos, k=k)
    for version in (1, 2):
        for rev in (False, True):
            for clip in ((-1, -1), (r_pos + 500, r_pos + 2500)):
                got = _render_meth_rows("tig", "rd", rev, mc, version,
                                        clip[0], clip[1])
                sites = {s: ss for s, ss in mc.to_sites().items()
                         if not ((clip[0] != -1
                                  and ss.start_position < clip[0])
                                 or (clip[1] != -1
                                     and ss.end_position >= clip[1]))}
                want = _render_meth_rows("tig", "rd", rev, sites,
                                         version, -1, -1)
                if isinstance(want, bytes) and isinstance(got, str):
                    got = got.encode()
                if isinstance(got, bytes) and isinstance(want, str):
                    want = want.encode()
                assert got == want


def test_fuzz_random():
    rng = np.random.default_rng(11)
    for scale in (1.0, 100.0, 1e6):
        llm = rng.standard_normal(4096) * scale
        llu = rng.standard_normal(4096) * scale
        _check(llm, llu)
    # values dense around .xx5 rounding boundaries
    base = (rng.integers(-10000, 10000, 4096).astype(np.float64)
            + 0.5) / 100.0
    jit = rng.standard_normal(4096) * 1e-10
    _check(base + jit, np.zeros(4096))
