"""On-device event detection vs the NumPy oracle / native detector.

Two tiers, mirroring how the reference validates its CUDA kernels with
the same oracle plus tolerance (scripts/test.sh:47-57):

- on the CPU backend the op is EXACT: every event boundary and
  statistic bit-matches the oracle.  The two-float arithmetic
  reproduces the reference's f64 paths; CPU eager execution keeps IEEE
  division/sqrt.  Because the session's default platform may be an
  accelerator plugin that shadows the CPU backend, these tests run the
  comparison in a clean-environment subprocess (JAX_PLATFORMS=cpu).
- on an accelerator backend, f32 division/sqrt are not correctly
  rounded (TPU lowers them via Newton-refined reciprocals, exactly as
  CUDA's fast paths do), so ~1-ulp t-stat wiggle can flip rare peak
  decisions.  The budget test asserts event counts within 0.1% and
  >= 99.5% identical boundaries per read.

Reference: src/events.c:222-513.
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_signals(limit=None):
    from f5c_tpu.io.fast5 import read_fast5_signal

    paths = sorted(glob.glob(os.path.join(ECOLI, "fast5_files", "*.fast5")))
    if limit:
        paths = paths[:limit]
    return [read_fast5_signal(p).to_pa() for p in paths]


def _pad_batch(pas):
    S = max(p.shape[0] for p in pas)
    S = -(-S // 256) * 256
    B = len(pas)
    pad = np.zeros((B, S), np.float32)
    lens = np.zeros(B, np.int32)
    for i, p in enumerate(pas):
        pad[i, : p.shape[0]] = p
        lens[i] = p.shape[0]
    return pad, lens


def _exact_check(limit):
    """Runs inside the clean-env subprocess: op (CPU eager, IEEE) vs
    the NumPy oracle, bit-exact."""
    import jax.numpy as jnp

    from f5c_tpu.ops.events_device import detect_events_device
    from f5c_tpu.ops.events_ref import detect_events

    pas = _load_signals(limit=limit)
    pad, lens = _pad_batch(pas)
    fn = detect_events_device.__wrapped__  # eager: IEEE div/sqrt
    out = fn(jnp.asarray(pad), jnp.asarray(lens), rna=False)
    starts, lengths, means, stdvs, n_ev = [np.asarray(x) for x in out]
    total = 0
    for i, pa in enumerate(pas):
        ref = detect_events(pa, rna=False)
        n = int(n_ev[i])
        assert n == ref.n, f"read {i}: {n} events vs oracle {ref.n}"
        np.testing.assert_array_equal(starts[i, :n], ref.start)
        np.testing.assert_array_equal(lengths[i, :n], ref.length)
        np.testing.assert_array_equal(means[i, :n], ref.mean)
        np.testing.assert_array_equal(stdvs[i, :n], ref.stdv)
        total += n
    print(f"OK {len(pas)} reads, {total} events bit-exact")


def _run_exact_subprocess(limit, timeout):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # stop the axon plugin registering
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "exact", str(limit)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, f"exact check failed:\n{r.stdout}\n{r.stderr}"
    assert "bit-exact" in r.stdout


@pytest.mark.skipif(not os.path.isdir(ECOLI), reason="test data missing")
def test_device_events_exact_vs_oracle_cpu():
    _run_exact_subprocess(limit=8, timeout=900)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(ECOLI), reason="test data missing")
def test_device_events_fullset_exact_cpu():
    """All 112 reads, bit-exact (slow: eager two-float scans)."""
    _run_exact_subprocess(limit=None or 0, timeout=3600)


@pytest.mark.skipif(not os.path.isdir(ECOLI), reason="test data missing")
def test_device_events_budget_accelerator():
    """On the session backend (TPU when attached): event counts within
    0.1% and >=99.5% identical boundaries — the same oracle-plus-budget
    style the reference applies to its GPU kernels."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("no accelerator attached")
    import jax.numpy as jnp

    from f5c_tpu.ops.events_device import detect_events_device
    from f5c_tpu.ops.events_ref import detect_events

    pas = _load_signals(limit=24)
    pad, lens = _pad_batch(pas)
    out = detect_events_device(jnp.asarray(pad), jnp.asarray(lens), rna=False)
    starts, lengths, means, stdvs, n_ev = [np.asarray(x) for x in out]
    for i, pa in enumerate(pas):
        ref = detect_events(pa, rna=False)
        n = int(n_ev[i])
        assert abs(n - ref.n) <= max(2, ref.n // 1000), \
            f"read {i}: {n} vs {ref.n}"
        # a single inserted/removed boundary shifts every later index,
        # so compare the boundary SETS (the reference's own oracle
        # allows <=5% deviant rows for its GPU path; we hold 99.5%)
        dev = set(starts[i, :n].tolist())
        refset = set(ref.start.tolist())
        overlap = len(dev & refset) / max(len(refset), 1)
        assert overlap >= 0.995, f"read {i}: {overlap:.4%} boundary overlap"


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    if len(sys.argv) >= 2 and sys.argv[1] == "exact":
        lim = int(sys.argv[2]) if len(sys.argv) > 2 else 0
        _exact_check(lim or None)
    else:
        sys.exit("usage: test_events_device.py exact [n_reads]")
