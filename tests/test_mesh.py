"""Multi-chip data parallelism: the PRODUCTION ring-kernel align path
(Pallas fill in interpreter mode), sharded over an 8-device virtual CPU
mesh, must produce bit-identical pipeline results to the single-device
path on real ecoli reads (VERDICT r1 item 2).

The comparison runs in a subprocess because this test suite executes on
the real TPU chip (a single device); the subprocess disables the axon
plugin and forces an 8-device host-CPU platform."""

import os
import subprocess
import sys


def test_sharded_align_matches_single():
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8"),
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        "F5C_MESH_READS": "8",
    })
    out = subprocess.run(
        [sys.executable, "-m", "f5c_tpu.parallel.mesh_check"],
        capture_output=True, text=True, env=env, timeout=1500)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "sharded == single bit-for-bit" in out.stdout
