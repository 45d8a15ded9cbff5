"""F5C_TPU_HMM_META: the compact device-side HMM input assembly
(ops/hmm_meta.py — 2-bit packed reference + per-read table + 16 B of
metadata per window, ranks rebuilt on device with window-edge
corrections) must score bit-identically to the host-assembled path
(native hmm_window_ranks + per-window arrays)."""

import os
import subprocess
import sys

import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")

_SCRIPT = r"""
import sys, os, tempfile, filecmp, glob
sys.path.insert(0, %(repo)r); os.chdir(%(repo)r)
from f5c_tpu.io.bam import write_bam
from f5c_tpu.io.fasta import FastaIndex
from f5c_tpu.io.readdb import ReadDB
from f5c_tpu.pipeline.runner import Options, Pipeline

ECOLI = %(ecoli)r
tmp = tempfile.mkdtemp(prefix="pb_")
fa = FastaIndex(os.path.join(ECOLI, "reads.fasta"))
names = fa.names()[:6]
genome = os.path.join(tmp, "genome.fa"); reads = os.path.join(tmp, "reads.fasta")
with open(genome, "w") as g, open(reads, "w") as r:
    for n in names:
        seq = fa.fetch(n); g.write(f">{n}\n{seq}\n"); r.write(f">{n}\n{seq}\n")
class Rec: pass
recs = []
for i, n in enumerate(names):
    rec = Rec(); rec.qname = n; rec.flag = 0; rec.tid = i; rec.pos = 0
    rec.mapq = 60; rec.cigar = [(0, fa.entries[n].length)]; rec.seq = fa.fetch(n)
    recs.append(rec)
bam = os.path.join(tmp, "self.bam")
write_bam(bam, [(n, fa.entries[n].length) for n in names], recs)
ReadDB(reads).build(fast5_dirs=[os.path.join(ECOLI, "fast5_files")])
outs = []
for flag in ("1", "0"):
    os.environ["F5C_TPU_HMM_META"] = flag
    pipe = Pipeline(bam, genome, reads, Options(min_mapq=0, meth_out_version=1))
    p = os.path.join(tmp, f"m{flag}.tsv")
    with open(p, "w") as out:
        pipe.call_methylation(out=out)
    outs.append(p)
assert filecmp.cmp(outs[0], outs[1], shallow=False), "meta != host-assembled"
print("HMM_META_OK")
"""


def test_meta_matches_host_assembled():
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "F5C_TPU_INTERPRET": "1", "F5C_TPU_MESH": "0"})
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT % dict(repo=REPO, ecoli=ECOLI)],
        env=env, capture_output=True, text=True, timeout=840)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "HMM_META_OK" in out.stdout
