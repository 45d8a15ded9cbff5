"""F5C_TPU_HMM_PACKBUF: the single-buffer HMM upload path must score
bit-identically to the ten-array path (pack_hmm_args + on-device
bitcasts, ops/hmm_pallas.py)."""

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
    os.environ["F5C_TPU_HMM_PACKBUF"] = flag
    pipe = Pipeline(bam, genome, reads, Options(min_mapq=0, meth_out_version=1))
    p = os.path.join(tmp, f"m{flag}.tsv")
    with open(p, "w") as out:
        pipe.call_methylation(out=out)
    outs.append(p)
assert filecmp.cmp(outs[0], outs[1], shallow=False), "packbuf != plain"
print("PACKBUF_OK")
"""


def test_packbuf_matches_plain():
    env = dict(os.environ)
    env.update({"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
                "F5C_TPU_INTERPRET": "1", "F5C_TPU_MESH": "0"})
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT % dict(repo=REPO, ecoli=ECOLI)],
        env=env, capture_output=True, text=True, timeout=840)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "PACKBUF_OK" in out.stdout
