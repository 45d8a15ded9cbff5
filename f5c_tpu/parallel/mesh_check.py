"""Mesh parity harness: run the PRODUCTION align path (ring Pallas
kernel, interpreter mode off-chip) over real ecoli reads twice — once
single-device, once data-parallel over every visible device — and
assert bit-identical pipeline results.  Used by tests/test_mesh.py (in
a CPU subprocess) and by __graft_entry__.dryrun_multichip (the driver's
virtual-device validation)."""

from __future__ import annotations

import os
import tempfile

import numpy as np

ECOLI_DIR = "/root/reference/test/ecoli_2kb_region"


def _mini_pipeline(tmpdir: str, n_reads: int):
    from f5c_tpu.io.bam import write_bam
    from f5c_tpu.io.fasta import FastaIndex
    from f5c_tpu.io.readdb import ReadDB
    from f5c_tpu.pipeline.runner import Options, Pipeline

    fa = FastaIndex(os.path.join(ECOLI_DIR, "reads.fasta"))
    names = fa.names()[:n_reads]
    reads = os.path.join(tmpdir, "reads.fasta")
    genome = os.path.join(tmpdir, "genome.fa")
    with open(genome, "w") as g, open(reads, "w") as r:
        for n in names:
            seq = fa.fetch(n)
            g.write(f">{n}\n{seq}\n")
            r.write(f">{n}\n{seq}\n")

    class Rec:
        pass

    recs = []
    for i, n in enumerate(names):
        rec = Rec()
        rec.qname = n
        rec.flag = 0
        rec.tid = i
        rec.pos = 0
        rec.mapq = 60
        rec.cigar = [(0, fa.entries[n].length)]
        rec.seq = fa.fetch(n)
        recs.append(rec)
    bam = os.path.join(tmpdir, "self.bam")
    write_bam(bam, [(n, fa.entries[n].length) for n in names], recs)
    ReadDB(reads).build(
        fast5_dirs=[os.path.join(ECOLI_DIR, "fast5_files")])
    return Pipeline(bam, genome, reads, Options(min_mapq=0, num_proc=1))


def _run_align(tmp_root: str, tag: str, mesh: bool, n_reads: int):
    import time

    import io

    os.environ["F5C_TPU_INTERPRET"] = "1"
    os.environ["F5C_TPU_MESH"] = "1" if mesh else "0"
    # device lockstep rounds so the sharded Viterbi path is exercised
    os.environ["F5C_TPU_EA_ENGINE"] = "device"
    try:
        d = os.path.join(tmp_root, tag)
        os.makedirs(d, exist_ok=True)
        pipe = _mini_pipeline(d, n_reads)
        (batch,) = list(pipe.batches())
        t0 = time.time()
        pipe.align_batch(batch)
        sites = pipe.meth_batch(batch)      # sharded HMM under the mesh
        _run_align.last_secs = time.time() - t0
        out = {}
        for r in batch:
            scored = sites.get(id(r), {})
            if hasattr(scored, "to_sites"):   # MethCalls fast path
                scored = scored.to_sites()
            out[r.qname] = (
                int(r.status),
                None if r.pairs is None else r.pairs.copy(),
                None if r.scaling is None else
                (r.scaling.shift, r.scaling.scale, r.scaling.var),
                None if r.b2e_start is None else r.b2e_start.copy(),
                sorted((pos, s.ll_methylated, s.ll_unmethylated)
                       for pos, s in scored.items()),
            )
        # eventalign through the sharded lockstep Viterbi rounds
        # (parallel/mesh.py:shard_viterbi_rounds under the mesh),
        # reusing the batch already aligned above (the align stage is
        # the slow part off-chip in interpreter mode)
        from f5c_tpu.pipeline.eventalign import (EventalignEngine,
                                                 emit_tsv)

        engine = EventalignEngine(pipe.model)
        ok = [r for r in batch
              if not r.status and r.b2e_start is not None]
        refs = [pipe._fetch_ref_segment(r) for r in ok]
        recs_map = engine.realign_batch(ok, refs)
        ea = io.StringIO()
        for i, r in enumerate(ok):
            recs = recs_map[id(r)]
            ea.write(emit_tsv(recs, r, pipe.model,
                              pipe.bam.references[r.tid],
                              recs.ref_disamb, recs.ref_offset, i))
        out["__eventalign__"] = ea.getvalue()
        return out
    finally:
        os.environ.pop("F5C_TPU_INTERPRET", None)
        os.environ.pop("F5C_TPU_MESH", None)
        os.environ.pop("F5C_TPU_EA_ENGINE", None)


def run_mesh_parity(n_reads: int = 10) -> int:
    """Returns the number of reads compared; raises on any mismatch.

    Also prints align+meth wall time for the single-device and sharded
    runs.  NOTE on the throughput numbers: off-chip the 'devices' are
    virtual CPU devices in Pallas interpreter mode sharing ONE host
    core, so sharded reads/s measures mesh-dispatch OVERHEAD (it cannot
    show speedup); real scaling needs real chips.
    """
    import jax

    from f5c_tpu.parallel.mesh import TRANSFER_LOG

    n_dev = len(jax.devices())
    assert n_dev >= 2, f"need a multi-device mesh, have {n_dev}"
    TRANSFER_LOG.clear()
    tmp = tempfile.mkdtemp(prefix="f5c_mesh_")
    single = _run_align(tmp, "single", mesh=False, n_reads=n_reads)
    t_single = _run_align.last_secs
    sharded = _run_align(tmp, "sharded", mesh=True, n_reads=n_reads)
    t_sharded = _run_align.last_secs
    print(f"[mesh_check] align+meth wall: single-device {t_single:.1f}s "
          f"({n_reads / t_single:.2f} reads/s), {n_dev}-device mesh "
          f"{t_sharded:.1f}s ({n_reads / t_sharded:.2f} reads/s) "
          f"[virtual devices share one host core: overhead probe, "
          f"not a speedup measure]")
    ea_single = single.pop("__eventalign__")
    ea_sharded = sharded.pop("__eventalign__")
    assert set(single) == set(sharded)
    for q in single:
        s0, p0, sc0, b0, m0 = single[q]
        s1, p1, sc1, b1, m1 = sharded[q]
        assert s0 == s1, f"{q}: status {s0} != {s1}"
        if p0 is None:
            assert p1 is None, q
            continue
        np.testing.assert_array_equal(p0, p1, err_msg=q)
        assert sc0 == sc1, q
        np.testing.assert_array_equal(b0, b1, err_msg=q)
        assert m0 == m1, f"{q}: meth scores differ under the mesh"
    assert ea_single == ea_sharded, (
        "eventalign TSV differs under the mesh")
    n_ea = ea_single.count("\n") - 1
    print(f"[mesh_check] eventalign sharded == single byte-for-byte "
          f"({n_ea} TSV rows)")
    from f5c_tpu.parallel.mesh import transfer_table
    print("[mesh_check] per-device H2D accounting (sharded run):")
    print(transfer_table())
    return len(single)


if __name__ == "__main__":
    n = run_mesh_parity(int(os.environ.get("F5C_MESH_READS", "10")))
    print(f"[mesh_check] OK: {n} reads, sharded == single bit-for-bit")
