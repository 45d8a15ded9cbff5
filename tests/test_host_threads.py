"""Host thread-pool parity: the full 112-read call-methylation
pipeline with F5C_TPU_POST_THREADS=4 must be byte-identical to the
serial run.

The `_host_pool` threads carry the three hot host stages (signal load +
event detect via prep_read, postalign/QC decode, CpG group collection)
on real multi-core TPU hosts — the role of the reference's
work-stealing pthread pool (src/f5c.c:574-679).  This pins the claim
that threading changes nothing but wall time (BENCH.md
"Host-parallelism for real TPU hosts") in the default suite.
"""

import io
import os
import sys

import pytest

ECOLI = "/root/reference/test/ecoli_2kb_region"

pytestmark = pytest.mark.skipif(not os.path.isdir(ECOLI),
                                reason="dataset missing")


def _run_meth(tmp, n_threads: int) -> str:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from f5c_tpu.pipeline.runner import Options, Pipeline

    bam, genome, reads, _n, slow5 = bench.setup_dataset(str(tmp),
                                                        blow5=True)
    os.environ["F5C_TPU_POST_THREADS"] = str(n_threads)
    try:
        opt = Options(min_mapq=0, meth_out_version=1, slow5_path=slow5)
        pipe = Pipeline(bam, genome, reads, opt)
        out = io.StringIO()
        pipe.call_methylation(out=out)
        assert pipe.counters["processed"] > 100
        return out.getvalue()
    finally:
        os.environ.pop("F5C_TPU_POST_THREADS", None)


def test_post_threads_byte_identical(tmp_path):
    d1 = tmp_path / "serial"
    d2 = tmp_path / "threaded"
    d1.mkdir()
    d2.mkdir()
    serial = _run_meth(d1, 1)
    threaded = _run_meth(d2, 4)
    assert serial == threaded
