#!/usr/bin/env python3
"""Convert ONT pore-model text tables into the builtin .npz assets.

The source tables are Oxford Nanopore instrument-calibration data published
via nanopolish and vendored by the reference repo under test/r9-models and
test/rna004-models.  Run once to (re)generate f5c_tpu/models/data/*.npz.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from f5c_tpu.models.pore_model import load_model_file  # noqa: E402

SOURCES = {
    "r9.4_450bps.nucleotide.6mer.npz": (
        "/root/reference/test/r9-models/r9.4_450bps.nucleotide.6mer.template.model",
        "nucleotide",
    ),
    "r9.4_450bps.cpg.6mer.npz": (
        "/root/reference/test/r9-models/r9.4_450bps.cpg.6mer.template.model",
        "meth",
    ),
    "r9.4_70bps.u_to_t_rna.5mer.npz": (
        "/root/reference/test/r9-models/r9.4_70bps.u_to_t_rna.5mer.template.model",
        "nucleotide",
    ),
    "rna004.nucleotide.5mer.npz": (
        "/root/reference/test/rna004-models/rna004.nucleotide.5mer.model",
        "nucleotide",
    ),
}


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "f5c_tpu", "models", "data")
    os.makedirs(out_dir, exist_ok=True)
    for out_name, (src, alphabet) in SOURCES.items():
        model = load_model_file(src, alphabet=alphabet)
        out = os.path.join(out_dir, out_name)
        model.save_npz(out)
        print(f"{out_name}: k={model.k} {alphabet} {model.num_kmers} kmers "
              f"mean[0]={model.level_mean[0]:.4f}")


if __name__ == "__main__":
    main()
