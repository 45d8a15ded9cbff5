"""f5c-tpu: a TPU-native nanopore signal-analysis framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of f5c
(Nanopolish's index / call-methylation / eventalign re-engineered for GPUs):
raw-signal event detection, adaptive banded event alignment (ABEA), scaling
recalibration, and profile-HMM methylation scoring / event re-alignment —
designed TPU-first: batched, length-binned reads; fixed-shape padded device
ops; `jax.sharding.Mesh` data-parallel scaling; Pallas kernels for the DP
hot loops.

Subpackages
-----------
- ``f5c_tpu.models``   pore model tables (k-mer -> current level Gaussians)
- ``f5c_tpu.io``       BLOW5/SLOW5, FAST5, BAM, FASTA/FASTQ, readdb index
- ``f5c_tpu.ops``      device ops: events, ABEA, scaling, profile HMM
- ``f5c_tpu.pipeline`` batch runtime: load -> process -> output pipeline
- ``f5c_tpu.parallel`` device-mesh sharding utilities
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the band-fill/backtrace programs are
# expensive one-time compiles; cache them across processes.
import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/f5c_tpu_jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
