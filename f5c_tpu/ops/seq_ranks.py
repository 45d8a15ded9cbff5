"""Device-side k-mer rank computation from 2-bit packed sequence.

The ABEA launch needs each read's nucleotide k-mer ranks on device.
Shipping precomputed ranks costs 2 bytes per base over the host->device
link; shipping the sequence 2-bit packed costs 0.25 bytes per base and
the ranks fall out of k shifted adds on the VPU (the rolling-rank loop
of native f5c_kmer_ranks, re-expressed data-parallel: rank[p] =
sum_j code[p+j] << 2*(k-1-j); reference rank function:
/root/reference/src/align.c:36-47).

Host side packs with numpy (a table lookup + three shifted ORs); the
device side unpacks and ranks inside one jitted dispatch.  Values are
bit-identical to native.kmer_ranks for every byte the launch consumes
(positions past a read's n_kmers are garbage lanes the kernel masks).
"""

from __future__ import annotations

import functools

import numpy as np

# dna_code mapping (f5chost.cpp dna_code): A/other=0 C=1 G=2 T=3
_DNA_LUT = np.zeros(256, np.uint8)
_DNA_LUT[ord("C")] = 1
_DNA_LUT[ord("G")] = 2
_DNA_LUT[ord("T")] = 3
_DNA_LUT[ord("c")] = 1
_DNA_LUT[ord("g")] = 2
_DNA_LUT[ord("t")] = 3


def seq_codes(seq) -> np.ndarray:
    """2-bit codes (u8) for one sequence (str/bytes)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return _DNA_LUT[np.frombuffer(seq, np.uint8)]


def pack_codes(codes: np.ndarray, pad_to: int = 1) -> np.ndarray:
    """Pack u8 codes (values 0..3) 4-per-byte; output length padded up
    to ``pad_to`` bytes (zero fill)."""
    n = codes.shape[0]
    nbytes = max((n + 3) // 4, 1)
    if pad_to > 1:
        nbytes = ((nbytes + pad_to - 1) // pad_to) * pad_to
    buf = np.zeros(4 * nbytes, np.uint8)
    buf[:n] = codes
    q = buf.reshape(-1, 4)
    return (q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4)
            | (q[:, 3] << 6)).astype(np.uint8)


def pack_seqs(seqs, pad_to: int = 1):
    """Pack a list of sequences into one 2-bit buffer.

    Returns (packed u8 array, int32 base offsets): sequence i's base p
    is code ``unpack(packed)[off[i] + p]``.
    """
    lens = np.fromiter((len(s) for s in seqs), np.int64, len(seqs))
    off = np.zeros(len(seqs), np.int64)
    np.cumsum(lens[:-1], out=off[1:])
    total = int(lens.sum()) if len(seqs) else 0
    codes = np.empty(total, np.uint8)
    for s, o, ln in zip(seqs, off, lens):
        codes[int(o):int(o) + int(ln)] = seq_codes(s)
    return pack_codes(codes, pad_to=pad_to), off.astype(np.int32)


@functools.partial(
    __import__("jax").jit, static_argnames=("k", "use_i16"))
def ranks_from_packed(packed, k: int, use_i16: bool):
    """Base-indexed rolling 2-bit ranks of the packed buffer.

    out[p] = rank of the k-mer starting at base p (garbage for the last
    k-1 positions of each read and in padding — callers only index
    p < n_kmers of each read).  dtype int16 when the model's rank space
    fits (4^k <= 32768), else int32.
    """
    import jax.numpy as jnp

    c = packed.astype(jnp.int32)
    codes = jnp.stack([(c >> 0) & 3, (c >> 2) & 3,
                       (c >> 4) & 3, (c >> 6) & 3], axis=1).reshape(-1)
    acc = codes << (2 * (k - 1))
    for j in range(1, k):
        acc = acc + (jnp.roll(codes, -j) << (2 * (k - 1 - j)))
    return acc.astype(jnp.int16 if use_i16 else jnp.int32)
