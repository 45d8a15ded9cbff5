"""Device Viterbi kernel vs the loop-faithful NumPy oracle."""

import numpy as np
import pytest

from f5c_tpu.models import builtin_model
from f5c_tpu.ops.abea_ref import Scalings
from f5c_tpu.ops.hmm import decode_viterbi_movements, hmm_viterbi_packed
from f5c_tpu.ops.hmm_ref import profile_hmm_viterbi


def _make_case(rng, model, n_ref=105, rc=False, stride=1):
    seq = "".join(rng.choice(list("ACGT"), n_ref))
    from f5c_tpu.pipeline.methylation import reverse_complement

    rc_seq = reverse_complement(seq)
    # synthetic events that roughly follow the window's kmers
    ranks = (model.kmer_ranks(rc_seq) if rc else model.kmer_ranks(seq))
    n_k = len(ranks)
    n_ev = int(rng.integers(n_k // 2, 2 * n_k))
    which = np.sort(rng.integers(0, n_k, n_ev))
    means = (model.level_mean[ranks[which]]
             + rng.normal(0, 1.0, n_ev)).astype(np.float32)
    # embed the window into a bigger event pool
    pool = rng.uniform(60, 120, n_ev + 200).astype(np.float32)
    if stride == 1:
        e_start = 100
        pool[e_start:e_start + n_ev] = means
        e_end = e_start + n_ev - 1
    else:
        e_end = 100
        pool[e_end:e_end + n_ev] = means[::-1]
        e_start = e_end + n_ev - 1
    sc = Scalings(shift=0.3, scale=1.01, var=1.1)
    return seq, rc_seq, pool, e_start, e_end, sc


@pytest.mark.parametrize("rc,stride", [(False, 1), (True, -1)])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_viterbi_matches_oracle(rc, stride, seed):
    import jax.numpy as jnp

    model = builtin_model("dna_r9_nucleotide")
    rng = np.random.default_rng(seed)
    seq, rc_seq, pool, e_start, e_end, sc = _make_case(
        rng, model, rc=rc, stride=stride)
    epb = 1.8

    oracle = profile_hmm_viterbi(seq, rc_seq, pool, sc, model, e_start,
                                 e_end, stride, rc, epb)

    from f5c_tpu.ops.hmm_ref import window_kmer_ranks

    ranks = window_kmer_ranks(seq, rc_seq, rc, model).astype(np.int32)
    n_k = ranks.shape[0]
    n_ev = abs(e_end - e_start) + 1
    pad_k = 128
    pad_e = 512
    max_path = pad_e + pad_k
    rk = np.zeros((1, pad_k), np.int32)
    rk[0, :n_k] = ranks
    p_stay = 1 - 1 / epb
    movs, n_steps = hmm_viterbi_packed(
        jnp.asarray(rk), jnp.asarray([n_k], jnp.int32), jnp.asarray(pool),
        jnp.asarray([e_start], jnp.int32), jnp.asarray([stride], jnp.int32),
        jnp.asarray([n_ev], jnp.int32),
        jnp.asarray([sc.scale], jnp.float32),
        jnp.asarray([sc.shift], jnp.float32),
        jnp.asarray([sc.var], jnp.float32),
        jnp.asarray([np.log(p_stay)], jnp.float32),
        jnp.asarray([np.log(1 - p_stay - 0.0025 - 0.001)], jnp.float32),
        jnp.asarray(model.level_mean), jnp.asarray(model.level_stdv),
        jnp.asarray(model.level_log_stdv),
        pad_events=pad_e, max_path=max_path)
    movs = np.asarray(movs)[0]
    n_steps = int(np.asarray(n_steps)[0])
    ev_idx, k_idx, ps = decode_viterbi_movements(
        movs, n_steps, e_start, stride, n_ev, n_k)

    assert len(oracle) == n_steps
    o_ev = np.array([o[0] for o in oracle])
    o_k = np.array([o[1] for o in oracle])
    o_s = np.array([{"K": 0, "B": 1, "M": 2}[o[2]] for o in oracle])
    np.testing.assert_array_equal(ev_idx, o_ev)
    np.testing.assert_array_equal(k_idx, o_k)
    np.testing.assert_array_equal(ps, o_s)
