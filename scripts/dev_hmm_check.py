"""Dev-only: validate hmm_forward_pallas against the XLA packed4/packed
scorers.  CPU interpret: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ..."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from f5c_tpu.models import builtin_model
from f5c_tpu.ops.hmm import hmm_forward_packed4, hmm_forward_packed
from f5c_tpu.ops.hmm_pallas import hmm_forward_pallas

def main():
    interp = jax.default_backend() == "cpu"
    model = builtin_model("dna_r9_cpg")
    rng = np.random.default_rng(int(os.environ.get("SEED", 0)))
    N = 16            # rows
    SEG = int(os.environ.get("SEG", 32))
    SEGS = 128 // SEG
    W = N * SEGS
    # synthetic windows
    n_km = rng.integers(5, SEG + 1, (N, SEGS)).astype(np.int32)
    n_ev = rng.integers(11, 150, (N, SEGS)).astype(np.int32)
    pool = rng.normal(90, 10, 20000).astype(np.float32)
    start = rng.integers(200, 15000, (N, SEGS)).astype(np.int32)
    stride = rng.choice([1, -1], (N, SEGS)).astype(np.int32)
    ranks = np.zeros((N, 128), np.int32)
    for i in range(N):
        for w in range(SEGS):
            ranks[i, w*SEG:w*SEG+n_km[i, w]] = rng.integers(
                0, model.num_kmers, n_km[i, w])
    scale = rng.uniform(0.9, 1.1, (N, SEGS)).astype(np.float32)
    shift = rng.uniform(-5, 5, (N, SEGS)).astype(np.float32)
    var = rng.uniform(0.9, 1.4, (N, SEGS)).astype(np.float32)
    epb = rng.uniform(1.5, 4.0, (N, SEGS))
    lp_stay = np.log(1 - 1/epb).astype(np.float32)
    from f5c_tpu.constants import HMM_P_BAD, HMM_P_SKIP
    lp_step = np.log(1.0 - (1 - 1/epb) - HMM_P_SKIP - HMM_P_BAD).astype(np.float32)
    lm, ls, ll = (jnp.asarray(model.level_mean), jnp.asarray(model.level_stdv),
                  jnp.asarray(model.level_log_stdv))
    pad_e = 256
    if SEG == 32:
        ref = hmm_forward_packed4(
            jnp.asarray(ranks), jnp.asarray(n_km), jnp.asarray(pool),
            jnp.asarray(start), jnp.asarray(stride), jnp.asarray(n_ev),
            jnp.asarray(scale), jnp.asarray(shift), jnp.asarray(var),
            jnp.asarray(lp_stay), jnp.asarray(lp_step), lm, ls, ll,
            pad_events=pad_e)
    else:
        ref = hmm_forward_packed(
            jnp.asarray(ranks[:, :128]), jnp.asarray(n_km[:, 0]),
            jnp.asarray(pool), jnp.asarray(start[:, 0]),
            jnp.asarray(stride[:, 0]), jnp.asarray(n_ev[:, 0]),
            jnp.asarray(scale[:, 0]), jnp.asarray(shift[:, 0]),
            jnp.asarray(var[:, 0]), jnp.asarray(lp_stay[:, 0]),
            jnp.asarray(lp_step[:, 0]), lm, ls, ll, pad_events=pad_e)[:, None]
    ref = np.asarray(ref)
    got = np.asarray(hmm_forward_pallas(
        jnp.asarray(ranks), jnp.asarray(n_km), jnp.asarray(pool),
        jnp.asarray(start), jnp.asarray(stride), jnp.asarray(n_ev),
        jnp.asarray(scale), jnp.asarray(shift), jnp.asarray(var),
        jnp.asarray(lp_stay), jnp.asarray(lp_step), lm, ls, ll,
        SEG=SEG, interpret=interp))
    if SEG == 128:
        got = got[:, :1]
    err = np.abs(got - ref)
    rel = err / np.maximum(np.abs(ref), 1.0)
    print("max abs err:", err.max(), "max rel:", rel.max())
    ok = rel.max() < 1e-4
    print("OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
