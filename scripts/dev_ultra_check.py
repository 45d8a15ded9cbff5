"""Dev-only: chunked (windowed) ABEA == unchunked ring kernel, bitwise.
CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/dev_ultra_check.py
"""
import os, sys
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from f5c_tpu.models import builtin_model
from f5c_tpu.ops import abea
from f5c_tpu.ops.abea import CHUNK
from f5c_tpu.ops.abea_ring import abea_align_device_ring
from f5c_tpu.ops.abea_ultra import align_ultra_read
from f5c_tpu.constants import ABEA_EPSILON_SKIP, ABEA_LP_TRIM_P

def main():
    interp = jax.default_backend() == "cpu"
    model = builtin_model("dna_r9_nucleotide")
    rng = np.random.default_rng(int(os.environ.get("SEED", 0)))
    nk = int(os.environ.get("NK", 3000))
    nev = int(nk * 1.8)
    kr = rng.integers(0, 4096, nk).astype(np.int32)
    which = np.clip(np.floor(np.linspace(0, nk, nev, endpoint=False)).astype(int), 0, nk-1)
    ev = (model.level_mean[kr[which]] + rng.normal(0, 2.0, nev)).astype(np.float32)
    epk = nev / nk
    p_stay = 1.0 - 1.0 / (epk + 1.0)
    lp_stay = float(np.log(p_stay)); lp_step = float(np.log(1.0 - ABEA_EPSILON_SKIP - p_stay))
    lp_skip = float(np.log(ABEA_EPSILON_SKIP)); lp_trim = float(np.log(ABEA_LP_TRIM_P))

    packed_u, n_u, se_u = align_ultra_read(
        ev, kr, model.level_mean, model.level_stdv, model.level_log_stdv,
        1.0, 0.0, lp_stay, lp_step, lp_skip, lp_trim,
        win_bands=int(os.environ.get("WIN", 2048)), interpret=interp)

    # unchunked reference: production ring align
    def bucket(n, minimum=256):
        b = minimum
        while b < n: b *= 2
        return b
    E, K = bucket(nev), bucket(nk)
    nb = ((E + K + 2 + CHUNK - 1)//CHUNK)*CHUNK
    from f5c_tpu.ops.abea_ring import R
    B = R
    byte_cap = np.full(B, (nev + nk + 3)//4, np.int64)
    off = np.zeros(B+1, np.int32); np.cumsum(byte_cap, out=off[1:])
    cap = bucket(int(off[-1]), 4096)
    flat, se, n = abea_align_device_ring(
        jnp.asarray(ev), jnp.zeros(B, jnp.int32), jnp.full(B, nev, jnp.int32),
        jnp.asarray(kr), jnp.zeros(B, jnp.int32), jnp.full(B, nk, jnp.int32),
        jnp.asarray(model.level_mean), jnp.asarray(model.level_stdv),
        jnp.asarray(model.level_log_stdv),
        jnp.full(B, 1.0, jnp.float32), jnp.full(B, 0.0, jnp.float32),
        jnp.full(B, lp_stay, jnp.float32), jnp.full(B, lp_step, jnp.float32),
        jnp.full(B, lp_skip, jnp.float32), jnp.full(B, lp_trim, jnp.float32),
        jnp.asarray(off), E=E, K=K, n_bands=nb, max_pairs=E+K, cap=cap,
        interpret=interp)
    flat = np.asarray(flat); se = int(np.asarray(se)[0]); n0 = int(np.asarray(n)[0])
    ref_packed = flat[off[0]:off[0] + (n0+3)//4]
    ok = True
    if se != se_u: ok = False; print("start_e:", se_u, "vs", se)
    if n0 != n_u: ok = False; print("n:", n_u, "vs", n0)
    def unpack(b, nn):
        d = np.stack([(b>>0)&3,(b>>2)&3,(b>>4)&3,(b>>6)&3],1).reshape(-1)[:nn]
        return d
    if ok and not np.array_equal(unpack(packed_u, n_u), unpack(ref_packed, n0)):
        ok = False; print("dirs differ")
    print("OK" if ok else "FAILED", f"(n={n_u}, windows over {nev+nk+2} bands)")
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
