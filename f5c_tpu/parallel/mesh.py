"""Device-mesh scaling: data-parallel read batches over `jax.sharding`.

The pore model and reference tables are tiny (<= 2M floats) and replicated;
reads are embarrassingly parallel, so the mesh design is a single 'data'
axis over all chips (ICI-linked).  Host-side, each process feeds its own
shard of the BAM stream (read_idx % n_hosts) and outputs merge
deterministically by read index — the distributed analogue of the
reference's per-host file sharding + freq-merge (SURVEY §2.7).

Collectives: meth-freq count maps are associative sums -> psum over the
mesh; per-read outputs are gathered per host and merged by index.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


# per-device transfer accounting for sharded dispatches: evidence that
# the host can feed N chips (per-device H2D shrinks with the mesh while
# replicated tables stay constant).  Keys: <kind>.{n_dispatch,
# sharded_bytes, replicated_bytes, per_device_bytes}.
TRANSFER_LOG: dict[str, float] = {}


def record_dispatch(kind: str, sharded_bytes: int, replicated_bytes: int,
                    n_dev: int) -> None:
    def add(key, v):
        TRANSFER_LOG[key] = TRANSFER_LOG.get(key, 0.0) + v

    add(f"{kind}.n_dispatch", 1)
    add(f"{kind}.sharded_bytes", float(sharded_bytes))
    add(f"{kind}.replicated_bytes", float(replicated_bytes))
    add(f"{kind}.per_device_bytes",
        float(sharded_bytes) / max(n_dev, 1) + float(replicated_bytes))


def transfer_table() -> str:
    """Human-readable per-device H2D table (one row per dispatch kind)."""
    kinds = sorted({k.rsplit(".", 1)[0] for k in TRANSFER_LOG})
    rows = ["kind            disp   sharded_MB  replicated_MB  "
            "per_device_MB"]
    for k in kinds:
        g = lambda f: TRANSFER_LOG.get(f"{k}.{f}", 0.0)  # noqa: E731
        rows.append(f"{k:<15} {int(g('n_dispatch')):>4}   "
                    f"{g('sharded_bytes') / 1e6:>10.3f}  "
                    f"{g('replicated_bytes') / 1e6:>13.3f}  "
                    f"{g('per_device_bytes') / 1e6:>13.3f}")
    return "\n".join(rows)


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as _sm
    except (ImportError, AttributeError):
        from jax.experimental.shard_map import shard_map as _sm
    try:
        # check_vma would demand varying-mesh-axis annotations on the
        # Pallas kernels' out_shapes; the kernels are per-device programs
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except TypeError:
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


@functools.partial(jax.jit, static_argnames=("mesh", "E", "K", "n_bands",
                                             "max_pairs", "cap",
                                             "interpret"))
def shard_align_ring(mesh: Mesh, ev_concat, ev_off, ev_len, rank_concat,
                     rk_off, rk_len, level_mean, level_stdv,
                     level_log_stdv, scale, shift, lp_stay, lp_step,
                     lp_skip, lp_trim, byte_off,
                     E: int, K: int, n_bands: int, max_pairs: int,
                     cap: int, interpret: bool = False):
    """The PRODUCTION ring-kernel ABEA (ops/abea_ring.py: on-device
    expansion -> Pallas fill -> minimal walk -> ragged compaction) with
    the read axis data-parallel over the mesh.

    Every per-batch array carries a leading device axis (one concat-pool
    shard per device, reads dealt round-robin by the runner for load
    balance); the model tables are replicated.  Inside the mesh each
    device runs the unmodified single-chip program — reads are
    embarrassingly parallel, matching the reference's multi-GPU story
    (one f5c process per GPU; SURVEY §2.7) but within one program.
    """
    from ..ops.abea_ring import abea_align_device_ring

    sharded = P("data")
    repl = P()

    def run(ev_c, ev_o, ev_l, rk_c, rk_o, rk_l, lm, ls, ll, sc, sh,
            lst, lstp, lsk, ltr, boff):
        flat, start_e, n = abea_align_device_ring(
            ev_c[0], ev_o[0], ev_l[0], rk_c[0], rk_o[0], rk_l[0],
            lm, ls, ll, sc[0], sh[0], lst[0], lstp[0], lsk[0], ltr[0],
            boff[0], E=E, K=K, n_bands=n_bands, max_pairs=max_pairs,
            cap=cap, interpret=interpret)
        return flat[None], start_e[None], n[None]

    fn = _shard_map(
        run, mesh,
        in_specs=(sharded,) * 6 + (repl,) * 3 + (sharded,) * 7,
        out_specs=(sharded, sharded, sharded))
    return fn(ev_concat, ev_off, ev_len, rank_concat, rk_off, rk_len,
              level_mean, level_stdv, level_log_stdv, scale, shift,
              lp_stay, lp_step, lp_skip, lp_trim, byte_off)


@functools.partial(jax.jit, static_argnames=("mesh", "pad_events",
                                             "pad_k", "max_path"))
def shard_viterbi_rounds(mesh: Mesh, spec_i32, spec_f32, rank_pool,
                         ev_pool, level_mean, level_stdv, level_log_stdv,
                         pad_events: int, pad_k: int, max_path: int):
    """The PRODUCTION eventalign lockstep Viterbi round
    (ops/hmm.hmm_viterbi_rounds) with the chunk axis data-parallel over
    the mesh.  Specs carry a leading device axis; the per-batch
    rank/event pools and model tables are replicated (they are uploaded
    once per batch — SURVEY §2.7; ref src/eventalign.c:1267-1531)."""
    from ..ops.hmm import hmm_viterbi_rounds

    sharded = P("data")
    repl = P()

    def run(si, sf, rp, ep, lm, ls, ll):
        movs, n = hmm_viterbi_rounds(
            si[0], sf[0], rp, ep, lm, ls, ll, pad_events=pad_events,
            pad_k=pad_k, max_path=max_path)
        return movs[None], n[None]

    fn = _shard_map(
        run, mesh,
        in_specs=(sharded, sharded) + (repl,) * 5,
        out_specs=(sharded, sharded))
    return fn(spec_i32, spec_f32, rank_pool, ev_pool, level_mean,
              level_stdv, level_log_stdv)


@functools.partial(jax.jit, static_argnames=("mesh", "SEG", "interpret"))
def shard_hmm_forward(mesh: Mesh, ranks, n_km, ev_pool, ev_start, stride,
                      n_events, scale, shift, var, lp_stay, lp_step,
                      level_mean, level_stdv, level_log_stdv,
                      SEG: int, interpret: bool = False):
    """The PRODUCTION Pallas profile-HMM scorer (ops/hmm_pallas.py) with
    the work-item axis data-parallel over the mesh; model tables
    replicated.  Inputs carry a leading device axis like
    shard_align_ring."""
    from ..ops.hmm_pallas import hmm_forward_pallas

    sharded = P("data")
    repl = P()

    def run(rk, nk, pool, st, sd, nev, sc, sh, vr, lst, lstp, lm, ls, ll):
        s = hmm_forward_pallas(
            rk[0], nk[0], pool, st[0], sd[0], nev[0], sc[0], sh[0],
            vr[0], lst[0], lstp[0], lm, ls, ll, SEG=SEG,
            interpret=interpret)
        return s[None]

    fn = _shard_map(
        run, mesh,
        in_specs=(sharded, sharded, repl) + (sharded,) * 8 + (repl,) * 3,
        out_specs=sharded)
    return fn(ranks, n_km, ev_pool, ev_start, stride, n_events, scale,
              shift, var, lp_stay, lp_step, level_mean, level_stdv,
              level_log_stdv)


