"""eventalign: re-align events to the reference, segment by segment.

Port of the reference's mode-1 path (src/eventalign.c realign_read /
align_read_to_ref / profile_hmm_align / emitters).  The chunked
re-alignment is strictly sequential per read (each ~100-ref-base chunk
starts where the previous chunk's committed output ended,
eventalign.c:1370-1531), so the device batching runs all reads of the
batch in LOCKSTEP ROUNDS: every active read contributes its next chunk,
the chunks are scored as one batched Viterbi call on the TPU, and the
hosts advances each read's cursor from the decoded walk.

Emitters (TSV / SAM / PAF / m6anet / summary) mirror
src/eventalign.c:1574-2349 column for column.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from ..io.bam import CDEL, CDIFF, CEQUAL, CHARD_CLIP, CINS, CMATCH, \
    CREF_SKIP, CSOFT_CLIP

ALIGN_STRIDE = 100   # reference bases aligned per chunk (eventalign.c:1338)
OUTPUT_STRIDE = 50   # event alignments committed per chunk (:1339)

_COMP = np.zeros(256, dtype=np.uint8)
for a, b in zip(b"ACGT", b"TGCA"):
    _COMP[a] = b
_COMP[_COMP == 0] = ord("A")  # disambiguated input is pure ACGT


def revcomp_bytes(seq: bytes) -> bytes:
    arr = np.frombuffer(seq, dtype=np.uint8)
    return _COMP[arr[::-1]].tobytes()


def aligned_segments(cigar, pos: int):
    """(ref_pos, read_pos) pairs per segment, split on N ops
    (eventalign.c:1121-1188, read_stride=1). Vectorised."""
    segs = []
    ref_starts, read_starts, lens = [], [], []
    read_pos, ref_pos = 0, pos

    def flush():
        if not lens:
            return
        total = int(np.sum(lens))
        rp = np.empty(total, dtype=np.int64)
        qp = np.empty(total, dtype=np.int64)
        o = 0
        for rs, qs, ln in zip(ref_starts, read_starts, lens):
            rp[o:o + ln] = np.arange(rs, rs + ln)
            qp[o:o + ln] = np.arange(qs, qs + ln)
            o += ln
        segs.append(np.stack([rp, qp], axis=1))
        ref_starts.clear()
        read_starts.clear()
        lens.clear()

    for op, ln in cigar:
        if op in (CMATCH, CEQUAL, CDIFF):
            ref_starts.append(ref_pos)
            read_starts.append(read_pos)
            lens.append(ln)
            read_pos += ln
            ref_pos += ln
        elif op == CDEL:
            ref_pos += ln
        elif op == CREF_SKIP:
            flush()
            segs.append(None)  # segment boundary marker
            ref_pos += ln
        elif op in (CINS, CSOFT_CLIP):
            read_pos += ln
        elif op == CHARD_CLIP:
            pass
    flush()
    # merge: the reference starts a NEW segment at each N; empty segments
    # between consecutive Ns collapse away
    out = []
    for s in segs:
        if s is not None:
            out.append(s)
    return out if out else []


class ClosestEvent:
    """O(1) closest-event lookup with the reference's quirky scan bounds
    (eventalign.c:971-996 / meth.c:100-125)."""

    def __init__(self, b2e_start: np.ndarray):
        b2e = np.asarray(b2e_start, dtype=np.int64)
        n = b2e.shape[0]
        idx = np.arange(n)
        filled = b2e != -1
        back = np.where(filled, idx, -1)
        np.maximum.accumulate(back, out=back)
        fwd = np.where(filled, idx, n + 10)
        fwd = np.minimum.accumulate(fwd[::-1])[::-1]
        self.b2e = b2e
        self.back = back
        self.fwd = fwd
        self.n = n

    def __call__(self, k_idx: int) -> int:
        k = int(k_idx)
        n = self.n
        # down-scan checks j in [max(0, k-1000)+?..k]; index stop is
        # exclusive, so j == stop is never checked
        before = -1
        if k >= 1:
            b = self.back[k]
            stop = max(0, k - 1000)
            if b > stop:
                before = int(self.b2e[b])
        if before != -1:
            return before
        stop_after = min(k + 1000, n - 1)
        f = self.fwd[k] if k < n else n + 10
        if f < stop_after:
            return int(self.b2e[f])
        return -1


@dataclass
class EventAlignmentRecords:
    """Per-read alignment output: parallel arrays (forward order)."""

    ref_position: np.ndarray   # i64
    event_idx: np.ndarray      # i64
    state: np.ndarray          # u8: 0=K (never stored), 1=B, 2=M
    rc: bool = False
    ref_disamb: bytes = b""    # disambiguated reference segment
    ref_offset: int = 0


@dataclass
class _ReadState:
    read: object                # ReadRecord
    ref_disamb: bytes = b""
    ref_offset: int = 0
    fwd_ranks: np.ndarray = None
    rc_ranks: np.ndarray = None
    ev_off: int = 0             # offsets into the device-resident pools
    fwd_off: int = 0
    rc_off: int = 0
    segments: list = field(default_factory=list)
    seg_idx: int = 0
    pairs: np.ndarray = None    # current segment pairs
    closest: ClosestEvent = None
    # cursor within the current segment
    curr_start_event: int = 0
    curr_start_ref: int = 0
    curr_pair_idx: int = 0
    last_event: int = 0
    forward: bool = True
    done: bool = False
    out_ref: list = field(default_factory=list)
    out_ev: list = field(default_factory=list)
    out_st: list = field(default_factory=list)

    def start_segment(self, k: int) -> bool:
        """Initialise the cursor for the next segment; False if none left
        or the segment is unusable (reference returns early)."""
        while self.seg_idx < len(self.segments):
            pairs = self.segments[self.seg_idx]
            self.seg_idx += 1
            r = self.read
            # trim to max kmer index (eventalign.c:956-966)
            max_kmer_idx = len(r.seq) - k
            hi = pairs.shape[0]
            while hi > 0 and pairs[hi - 1, 1] > max_kmer_idx:
                hi -= 1
            pairs = pairs[:hi]
            if pairs.shape[0] == 0:
                self.done = True     # reference returns alignment_output
                return False
            rl = len(r.seq)
            ks = int(pairs[0, 1])
            ke = int(pairs[-1, 1])
            if r.is_reverse:
                ks = rl - ks - k
                ke = rl - ke - k
            first_event = self.closest(ks)
            last_event = self.closest(ke)
            self.pairs = pairs
            self.forward = first_event < last_event
            self.curr_start_event = first_event
            self.curr_start_ref = int(pairs[0, 0])
            self.curr_pair_idx = 0
            self.last_event = last_event
            return True
        self.done = True
        return False


def _get_end_pair(ref_pos: np.ndarray, ref_pos_max: int,
                  pair_idx: int) -> int:
    """First index after pair_idx whose ref exceeds max, minus one
    (eventalign.c:928-938)."""
    j = int(np.searchsorted(ref_pos[pair_idx:], ref_pos_max + 1) + pair_idx)
    if j >= ref_pos.shape[0]:
        return ref_pos.shape[0] - 1
    return j - 1


def _dist_marker() -> str:
    """Shared --dist merge-marker prefix (parallel/distributed.MARKER);
    writers and the k-way part merge must agree on the literal."""
    from ..parallel.distributed import MARKER
    return MARKER


_PROBE = {}


def measured_dispatch_overhead() -> float:
    """Seconds for one tiny jitted dispatch + D2H sync on the default
    device, measured once per process (median of 3 warm calls).

    On this box the axon tunnel costs ~50-80 ms per synchronous round
    trip; a PCIe/ICI-attached chip is ~0.2-1 ms.  The sync goes through
    ``np.asarray`` because ``block_until_ready`` can return at enqueue
    time on the axon backend."""
    if "dispatch" not in _PROBE:
        import time

        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8,), jnp.float32)
        np.asarray(f(x))                     # compile, first-use costs
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        _PROBE["dispatch"] = sorted(ts)[1]
    return _PROBE["dispatch"]


def measured_host_chunk_secs(model) -> float:
    """Seconds for one typical eventalign chunk DP on the host
    (native.viterbi_chunk on a synthetic ~ALIGN_STRIDE-base window),
    measured once per process."""
    if "host_chunk" not in _PROBE:
        import time

        from .. import native

        nk = ALIGN_STRIDE - model.k + 1
        ne = int(nk * 1.8)
        rng = np.random.default_rng(0)
        rk = rng.integers(0, model.level_mean.shape[0], nk
                          ).astype(np.int32)
        ev = (model.level_mean[rk[np.clip(
            np.linspace(0, nk, ne, endpoint=False).astype(int),
            0, nk - 1)]] + rng.normal(0, 2, ne)).astype(np.float32)
        args = (rk, 0, 1, nk, ev, 0, 1, ne, 1.0, 0.0, 1.0, ne / nk,
                model.level_mean, model.level_stdv, model.level_log_stdv)
        native.viterbi_chunk(*args)          # warm (page-in, caches)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            native.viterbi_chunk(*args)
            ts.append(time.perf_counter() - t0)
        _PROBE["host_chunk"] = sorted(ts)[1]
    return _PROBE["host_chunk"]


class EventalignEngine:
    """Lockstep batched re-alignment over a batch of reads.

    Engine selection (VERDICT r2 item 3 — measured, not hard-coded):
    ``F5C_TPU_EA_ENGINE`` = ``auto`` (default) | ``native`` (whole-read
    host C++ loop) | ``device`` (lockstep rounds, device Viterbi) |
    ``python`` (lockstep with per-round host/device split).  ``auto``
    probes the device dispatch latency and the host per-chunk DP cost
    at first use: device rounds win when a full round of chunks costs
    the host more than a device round trip."""

    def __init__(self, model, region_start: int = -1, region_end: int = -1):
        import os

        self.model = model
        self.k = model.k
        self.region_start = region_start
        self.region_end = region_end
        import jax.numpy as jnp

        from .. import native

        self._tables = (jnp.asarray(model.level_mean),
                        jnp.asarray(model.level_stdv),
                        jnp.asarray(model.level_log_stdv))
        self.engine = os.environ.get("F5C_TPU_EA_ENGINE", "auto")
        # rounds at or below this size run host-side (native); device
        # dispatch latency dwarfs small-round compute
        env_max = os.environ.get("F5C_TPU_VIT_HOST_MAX")
        if env_max is not None:
            self.host_round_max = int(env_max)
        elif not native.available():
            self.host_round_max = 0
        else:
            self.host_round_max = None       # probed lazily in realign_batch

    @staticmethod
    def _mesh_devices():
        """Local-device mesh gate, mirroring Pipeline._mesh_devices
        (multi-process --dist runs own their read shards, so meshes
        never span non-addressable devices)."""
        import os as _os

        import jax

        if _os.environ.get("F5C_TPU_MESH", "1") == "0":
            return []
        devs = jax.local_devices()
        return devs if len(devs) > 1 else []

    def _probed_round_max(self) -> int:
        """Crossover round size: a device round pays ~2 synchronous
        trips (spec upload + movement download); below
        overhead/host_chunk items the host finishes first."""
        overhead = 2.0 * measured_dispatch_overhead()
        per_chunk = measured_host_chunk_secs(self.model)
        return max(16, min(100_000, int(overhead / max(per_chunk, 1e-7))))

    def _run_round_host(self, items):
        from .. import native
        from ..ops.hmm import decode_viterbi_movements

        m = self.model
        for st, spec in items:
            r = st.read
            sc = r.scaling
            if spec["rank_stride"] == 1:
                rk = st.fwd_ranks
                local_start = spec["rank_start"] - st.fwd_off
            else:
                rk = st.rc_ranks
                local_start = spec["rank_start"] - st.rc_off
            mv = native.viterbi_chunk(
                rk, local_start, spec["rank_stride"], spec["n_kmers"],
                r.event_means, spec["e_start"], spec["stride"],
                spec["n_events"], sc.scale, sc.shift, sc.var,
                r.events_per_base, m.level_mean, m.level_stdv,
                m.level_log_stdv)
            ev_idx, k_idx, ps = decode_viterbi_movements(
                mv, mv.shape[0], spec["e_start"], spec["stride"],
                spec["n_events"], spec["n_kmers"])
            self._commit_chunk(st, spec, ev_idx, k_idx, ps)

    def realign_batch(self, reads, ref_segments):
        """reads: ReadRecords that passed ABEA+QC; ref_segments: matching
        list of reference segment strings ([record.pos, ref_end)).
        Returns {id(read): EventAlignmentRecords}."""
        import jax.numpy as jnp

        from .. import native

        k = self.k
        states = []
        rank_parts = []
        ev_parts = []
        rank_off = 0
        ev_off = 0
        for r, ref_seq in zip(reads, ref_segments):
            st = _ReadState(read=r)
            dis = native.disambiguate(ref_seq.upper().encode())
            st.ref_disamb = dis
            st.ref_offset = r.pos
            st.fwd_ranks = native.kmer_ranks(dis, k)
            st.rc_ranks = native.kmer_ranks(revcomp_bytes(dis), k)
            st.fwd_off = rank_off
            rank_parts.append(st.fwd_ranks)
            rank_off += st.fwd_ranks.shape[0]
            st.rc_off = rank_off
            rank_parts.append(st.rc_ranks)
            rank_off += st.rc_ranks.shape[0]
            st.ev_off = ev_off
            ev_parts.append(r.event_means)
            ev_off += r.event_means.shape[0]
            segs = aligned_segments(r.cigar, r.pos)
            if self.region_start != -1 and self.region_end != -1:
                segs = [s[(s[:, 0] >= self.region_start)
                          & (s[:, 0] <= self.region_end)] for s in segs]
            st.segments = segs
            st.closest = ClosestEvent(r.b2e_start)
            if not st.start_segment(k):
                st.done = True
            states.append(st)
        engine = self.engine
        if self.host_round_max is None:
            if engine in ("auto", "python"):
                # only these engines consult the host/device crossover,
                # so only they pay the device dispatch-latency probe
                # (an explicit engine=native must not touch the device)
                self.host_round_max = self._probed_round_max()
            else:
                # native: never reaches rounds; device: every round
                # must actually run on the device (engine semantics)
                self.host_round_max = 0
        if engine == "auto":
            # a lockstep round scores ~len(reads) chunks in one device
            # trip; the device engine wins when the host would spend
            # longer than that trip on the same chunks.  An explicit
            # host_round_max=0 (tests, env) keeps forcing the lockstep
            # device path.
            if (self.host_round_max > 0 and native.available()
                    and len(reads) * measured_host_chunk_secs(self.model)
                    < 2.0 * measured_dispatch_overhead()):
                engine = "native"
            else:
                engine = "device"
        if engine == "native" and not native.available():
            engine = "python"
        if engine == "native":
            # whole-read native loop: the chunk chain is strictly
            # sequential per read, and on the tunnelled chip the host
            # C++ path beats device rounds; one call per read removes
            # ~200us/chunk of Python+ctypes overhead (f5c_realign_read).
            # Reads are independent and the DP releases the GIL, so a
            # thread pool scales the loop with host cores (the role of
            # the reference's work-stealing pool, src/f5c.c:574-679)
            import os as _os

            m = self.model

            def _one(st):
                r = st.read
                sc = r.scaling
                rr, ev, ps = native.realign_read(
                    st.fwd_ranks, st.rc_ranks, len(st.ref_disamb),
                    st.ref_offset, k, len(r.seq), r.is_reverse,
                    r.event_means, r.b2e_start, st.segments,
                    sc.scale, sc.shift, sc.var, r.events_per_base,
                    m.level_mean, m.level_stdv, m.level_log_stdv)
                return id(r), EventAlignmentRecords(
                    ref_position=rr, event_idx=ev, state=ps,
                    rc=bool(r.is_reverse), ref_disamb=st.ref_disamb,
                    ref_offset=st.ref_offset)

            n_workers = int(_os.environ.get("F5C_TPU_POST_THREADS",
                                            _os.cpu_count() or 1))
            if n_workers > 1 and len(states) > 3:
                pool = getattr(self, "_realign_pool", None)
                if pool is None:
                    from concurrent.futures import ThreadPoolExecutor
                    pool = self._realign_pool = ThreadPoolExecutor(
                        max_workers=min(n_workers, 8))
                return dict(pool.map(_one, states))
            return dict(_one(st) for st in states)

        if rank_parts:
            # pools uploaded once per batch; rounds only ship tiny specs
            self._rank_pool = jnp.asarray(np.ascontiguousarray(
                np.concatenate(rank_parts), dtype=np.int32))
            self._ev_pool = jnp.asarray(np.ascontiguousarray(
                np.concatenate(ev_parts), dtype=np.float32))
            mesh_devs = self._mesh_devices()
            if mesh_devs:
                from ..parallel.mesh import record_dispatch

                record_dispatch(
                    "viterbi_pools", 0,
                    int(np.asarray(self._rank_pool).nbytes)
                    + int(np.asarray(self._ev_pool).nbytes)
                    + sum(int(np.asarray(t).nbytes)
                          for t in self._tables),
                    len(mesh_devs))

        active = [st for st in states if not st.done]
        while active:
            self._run_round(active)
            next_active = []
            for st in active:
                if st.done and st.seg_idx < len(st.segments):
                    st.done = False
                    if st.start_segment(self.k):
                        next_active.append(st)
                elif not st.done:
                    next_active.append(st)
            active = next_active

        out = {}
        for st in states:
            r = st.read
            if st.out_ref:
                out[id(r)] = EventAlignmentRecords(
                    ref_position=np.concatenate(st.out_ref),
                    event_idx=np.concatenate(st.out_ev),
                    state=np.concatenate(st.out_st),
                    rc=bool(r.is_reverse), ref_disamb=st.ref_disamb,
                    ref_offset=st.ref_offset)
            else:
                out[id(r)] = EventAlignmentRecords(
                    ref_position=np.zeros(0, np.int64),
                    event_idx=np.zeros(0, np.int64),
                    state=np.zeros(0, np.uint8), rc=bool(r.is_reverse),
                    ref_disamb=st.ref_disamb, ref_offset=st.ref_offset)
        return out

    # -- one lockstep round: one chunk per active read --------------------
    def _run_round(self, active):
        import jax.numpy as jnp

        from ..ops.hmm import (decode_viterbi_movements, hmm_viterbi_rounds,
                               unpack_movements)

        items = []          # (state, spec...) per chunk
        for st in active:
            spec = self._next_chunk(st)
            if spec is None:
                st.done = True
                continue
            items.append((st, spec))
        if not items:
            return

        n_items = len(items)
        if n_items <= self.host_round_max:
            # tunnel dispatch latency exceeds the compute for small
            # rounds: run the chunk DPs on the host (bit-exact reference
            # port, native.viterbi_chunk)
            self._run_round_host(items)
            return
        max_nk = max(s[1]["n_kmers"] for s in items)
        max_ne = max(s[1]["n_events"] for s in items)
        pad_k = _bucket(max_nk, 128)
        pad_e = _bucket(max_ne, 256)
        max_path = pad_e + pad_k
        n_pad = _bucket(n_items, 32)
        mesh_devs = self._mesh_devices()
        if mesh_devs:
            nd = len(mesh_devs)
            n_pad = -(-n_pad // nd) * nd
        spec_i32 = np.zeros((n_pad, 6), np.int32)
        spec_f32 = np.zeros((n_pad, 5), np.float32)
        spec_f32[:, 0] = 1.0   # scale
        spec_f32[:, 2] = 1.0   # var
        spec_i32[:, 1] = 1     # rank_stride
        spec_i32[:, 4] = 1     # ev_stride
        for i, (st, spec) in enumerate(items):
            r = st.read
            sc = r.scaling
            spec_i32[i] = (spec["rank_start"], spec["rank_stride"],
                           spec["n_kmers"],
                           st.ev_off + spec["e_start"], spec["stride"],
                           spec["n_events"])
            epb = r.events_per_base
            p_stay = 1.0 - 1.0 / epb
            spec_f32[i] = (sc.scale, sc.shift, sc.var, np.log(p_stay),
                           np.log(1.0 - p_stay - 0.0025 - 0.001))

        if mesh_devs:
            # data-parallel round: chunk axis sharded over the mesh,
            # pools + tables replicated (parallel/mesh.py; SURVEY §2.7)
            from ..parallel.mesh import (data_mesh, record_dispatch,
                                         shard_viterbi_rounds)

            if getattr(self, "_mesh", None) is None:
                self._mesh = data_mesh(mesh_devs)
            nd = len(mesh_devs)
            # pools/tables were uploaded once per batch (realign_batch)
            # and are counted there; a round ships only the two specs
            record_dispatch("viterbi_round",
                            spec_i32.nbytes + spec_f32.nbytes, 0, nd)
            movs, n_steps = shard_viterbi_rounds(
                self._mesh,
                jnp.asarray(spec_i32.reshape(nd, n_pad // nd, 6)),
                jnp.asarray(spec_f32.reshape(nd, n_pad // nd, 5)),
                self._rank_pool, self._ev_pool, *self._tables,
                pad_events=pad_e, pad_k=pad_k, max_path=max_path)
            movs = np.asarray(movs).reshape(n_pad, -1)
            n_steps = np.asarray(n_steps).reshape(n_pad)
        else:
            movs, n_steps = hmm_viterbi_rounds(
                jnp.asarray(spec_i32), jnp.asarray(spec_f32),
                self._rank_pool, self._ev_pool, *self._tables,
                pad_events=pad_e, pad_k=pad_k, max_path=max_path)
            movs = np.asarray(movs)
            n_steps = np.asarray(n_steps)

        for i, (st, spec) in enumerate(items):
            mv = unpack_movements(movs[i], int(n_steps[i]))
            ev_idx, k_idx, ps = decode_viterbi_movements(
                mv, int(n_steps[i]), spec["e_start"], spec["stride"],
                spec["n_events"], spec["n_kmers"])
            self._commit_chunk(st, spec, ev_idx, k_idx, ps)

    def _next_chunk(self, st: _ReadState):
        """Chunk spec for the read's cursor (eventalign.c:1370-1422), or
        None when this segment is finished."""
        k = self.k
        fwd = st.forward
        if not ((fwd and st.curr_start_event < st.last_event)
                or (not fwd and st.curr_start_event > st.last_event)):
            return None
        pairs = st.pairs
        ref_pos = pairs[:, 0]
        end_pair_idx = _get_end_pair(ref_pos, st.curr_start_ref
                                     + ALIGN_STRIDE, st.curr_pair_idx)
        curr_end_ref = int(pairs[end_pair_idx, 0])
        curr_end_read = int(pairs[end_pair_idx, 1])
        r = st.read
        if r.is_reverse:
            curr_end_read = len(r.seq) - curr_end_read - k
        s = st.curr_start_ref - st.ref_offset
        l = curr_end_ref - st.curr_start_ref + 1
        if l < 2 * k:
            return None
        e_stop = st.closest(curr_end_read)
        if abs(st.curr_start_event - e_stop) < 2:
            return None
        stride = 1 if st.curr_start_event < e_stop else -1
        # window kmer ranks: forward slice, or the rc pool walked backwards
        # (rank[ki] = rc_full[L - s - k - ki], hmm.c:384-401)
        L = len(st.ref_disamb)
        if not r.is_reverse:
            rank_start = st.fwd_off + s
            rank_stride = 1
        else:
            rank_start = st.rc_off + (L - s - k)
            rank_stride = -1
        return dict(rank_start=rank_start, rank_stride=rank_stride,
                    n_kmers=l - k + 1,
                    e_start=st.curr_start_event, n_events=abs(
                        st.curr_start_event - e_stop) + 1,
                    stride=stride, seg_start_ref=st.curr_start_ref,
                    end_pair_idx=end_pair_idx, win_s=s, win_l=l)

    def _commit_chunk(self, st: _ReadState, spec, ev_idx, k_idx, ps):
        """Emit records capped at OUTPUT_STRIDE and advance the cursor
        (eventalign.c:1424-1521)."""
        last_section = spec["end_pair_idx"] == st.pairs.shape[0] - 1
        emit = (ps != 0) & (ev_idx != spec["e_start"])
        if not last_section:
            cum = np.cumsum(emit)
            emit = emit & (cum <= OUTPUT_STRIDE)
        idx = np.nonzero(emit)[0]
        if idx.shape[0] == 0:
            st.done = True
            return
        ref_positions = spec["seg_start_ref"] + k_idx[idx]
        st.out_ref.append(ref_positions.astype(np.int64))
        st.out_ev.append(ev_idx[idx].astype(np.int64))
        st.out_st.append(ps[idx].astype(np.uint8))
        last_event_output = int(ev_idx[idx[-1]])
        last_ref_kmer_output = int(ref_positions[-1])
        st.curr_start_event = last_event_output
        st.curr_start_ref = last_ref_kmer_output
        st.curr_pair_idx = _get_end_pair(st.pairs[:, 0], st.curr_start_ref,
                                         st.curr_pair_idx)


def _bucket(n: int, minimum: int) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


# --------------------------------------------------------------------------
# Emitters (eventalign.c:1574-2349)
# --------------------------------------------------------------------------

def tsv_header(print_read_names=False, write_samples=False,
               write_signal_index=False) -> str:
    cols = ["contig", "position", "reference_kmer",
            "read_name" if print_read_names else "read_index", "strand",
            "event_index", "event_level_mean", "event_stdv", "event_length",
            "model_kmer", "model_mean", "model_stdv", "standardized_level"]
    if write_signal_index:
        cols += ["start_idx", "end_idx"]
    if write_samples:
        cols += ["samples"]
    return "\t".join(cols) + "\n"


def m6anet_header(print_read_names=False, write_signal_index=False) -> str:
    cols = ["contig", "position", "reference_kmer",
            "read_name" if print_read_names else "read_index",
            "event_level_mean", "event_stdv", "event_length"]
    out = "\t".join(cols) + "\t"
    if write_signal_index:
        out += "\tstart_idx\tend_idx"
    return out + "\n"


def summary_header() -> str:
    return ("read_index\tread_name\tfast5_path\tmodel_name\tstrand\t"
            "num_events\tnum_steps\tnum_skips\tnum_stays\ttotal_duration\t"
            "shift\tscale\tdrift\tvar\n")


def _kmers_for_records(recs: EventAlignmentRecords, ref_disamb: bytes,
                       ref_offset: int, k: int):
    """(ref_kmer, model_kmer) strings per record."""
    ref_kmers = []
    model_kmers = []
    n_kmer = "N" * k
    for i in range(recs.ref_position.shape[0]):
        p = int(recs.ref_position[i]) - ref_offset
        rk = ref_disamb[p : p + k].decode()
        ref_kmers.append(rk)
        if recs.state[i] == 1:   # 'B'
            model_kmers.append(n_kmer)
        elif recs.rc:
            model_kmers.append(revcomp_bytes(rk.encode()).decode())
        else:
            model_kmers.append(rk)
    return ref_kmers, model_kmers


def summarize_alignment(recs: EventAlignmentRecords, read, nm: int) -> dict:
    """EventalignSummary (eventalign.c:1574-1636)."""
    n = recs.ref_position.shape[0]
    s = dict(num_events=int(n), num_steps=0, num_skips=0, num_stays=0,
             sum_duration=0.0, alignment_edit_distance=int(nm),
             reference_span=0)
    if n == 0:
        return s
    moves = np.diff(recs.ref_position)
    s["num_stays"] = int(np.sum(moves == 0))
    s["num_steps"] = int(np.sum(moves == 1))
    s["num_skips"] = int(np.sum(moves > 1))
    s["sum_duration"] = float(
        np.sum(read.event_lengths[recs.event_idx]))
    s["reference_span"] = int(recs.ref_position[-1]
                              - recs.ref_position[0] + 1)
    return s


def summary_line(read_idx, qname, signal_path, rna, summary, sample_rate,
                 scalings) -> str:
    return (f"{read_idx}\t{qname}\t{signal_path}\t"
            f"{'rna' if rna else 'dna'}\ttemplate\t"
            f"{summary['num_events']}\t{summary['num_steps']}\t"
            f"{summary['num_skips']}\t{summary['num_stays']}\t"
            f"{summary['sum_duration']/sample_rate:.2f}\t"
            f"{scalings.shift:.3f}\t{scalings.scale:.3f}\t0.000\t"
            f"{scalings.var:.3f}\n")


def emit_tsv(recs: EventAlignmentRecords, read, model, contig: str,
             ref_disamb: bytes, ref_offset: int, read_idx: int,
             print_read_names=False, scale_events=False,
             write_samples=False, write_signal_index=False,
             collapse=False, as_bytes=False):
    """eventalign.c:2038-2176."""
    from .. import native

    k = model.k
    sample_rate = read.sample_rate
    if native.available():
        raw = None
        if (collapse or write_samples) and read.raw_pa is not None:
            raw = np.ascontiguousarray(read.raw_pa, dtype=np.float32)
        sc = read.scaling
        return native.emit_eventalign_tsv(
            recs.ref_position, recs.event_idx, recs.state, recs.rc,
            read.event_starts, read.event_lengths, read.event_means,
            read.event_stdvs, raw, ref_disamb, ref_offset, contig,
            read.qname if print_read_names else str(read_idx), k,
            model.level_mean, model.level_stdv, sc.scale, sc.shift,
            sc.var, sample_rate, scale_events, write_signal_index,
            collapse, write_samples, as_bytes=as_bytes)
    ref_kmers, model_kmers = _kmers_for_records(recs, ref_disamb,
                                                ref_offset, k)
    ev_means = read.event_means
    ev_stdvs = read.event_stdvs
    ev_lens = read.event_lengths
    ev_starts = read.event_starts
    sc = read.scaling
    sqrt_var = np.sqrt(np.float32(sc.var))
    out = []
    n = recs.ref_position.shape[0]
    name_field = read.qname if print_read_names else str(read_idx)
    i = 0
    while i < n:
        e_i = int(recs.event_idx[i])
        ref_pos = int(recs.ref_position[i])
        event_mean = float(ev_means[e_i])
        event_stdv = float(ev_stdvs[e_i])
        event_duration = float(ev_lens[e_i]) / sample_rate
        start_idx = int(ev_starts[e_i])
        end_idx = start_idx + int(ev_lens[e_i])
        n_collapse = 1
        if collapse:
            while (i + n_collapse < n
                   and ref_pos == recs.ref_position[i + n_collapse]):
                n_collapse += 1
            if n_collapse > 1:
                e_j = int(recs.event_idx[i + n_collapse - 1])
                s2 = int(ev_starts[e_j])
                e2 = s2 + int(ev_lens[e_j])
                start_idx = min(start_idx, s2)
                end_idx = max(end_idx, e2)
                raw = read.raw_pa[start_idx:end_idx]
                event_mean = float(raw.mean())
                event_stdv = float(raw.std())
                event_duration = (end_idx - start_idx) / sample_rate
        mk = model_kmers[i]
        rank = model.kmer_ranks(mk)[0] if recs.state[i] != 1 else 0
        model_mean = 0.0
        model_stdv = 0.0
        if scale_events:
            event_mean = (event_mean - sc.shift) / sc.scale
            if recs.state[i] != 1:
                model_mean = float(model.level_mean[rank])
                model_stdv = float(model.level_stdv[rank])
        else:
            if recs.state[i] != 1:
                model_mean = float(np.float32(sc.scale)
                                   * model.level_mean[rank]
                                   + np.float32(sc.shift))
                model_stdv = float(model.level_stdv[rank]
                                   * np.float32(sc.var))
        if model_stdv != 0.0:
            standard_level = (event_mean - model_mean) / (
                float(sqrt_var) * model_stdv)
        else:
            standard_level = (np.inf if event_mean > model_mean
                              else -np.inf) if event_mean != model_mean \
                else np.nan
            standard_level = 0.0 if np.isnan(standard_level) else (
                standard_level)
        row = (f"{contig}\t{ref_pos}\t{ref_kmers[i]}\t{name_field}\tt\t"
               f"{e_i}\t{event_mean:.2f}\t{event_stdv:.3f}\t"
               f"{event_duration:.5f}\t{mk}\t{model_mean:.2f}\t"
               f"{model_stdv:.2f}\t{standard_level:.2f}")
        if write_signal_index:
            row += f"\t{start_idx}\t{end_idx}"
        if write_samples:
            raw = read.raw_pa[start_idx:end_idx]
            scaled = (raw - np.float32(sc.shift)) / np.float32(sc.scale)
            row += "\t" + ",".join(f"{v:g}" for v in scaled)
        out.append(row + "\n")
        i += n_collapse
    return "".join(out)


def emit_m6anet_tsv(recs: EventAlignmentRecords, read, model, contig: str,
                    ref_disamb: bytes, ref_offset: int, read_idx: int,
                    print_read_names=False, write_signal_index=False) -> str:
    """eventalign.c:2186-2302 (collapse per ref position, scaled means)."""
    k = model.k
    sample_rate = read.sample_rate
    ref_kmers, model_kmers = _kmers_for_records(recs, ref_disamb,
                                                ref_offset, k)
    ev_means = read.event_means
    ev_stdvs = read.event_stdvs
    ev_lens = read.event_lengths
    ev_starts = read.event_starts
    sc = read.scaling
    out = []
    n = recs.ref_position.shape[0]
    name_field = read.qname if print_read_names else str(read_idx)
    i = 0
    while i < n:
        ref_pos = int(recs.ref_position[i])
        length = 0.0
        event_mean = 0.0
        event_stdv = 0.0
        event_duration = 0.0
        n_collapse = 0
        while (i + n_collapse < n
               and ref_pos == recs.ref_position[i + n_collapse]):
            j = i + n_collapse
            if ref_kmers[j] == model_kmers[j]:
                e_j = int(recs.event_idx[j])
                len_curr = float(int(ev_lens[e_j]))
                length += len_curr
                event_mean += ((float(ev_means[e_j]) - sc.shift)
                               / sc.scale) * len_curr
                event_stdv += float(ev_stdvs[e_j]) * len_curr
                event_duration += (float(ev_lens[e_j]) / sample_rate
                                   ) * len_curr
            n_collapse += 1
        if length > 0:
            event_mean /= length
            event_stdv /= length
            event_duration /= length
        row = (f"{contig}\t{ref_pos}\t{ref_kmers[i]}\t{name_field}\t"
               f"{event_mean:.2f}\t{event_stdv:.3f}\t{event_duration:.5f}\t")
        if write_signal_index:
            e_i = int(recs.event_idx[i])
            start_idx = int(ev_starts[e_i])
            end_idx = start_idx + int(ev_lens[e_i])
            if n_collapse > 1:
                e_j = int(recs.event_idx[i + n_collapse - 1])
                s2 = int(ev_starts[e_j])
                e2 = s2 + int(ev_lens[e_j])
                start_idx = min(start_idx, s2)
                end_idx = max(end_idx, e2)
            row += f"\t{start_idx}\t{end_idx}"
        out.append(row + "\n")
        i += n_collapse
    return "".join(out)


def get_f5c_ss(recs: EventAlignmentRecords, read, rna: bool):
    """Run-length signal alignment string + block coords
    (eventalign.c:1677-1823).  Returns dict or None when empty."""
    n = recs.ref_position.shape[0]
    if n == 0:
        return None
    strand = "-" if recs.rc else "+"
    if (not rna and strand == "-") or (rna and strand == "+"):
        order = np.arange(n - 1, -1, -1)
    else:
        order = np.arange(n)
    ref_pos = recs.ref_position[order]
    ev_idx = recs.event_idx[order]
    ev_starts = read.event_starts
    ev_lens = read.event_lengths

    start_idx_sig = int(ev_starts[ev_idx[0]])
    end_idx_sig = int(ev_starts[ev_idx[-1]]) + int(ev_lens[ev_idx[-1]])
    dir_swap = 1 if ((not rna and strand == "+")
                     or (rna and strand == "-")) else 0
    start_idx_kmer = int(ref_pos[0] if dir_swap else ref_pos[-1])
    end_idx_kmer = int(ref_pos[-1] if dir_swap else ref_pos[0]) + 1
    n_kmer = end_idx_kmer - start_idx_kmer

    parts = []
    c_ref_pos = int(ref_pos[0])
    ci = start_idx_sig
    matches = 0
    i = 0
    while i < n:
        rp = int(ref_pos[i])
        start_idx = int(ev_starts[ev_idx[i]])
        end_idx = start_idx + int(ev_lens[ev_idx[i]])
        n_collapse = 1
        while i + n_collapse < n and rp == ref_pos[i + n_collapse]:
            n_collapse += 1
        if n_collapse > 1:
            j = i + n_collapse - 1
            s2 = int(ev_starts[ev_idx[j]])
            e2 = s2 + int(ev_lens[ev_idx[j]])
            start_idx = min(start_idx, s2)
            end_idx = max(end_idx, e2)
        d = abs(rp - c_ref_pos)
        if d > 0:
            parts.append(f"{d}D")
        mi = start_idx - ci
        ci += mi
        if mi:
            parts.append(f"{mi}I")
        mi = end_idx - start_idx
        ci += mi
        c_ref_pos = rp + 1 if dir_swap else rp - 1
        if mi:
            matches += 1
            parts.append(f"{mi},")
        i += n_collapse
    return dict(start_raw=start_idx_sig, end_raw=end_idx_sig,
                start_kmer=end_idx_kmer if rna else start_idx_kmer,
                end_kmer=start_idx_kmer if rna else end_idx_kmer,
                matches=matches, n_kmer=n_kmer, ss="".join(parts))


def emit_paf(recs: EventAlignmentRecords, read, contig: str, ref_len: int,
             k: int, rna: bool) -> str:
    """eventalign.c:2305-2349."""
    ss = get_f5c_ss(recs, read, rna)
    if ss is None:
        return ""
    strand = "-" if recs.rc else "+"
    len_raw_signal = int(read.nsample)
    n_kmer_total = ref_len - k + 1
    len_block = abs(ss["end_kmer"] - ss["start_kmer"])
    sc = read.scaling
    return (f"{read.qname}\t{len_raw_signal}\t{ss['start_raw']}\t"
            f"{ss['end_raw']}\t{strand}\t{contig}\t{n_kmer_total}\t"
            f"{ss['start_kmer']}\t{ss['end_kmer']}\t{ss['matches']}\t"
            f"{len_block}\t255\t"
            f"sc:f:{sc.scale:.2f}\tsh:f:{sc.shift:.2f}\tss:Z:{ss['ss']}\n")


def event_alignment_to_cigar(recs: EventAlignmentRecords):
    """eventalign.c:1825-1886: events-as-query CIGAR for SAM v1."""
    out = []
    if recs.event_idx[0] > 0:
        out.append((int(recs.event_idx[0]), "S"))
    out.append((1, "M"))
    prev_r = int(recs.ref_position[0])
    for i in range(1, recs.ref_position.shape[0]):
        r_idx = int(recs.ref_position[i])
        r_step = abs(r_idx - prev_r)
        if r_step == 1:
            op = (1, "M")
        elif r_step > 1:
            out.append((r_step - 1, "D"))
            op = (1, "M")
        else:
            op = (1, "I")
        if out[-1][1] == op[1]:
            out[-1] = (out[-1][0] + op[0], op[1])
        else:
            out.append(op)
        prev_r = r_idx
    return "".join(f"{ln}{op}" for ln, op in out)


def run_eventalign(pipe, args, out=sys.stdout):
    """CLI driver: batch loop + emission in BAM order (meth_main mode 1)."""
    import time as _time

    from .writer import AsyncWriter

    sam = getattr(args, "sam", False)
    paf = getattr(args, "paf", False)
    m6anet = getattr(args, "m6anet", False)
    print_rn = getattr(args, "print_read_names", False)
    scale_events = getattr(args, "scale_events", False)
    samples = getattr(args, "samples", False)
    signal_index = getattr(args, "signal_index", False)
    collapse = getattr(args, "collapse_events", False)
    rna = pipe.opt.rna
    summary_fp = None
    if getattr(args, "summary", None):
        summary_fp = open(args.summary, "w")
        summary_fp.write(summary_header())
    sink = AsyncWriter(out)   # post-processor thread (meth_main.c:610)
    if sam:
        sink.write(pipe.bam.header_text.rstrip("\n") + "\n")
    elif not paf and not m6anet:
        sink.write(tsv_header(print_rn, samples, signal_index))
    elif m6anet:
        sink.write(m6anet_header(print_rn, signal_index))

    engine = EventalignEngine(pipe.model, region_start=pipe.clip_start,
                              region_end=pipe.clip_end)
    keep_raw = samples or collapse
    use_waves = pipe.supports_waves()
    batches = (pipe.batches(load=False) if use_waves
               else pipe.batches_prefetched(keep_raw=keep_raw))
    for batch in batches:
        if use_waves:
            # wave-pipelined: realign wave N-1 on the host while the
            # device fills wave N's bands (the re-alignment loop is the
            # eventalign hot host stage, so this overlap is the whole
            # CPU/device concurrency story of meth_main.c:610-742 here)
            recs_map = {}

            def _wave_realign(ok_reads, _m=recs_map):
                if not ok_reads:
                    return
                t0 = _time.time()
                refs = [pipe._fetch_ref_segment(r) for r in ok_reads]
                _m.update(engine.realign_batch(ok_reads, refs))
                pipe.stage_time["hmm"] += _time.time() - t0

            pipe.align_batch_waved(batch, keep_raw=keep_raw,
                                   wave_done=_wave_realign)
            # reads deflected to the ultra path finish after the waves
            rest = [r for r in batch
                    if not r.status and r.b2e_start is not None
                    and id(r) not in recs_map]
            _wave_realign(rest)
        else:
            pipe.align_batch(batch)
            t0 = _time.time()
            ok = [r for r in batch
                  if not r.status and r.b2e_start is not None]
            refs = [pipe._fetch_ref_segment(r) for r in ok]
            recs_map = engine.realign_batch(ok, refs)
            pipe.stage_time["hmm"] += _time.time() - t0
        t0 = _time.time()
        for r in batch:
            if r.status:
                pipe._count_failure(r)
                continue
            pipe.counters["processed"] += 1
            recs = recs_map.get(id(r))
            if recs is None:
                continue
            contig = pipe.bam.references[r.tid]
            ref_len = pipe.bam.ref_lengths[r.tid]
            dist = pipe.opt.dist_markers
            if summary_fp is not None and recs.ref_position.shape[0] > 0:
                s = summarize_alignment(recs, r, r.nm)
                if dist:
                    summary_fp.write(f"{_dist_marker()}{r.read_idx}\n")
                summary_fp.write(summary_line(
                    r.read_idx, r.qname, r.signal_path, rna, s,
                    r.sample_rate, r.scaling))
            if recs.ref_position.shape[0] == 0:
                continue
            if dist:
                sink.write(f"{_dist_marker()}{r.read_idx}\n")
            if paf:
                sink.write(emit_paf(recs, r, contig, ref_len,
                                    pipe.model.k, rna))
            elif sam:
                sink.write(emit_sam(recs, r, contig, ref_len,
                                    getattr(args, "sam_out_version", 2),
                                    rna))
            elif m6anet:
                sink.write(emit_m6anet_tsv(
                    recs, r, pipe.model, contig, recs.ref_disamb,
                    recs.ref_offset, r.read_idx, print_rn, signal_index))
            else:
                # render on the AsyncWriter thread (write_lazy): the
                # native emitter releases the GIL, so on multi-core
                # hosts row rendering overlaps the next batch's realign
                # (the meth path's SoA render pattern;
                # src/eventalign.c:1574-2176)
                import functools as _ft

                sink.write_lazy(_ft.partial(
                    emit_tsv, recs, r, pipe.model, contig,
                    recs.ref_disamb, recs.ref_offset, r.read_idx,
                    print_rn, scale_events, samples, signal_index,
                    collapse, as_bytes=True))
        pipe.stage_time["output"] += _time.time() - t0
    t0 = _time.time()
    sink.close()
    pipe.stage_time["output"] += _time.time() - t0
    if summary_fp is not None:
        summary_fp.close()


def emit_sam(recs: EventAlignmentRecords, read, contig: str, ref_len: int,
             sam_out_version: int, rna: bool) -> str:
    """eventalign.c:1891-1994.  v1: events-as-CIGAR record + ES tag;
    v2: the base alignment + si/ss/sc/sh tags."""
    if recs.ref_position.shape[0] == 0:
        return ""
    sc = read.scaling
    if sam_out_version == 1:
        qname = read.qname + ".template"
        flag = 16 if recs.rc else 0
        pos = int(recs.ref_position[0]) + 1
        cigar = event_alignment_to_cigar(recs)
        stride = 1 if recs.event_idx[0] < recs.event_idx[-1] else -1
        return (f"{qname}\t{flag}\t{contig}\t{pos}\t{read.mapq}\t{cigar}\t"
                f"*\t0\t0\t*\t*\tES:i:{stride}\n")
    ss = get_f5c_ss(recs, read, rna)
    if ss is None:
        return ""
    cigar = "".join(f"{ln}{'MIDNSHP=X'[op]}" for op, ln in read.cigar)
    si = (f"{ss['start_raw']},{ss['end_raw']},"
          f"{ss['start_kmer']},{ss['end_kmer']}")
    # v2 re-emits the ORIGINAL record (qualities + aux tags) and appends
    # the signal tags, like the reference's sam_format1 + bam_aux append
    # (eventalign.c:1891-1994)
    qual = getattr(read, "qual", "*") or "*"
    aux = "".join(f"\t{t}" for t in getattr(read, "sam_aux", ()))
    return (f"{read.qname}\t{read.flag}\t{contig}\t{read.pos + 1}\t"
            f"{read.mapq}\t{cigar}\t*\t0\t0\t{read.seq}\t{qual}"
            f"{aux}\t"
            f"si:Z:{si}\tss:Z:{ss['ss']}\tsc:f:{sc.scale:.2f}\t"
            f"sh:f:{sc.shift:.2f}\n")
