"""Multi-chip streaming pipeline: the sharded DSP step in the app.

Gives the application a mesh mode (`--mesh CxT`): wideband blocks are
processed by parallel/sharded.py's shard_map step over a
(channel, time) device mesh, candidates from all time shards merge back
into the host decode loop of VDL2Pipeline, and output is identical to
the single-device path (tests/test_mesh_cli.py asserts this on the
bundled capture over a forced 8-device CPU mesh).

Cross-block bursts: within a block, time shards exchange a forward
halo sized for a whole burst, so any burst detected in a shard's fresh
region is sliced completely.  A burst that runs off the END of a block
(the last shard's forward pad is zeros) is deferred by the host
(pipeline.last_deferred_min) and the next block is fed with a raw
re-read of the affected tail ("prepend"), re-channelized with the
exact NCO phase (n0 is absolute), reproducing the single-device halo
semantics.  EOF flushes through the single-device demod on the raw
tail buffer — bit-identical samples, same host logic.
"""
from __future__ import annotations

import numpy as np

from ..constants import SPS, SYNC_THRESHOLD
from ..dsp.frontend import bandpass_channelize, to_planar
from ..parallel.mesh import make_mesh
from ..parallel.sharded import (BACK_HALO, ShardedState, init_sharded_state,
                                make_sharded_step)
from .pipeline import (DEFAULT_HALO, MAX_BURST_SYMS, VDL2Pipeline,
                       _launch_compacted_l2, _mag16)

# Forward halo: a whole max-length burst fits ahead of any detection
# point in a shard's fresh region.
FWD_HALO = MAX_BURST_SYMS * SPS + 16
# Margin (decimated samples) of context re-fed before a deferred burst:
# sync-metric lookback + detection margin.
_DEFER_MARGIN = BACK_HALO + 192


class MeshPipeline(VDL2Pipeline):
    """VDL2Pipeline whose per-block DSP runs sharded over a mesh."""

    def __init__(self, freqs, centerfreq, sample_rate, oversample,
                 mesh_shape=(1, 1), devices=None, **kw):
        super().__init__(freqs, centerfreq, sample_rate, oversample, **kw)
        cn, tn = mesh_shape
        if len(freqs) % cn != 0:
            raise ValueError(
                f"channel count {len(freqs)} not divisible by "
                f"channel shards {cn}")
        self.mesh = make_mesh(cn, tn, devices)
        self.Tn, self.Cn = tn, cn
        self.step = make_sharded_step(
            self.mesh, oversample=oversample, fwd_halo=FWD_HALO,
            threshold=SYNC_THRESHOLD, max_candidates=self.max_candidates,
            max_symbols=MAX_BURST_SYMS)
        self.state = init_sharded_state(self.mesh, len(freqs),
                                        self.taps.size)
        self._unit = tn * oversample        # block length divisibility
        self.global_raw = 0                 # absolute index of next input
        # rolling raw tail for deferred-burst re-reads + EOF flush
        self._tail_base_keep = (DEFAULT_HALO + _DEFER_MARGIN) * oversample \
            + self.taps.size
        self._tail_keep = self._tail_base_keep
        self._tail = np.zeros((2, 0), np.float32)
        self._prepend_from: int | None = None   # absolute raw index

    # ------------------------------------------------------------ feed
    def feed(self, iq: np.ndarray, eof: bool = False):
        iq = np.ascontiguousarray(iq, dtype=np.complex64)
        if self._residual.size:
            iq = np.concatenate([self._residual, iq])
            self._residual = np.zeros(0, np.complex64)
        planar = to_planar(iq)

        prepend = np.zeros((2, 0), np.float32)
        base_raw = self.global_raw
        override_state = False
        if self._prepend_from is not None:
            start = max(self._prepend_from,
                        self.global_raw - self._tail.shape[1])
            n_pre = self.global_raw - start
            if n_pre > 0 and n_pre + planar.shape[1] >= self._unit:
                prepend = self._tail[:, self._tail.shape[1] - n_pre:]
                base_raw = start
                override_state = True
                self._prepend_from = None
            # else: input too small to make a block; keep deferring

        block = np.concatenate([prepend, planar], axis=1)
        usable = (block.shape[1] // self._unit) * self._unit
        # each shard must at least cover the FIR carry exchange
        min_block = -(- self.Tn * (self.taps.size - 1 + self.oversample)
                      // self._unit) * self._unit
        if usable < min_block:
            self._residual = iq
            if override_state:
                self._prepend_from = base_raw     # retry with more input
            return self.finish() if eof else []
        # residual = the tail of the *input* not consumed this round
        consumed_fresh = max(0, usable - prepend.shape[1])
        self._residual = iq[consumed_fresh:]
        block = block[:, :usable]

        # advance global position by consumed fresh samples only
        self.global_raw += consumed_fresh
        self._push_tail(planar[:, :consumed_fresh])

        if block.shape[1] == 0:
            return self.finish() if eof else []

        state = self.state
        if override_state:
            state = self._rebase_state(base_raw)
        cands, pwr3, self.state = self.step(
            block, np.asarray(self.taps), self.dphi, state)
        if override_state:
            # carried n0 advanced from the overridden base; re-anchor it
            # to the true stream position for the next (normal) block.
            self.state = self._with_n0(self.state, self.global_raw)

        l2, l2_inv = self._launch_l2_flat(cands)   # dispatch pre-fetch
        override_info = None
        prepend_dec = 0
        Ml = block.shape[1] // self.Tn // self.oversample
        if override_state:
            prepend_dec = prepend.shape[1] // self.oversample
            override_info = (prepend_dec, Ml)
        # Double-buffered drain (see VDL2Pipeline.feed_planar): the
        # PREVIOUS block's candidates are fetched only now that this
        # block's sharded step is in flight.  A deferral discovered one
        # block late re-reads from the raw tail, which _push_tail sizes
        # to retain one extra block for exactly this case.
        frames = self._drain_pending()
        if self.use_device_gate and l2 is not None:
            # device-side merge + gate + NF (core/nf_gate.gate_nf_mesh);
            # the drain fetches verdicts + merged candidate fields
            # instead of the magnitude stream
            from . import nf_gate
            if self._gate_state is None:
                self._gate_state = nf_gate.init_state(len(self.freqs))
            base_dec = base_raw // self.oversample
            gout, merged, self._gate_state = nf_gate.gate_nf_mesh(
                cands.count, cands.det_idx, cands.sync_idx, cands.dphi,
                cands.pherr, cands.sym_valid, l2_inv, l2["hdr_ok"],
                l2["bits_consumed"], pwr3, np.int32(Ml),
                np.int32(prepend_dec), self._gate_delta(base_dec),
                self._gate_state, self._freqs_f32,
                np.float32(self.max_ppm))
            self._pending = ("gate", gout, merged, cands.count, l2,
                             base_dec)
        else:
            self._pending = (cands, l2, l2_inv, pwr3, base_raw,
                             override_info)
        if eof:
            frames.extend(self.finish())
        return frames

    def _drain_pending(self):
        if self._pending is None:
            return []
        if self._pending[0] == "gate":
            from ..utils.fetch import coalesced_get
            _, gout, merged, count_tc, l2, base_dec = self._pending
            self._pending = None
            gout_np, merged_np, count_np, l2_np = coalesced_get(
                (gout, merged, count_tc, l2))
            # host _merge_candidates bumps overflow per (shard, channel)
            # whose detections exceeded the K slots
            for t, c in zip(*np.nonzero(count_np > self.max_candidates)):
                self.channels[c].bump("demod.sync.overflow")
            fetched = (merged_np["count"], merged_np["det_idx"],
                       merged_np["sync_idx"], merged_np["dphi"],
                       merged_np["pherr"], merged_np["sym_valid"])
            frames = self._process_verdicts(
                gout_np, fetched, l2_np, merged_np["l2_row"], base_dec)
            if self.last_deferred_min is not None:
                self._prepend_from = max(
                    0, (self.last_deferred_min - _DEFER_MARGIN)
                    * self.oversample)
            return frames
        cands, l2, l2_inv, pwr3, base_raw, override_info = self._pending
        self._pending = None
        # one roundtrip: candidate fields + magnitudes + device-L2
        # results (sqrt + f16 cast run on device, see pipeline._mag16)
        merged, l2_map, (pwr3_np, l2_np, inv_np) = self._merge_candidates(
            cands, skip_big=l2 is not None,
            extra=(_mag16(pwr3), l2, l2_inv))
        if inv_np is not None:
            # compacted L2 batch: translate flat slot ids to batch rows
            # (-1 entries overflowed the cap; the candidate loop counts
            # them as demod.sync.overflow)
            l2_map = inv_np[l2_map]
        nf_base = base_raw // self.oversample
        if override_info is not None:
            # drop tracker entries that re-cover prepended samples: the
            # single-device tracker saw them already (stat parity)
            prepend_dec, Ml = override_info
            X = pwr3_np.shape[1] // self.Tn
            j = np.arange(pwr3_np.shape[1])
            s, jj = np.divmod(j, X)
            pwr3_np = pwr3_np[:, s * Ml + 3 * jj >= prepend_dec]
            nf_base += prepend_dec
        # columns ~ every-3rd fresh decimated sample from nf_base
        # (per-shard restarts misalign by <= 2 samples when Ml % 3 != 0)
        self._stash_noise_block(pwr3_np, nf_base)
        base_dec = base_raw // self.oversample
        frames = self._process_candidates(
            merged, base_dec, eof=False, l2=l2, l2_map=l2_map,
            fetched=self._candidate_fields(merged, l2), l2_np=l2_np)
        self._finish_noise_block()
        if self.last_deferred_min is not None:
            self._prepend_from = max(
                0, (self.last_deferred_min - _DEFER_MARGIN)
                * self.oversample)
        return frames

    # ----------------------------------------------------------- flush
    def finish(self):
        """EOF: run the single-device demod over the raw tail buffer.

        The band-pass channelizer is a pure function of (samples, n0),
        so re-channelizing the tail yields bit-identical decimated
        samples; candidates resolve with the same host logic as the
        single-device finish().
        """
        frames0 = self._drain_pending()
        if self._residual.size:
            extra = to_planar(self._residual)
            self._residual = np.zeros(0, np.complex64)
            self.global_raw += extra.shape[1]
            self._push_tail(extra)
        need = (DEFAULT_HALO + _DEFER_MARGIN) * self.oversample \
            + (self.taps.size - 1)
        if self._prepend_from is not None:
            # a deferral discovered while draining the in-flight block
            # can lie further back than the default window
            need = max(need, self.global_raw - self._prepend_from
                       + (self.taps.size - 1))
        take = min(self._tail.shape[1], need)
        if take < self.taps.size:
            return frames0
        tail = self._tail[:, self._tail.shape[1] - take:]
        start_raw = self.global_raw - take
        usable = (take // self.oversample) * self.oversample
        tail = tail[:, take - usable:]
        start_raw = self.global_raw - usable
        carry = np.zeros((2, self.taps.size - 1), np.float32)
        dec, _ = bandpass_channelize(
            tail, np.asarray(self.taps), self.dphi,
            np.uint32(start_raw & 0xFFFFFF), carry, self.oversample)
        # first taps-worth of outputs used a zero carry: junk, but they
        # precede every unprocessed detection (margin covers them).
        cands = self._demod_fn(np.asarray(dec), SYNC_THRESHOLD,
                               self.max_candidates, MAX_BURST_SYMS)
        l2, l2_map = self._launch_l2(cands)
        from ..utils.fetch import coalesced_get
        start_dec = start_raw // self.oversample
        if self.use_device_gate and l2 is not None:
            from . import nf_gate
            if self._gate_state is None:
                self._gate_state = nf_gate.init_state(len(self.freqs))
            gout, self._gate_state = nf_gate.gate_only(
                cands.count, cands.det_idx, cands.sync_idx,
                cands.sym_valid, cands.dphi, self._gate_rows(l2_map),
                l2["hdr_ok"], l2["bits_consumed"],
                self._gate_delta(start_dec), self._gate_state,
                self._freqs_f32, np.float32(self.max_ppm), eof=True)
            gout_np, fetched, l2_np, l2_map_np = coalesced_get(
                (gout, self._candidate_fields(cands, l2), l2, l2_map))
            return frames0 + self._process_verdicts(
                gout_np, fetched, l2_np, l2_map_np, start_dec)
        fetched, l2_np, l2_map_np = coalesced_get(
            (self._candidate_fields(cands, l2), l2, l2_map))
        return frames0 + self._process_candidates(
            cands, start_dec, eof=True, l2=l2,
            l2_map=l2_map_np, fetched=fetched, l2_np=l2_np)

    # --------------------------------------------------------- helpers
    def _push_tail(self, planar: np.ndarray) -> None:
        if planar.shape[1] == 0:
            return
        # With the double-buffered drain, a deferral from the in-flight
        # block is discovered one block late — retain one extra block
        # (the largest seen) on top of the burst+margin window so the
        # prepend re-read always finds its samples.
        self._tail_keep = max(self._tail_keep,
                              self._tail_base_keep + planar.shape[1])
        self._tail = np.concatenate([self._tail, planar], axis=1)
        if self._tail.shape[1] > self._tail_keep:
            self._tail = self._tail[:, self._tail.shape[1]
                                    - self._tail_keep:]

    def _rebase_state(self, base_raw: int) -> ShardedState:
        """State for a block that re-reads old samples: shard 0's FIR
        prefix comes from the tail buffer, its sync halo is zeroed
        (covered by the defer margin), n0 is the absolute position."""
        st = init_sharded_state(self.mesh, len(self.freqs), self.taps.size)
        T = self.taps.size
        raw_tail = np.asarray(st.raw_tail)
        have = self.global_raw - base_raw
        pre = self._tail[:, max(0, self._tail.shape[1] - have - (T - 1)):
                         self._tail.shape[1] - have]
        if pre.shape[1] == T - 1:
            raw_tail = raw_tail.copy()
            raw_tail[0] = pre
        return self._with_n0(
            ShardedState(raw_tail=self._put(raw_tail, st.raw_tail),
                         dec_tail=st.dec_tail, n0=st.n0), base_raw)

    def _with_n0(self, st: ShardedState, raw_pos: int) -> ShardedState:
        import jax
        n0 = jax.device_put(np.uint32(raw_pos & 0xFFFFFF),
                            st.n0.sharding if hasattr(st.n0, "sharding")
                            else None)
        return ShardedState(raw_tail=st.raw_tail, dec_tail=st.dec_tail,
                            n0=n0)

    def _put(self, arr: np.ndarray, like):
        import jax
        return jax.device_put(arr, like.sharding)

    def _merge_candidates(self, cands, skip_big: bool = False,
                          extra=None):
        """Compact (Tn, C, K) candidate slots into (C, Tn*K) in time
        order, with a map back to the flat device L2 batch index.

        ``skip_big``: with the device L2 path the (Tn, C, K, S)
        symbols/power arrays are consumed on device — don't pull them
        to the host; tiny placeholders keep the namedtuple shape.
        ``extra``: optional pytree of additional device values to fetch
        in the SAME device_get (one roundtrip); returned fetched as a
        third element when given."""
        import numpy as np

        from ..utils.fetch import coalesced_get
        big = ("symbols", "power") if skip_big else ()
        names = [f for f in cands._fields if f != "count" and f not in big]
        # ONE transfer: count + every small field + extra, bit-packed
        fetched, extra_np = coalesced_get(
            (tuple([cands.count] + [getattr(cands, f) for f in names]),
             extra))
        count = fetched[0]                       # (Tn, C)
        arrs = dict(zip(names, fetched[1:]))
        for f in big:
            arrs[f] = np.zeros(tuple(getattr(cands, f).shape[:3]) + (1,),
                               np.uint8)
        Tn, C, K = arrs["det_idx"].shape
        W = Tn * K
        out = {f: np.zeros((C,) + (W,) + a.shape[3:], a.dtype)
               for f, a in arrs.items()}
        out["det_idx"] = np.full((C, W), -1, np.int32)
        mcount = np.zeros(C, np.int32)
        l2_map = np.zeros((C, W), np.int64)
        for c in range(C):
            j = 0
            for t in range(Tn):
                n = int(min(count[t, c], K))
                for f, a in arrs.items():
                    out[f][c, j:j + n] = a[t, c, :n]
                l2_map[c, j:j + n] = (t * C + c) * K + np.arange(n)
                j += n
                if count[t, c] > K:
                    self.channels[c].bump("demod.sync.overflow")
            mcount[c] = j
        from ..dsp.demod import Candidates
        merged = Candidates(count=mcount, **out)
        if extra is not None:
            return merged, l2_map, extra_np
        return merged, l2_map

    def _launch_l2_flat(self, cands):
        """Sharded-step analog of VDL2Pipeline._launch_l2: same shared
        compaction over the (Tn, C, K) candidate slots, flat inv map
        (translated through the merged l2_map at drain time)."""
        if not self.use_device_l2:
            return None, None
        return _launch_compacted_l2(cands.symbols, cands.power,
                                    cands.count, self.max_candidates)
