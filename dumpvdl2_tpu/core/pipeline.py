"""Streaming receive pipeline: raw IQ blocks in, decoded frames out.

Orchestrates the TPU block kernels (front-end channelizer + batched
sync/slicer) and the host-side bit-level decoder.  Replaces the
reference's thread/barrier/queue topology (dumpvdl2.c:117-135,
decode.c:52-53) with overlap-save block processing:

* each ``feed()`` call channelizes one wideband block for all channels
  at once (batch dimension == channel axis; on a mesh this axis is
  sharded, see dumpvdl2_tpu.parallel),
* a decimated-sample halo is carried between blocks so bursts that
  straddle a block boundary are re-detected and decoded once fully
  contained (the reference instead carries per-channel demod state),
* candidate suppression reproduces the reference's behavior of not
  searching for sync while a burst is being received.
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import numpy as np
import scipy.signal

from ..app.stats import stats as _stats
from ..burst import (BurstResult, decode_burst, header_info,
                     jax_tree_to_numpy, _result_from_batch)
from ..constants import (HEADER_LEN, MAG_LP, NF_LP, SPS, SYMBOL_RATE,
                         SYNC_THRESHOLD)
from ..dsp import demod as demod_mod
from ..dsp.chebyshev import fir_taps
from ..dsp.frontend import (bandpass_channelize, nco_dphi, prepare_taps,
                            to_planar)
from .device import process_block, process_block_detect
from ..fec.scramble import descramble
from ..utils.bits import symbols_to_bits_msb
from .metadata import DecodedFrame, MsgMetadata
from ..utils.debug import (D_BURST, D_BURST_DETAIL, D_DEMOD, debug_print,
                           debug_print_buf_hex)

# Longest possible burst in decimated samples (header + max payload), see
# burst geometry in fec/interleave.py: 16825 bits -> 5609 symbols.
MAX_BURST_SYMS = 5616
DEFAULT_HALO = MAX_BURST_SYMS * SPS + 256

# Burst-header failure reasons (decided by header FEC alone, before any
# payload processing) — used to split batch decode results back into the
# reference's header/payload error funnels.
_HEADER_REASONS = frozenset({"hdr_reserved_bits", "too_long", "no_fec"})


def _error_counter(reason: str) -> str:
    """Map a BurstResult failure reason to the reference's counter name.

    Nonzero reserved header bits are counted as "decoder.crc.bad" by the
    reference (decode.c:215-217); every other reason matches a
    decoder.errors.* family by name (statsd.c:48-58).
    """
    if reason == "hdr_reserved_bits":
        return "decoder.crc.bad"
    return "decoder.errors." + reason


def _compact_blocks(l2, cap: int):
    """Second-stage L2 result compaction: the (cap, MAX_BLOCKS, 255)
    corrected-codeword array — the largest L2 result — is only ever
    read for candidates whose header passed, so gather those rows to
    the front and ship a row map instead of the full array.  Rows that
    overflow the (generous) cap map to -1; the host reports them as
    decoder.errors.l2_overflow (same graceful-degradation-with-counter
    semantics as every other fixed cap in the block design)."""
    import jax.numpy as jnp
    cap2 = min(cap, max(128, cap // 4))
    if cap2 >= cap:
        return l2
    order = jnp.argsort(~l2["hdr_ok"], stable=True).astype(jnp.int32)
    take = order[:cap2]
    inv = jnp.full((cap,), -1, jnp.int32)
    inv = inv.at[take].set(jnp.arange(cap2, dtype=jnp.int32))
    l2 = dict(l2)
    l2["blocks"] = l2["blocks"][take]
    l2["blocks_row"] = inv
    return l2


def _launch_compacted_l2(symbols, power, count, K: int):
    """Compact candidate slots on device and dispatch the batched L2
    decode (shared by the single-device and mesh pipelines).

    Only slots ``k < count[...]`` hold real detections, so the L2
    batch — and the result arrays later fetched over the host link —
    scales with a detection cap (``max(256, 4·groups)``), not with the
    total slot count.  On wideband configs this is the difference
    between decoding 16384 mostly-empty 5616-symbol slots per block
    and ~1024 real ones.  ``count`` may be (C,) or (Tn, C); returns
    ``(l2, inv)`` where ``inv`` maps flat slot index -> L2 batch row
    (-1 = overflowed the cap, counted by the host as
    demod.sync.overflow), or ``(l2, None)`` when no compaction was
    needed."""
    import jax.numpy as jnp

    from ..fec.l2_tpu import l2_decode_batch
    groups = int(np.prod(count.shape))
    total = groups * K
    syms = jnp.reshape(jnp.asarray(symbols), (total, MAX_BURST_SYMS))
    pwr = jnp.reshape(jnp.asarray(power), (total, MAX_BURST_SYMS))
    cap = min(total, max(256, 4 * groups))
    if cap >= total:
        return l2_decode_batch(syms, MAX_BURST_SYMS, pwr), None
    k_idx = jnp.arange(K, dtype=jnp.int32)
    valid = (k_idx < jnp.asarray(count)[..., None]).reshape(total)
    order = jnp.argsort(~valid, stable=True).astype(jnp.int32)
    take = order[:cap]                           # valid slots first
    inv = jnp.full((total,), -1, jnp.int32)
    inv = inv.at[take].set(jnp.arange(cap, dtype=jnp.int32))
    l2 = l2_decode_batch(syms[take], MAX_BURST_SYMS, pwr[take])
    return _compact_blocks(l2, cap), inv


def _l2_sliced_impl(phases, pwr, count, sync_idx, dphi, K: int, S: int):
    """Compact candidate slots, slice their symbol windows from the
    device-resident decimated block's phase/power planes, and run the
    batched L2 decode — one fused dispatch.

    Same compaction order/cap/inv semantics as _launch_compacted_l2,
    but the (C, K, S) symbol/power slot arrays are never materialized:
    windows exist only for the <= cap compacted rows.  The slicing +
    demodulation math is element-identical to find_and_slice_impl
    (shared demod_window; same pad/dynamic-slice/stride scheme), so
    host-gated and device-gated runs stay byte-identical.  phases/pwr
    arrive precomputed from process_block_detect (the detection pass
    already needed them), so no full-block transcendental runs here.
    """
    import jax
    import jax.numpy as jnp

    from ..dsp.demod import demod_window
    from ..fec.l2_tpu import l2_decode_batch
    C, M = count.shape[0], phases.shape[1]
    total = C * K
    cap = min(total, max(256, 4 * C))
    if cap >= total:
        take = jnp.arange(total, dtype=jnp.int32)
        inv = None
    else:
        k_idx = jnp.arange(K, dtype=jnp.int32)
        valid = (k_idx < count[:, None]).reshape(total)
        order = jnp.argsort(~valid, stable=True).astype(jnp.int32)
        take = order[:cap]
        inv = jnp.full((total,), -1, jnp.int32)
        inv = inv.at[take].set(jnp.arange(cap, dtype=jnp.int32))
    c_row = take // K
    sp_row = jnp.reshape(sync_idx, (total,))[take]
    dphi_row = jnp.reshape(dphi, (total,))[take]

    # Window slicing at the SYMBOL rate: a raw-rate window is W =
    # S*SPS+1 samples of which only every SPS-th is kept, so fold the
    # planes by decimation phase — fold[c, q, r] == plane[c, q*SPS+r]
    # — and slice (S+1) contiguous axis-1 elements at (sp//SPS,
    # sp%SPS).  Element-identical to slicing W then striding ::SPS
    # (indices sp + SPS*s either way), with SPS-fold less gather
    # traffic for the (cap, W) windows.
    Wd = S + 1
    pad = SPS * (M // SPS + Wd + 1) - M
    Mf = (M + pad) // SPS
    ph_fold = jnp.pad(phases, ((0, 0), (0, pad))).reshape(C, Mf, SPS)
    pw_fold = jnp.pad(pwr, ((0, 0), (0, pad))).reshape(C, Mf, SPS)

    def slice_one(c, sp):
        start = jnp.clip(sp, 0, M)
        q, r = start // SPS, start % SPS
        w = jax.lax.dynamic_slice(ph_fold, (c, q, r), (1, Wd, 1))
        p = jax.lax.dynamic_slice(pw_fold, (c, q, r), (1, Wd, 1))
        return w[0, :, 0], p[0, :, 0]                        # (S+1,) each

    sym_phase, power_all = jax.vmap(slice_one)(c_row, sp_row)
    symbols, power = demod_window(sym_phase, power_all, dphi_row)
    # hdr-ok burst compaction happens INSIDE the decode (rs_burst_cap):
    # same cap and overflow semantics as _compact_blocks, but the
    # octet-pack/deinterleave/RS stages never run for the compacted-out
    # rows (~4x less device work than post-hoc result compaction)
    l2 = l2_decode_batch(symbols, S, power,
                         rs_burst_cap=min(cap, max(128, cap // 4)))
    return l2, inv


_L2_SLICED = None


def _launch_sliced_l2(phases, pwr, dets, K: int):
    """Jitted wrapper for _l2_sliced_impl (lazy so CPU-only test runs
    never trace it unless the device-L2 path is active)."""
    global _L2_SLICED
    if _L2_SLICED is None:
        import jax
        from functools import partial

        # Import the consumed modules OUTSIDE the trace: their
        # module-level jnp constant tables must not be created while
        # _l2_sliced_impl is being traced (tracer-leak hazard).
        from ..dsp import demod as _demod            # noqa: F401
        from ..fec import l2_tpu as _l2t             # noqa: F401
        _L2_SLICED = partial(jax.jit, static_argnames=("K", "S"))(
            _l2_sliced_impl)
    return _L2_SLICED(phases, pwr, dets.count, dets.sync_idx, dets.dphi,
                      K=K, S=MAX_BURST_SYMS)


_MAG16 = None


def _mag16(pwr3):
    """Device-side sqrt + cast: ship noise-tracker magnitudes as f16
    (half the link bytes of the power array, and the host never pays
    the (C, M/3) sqrt)."""
    global _MAG16
    if _MAG16 is None:
        import jax
        import jax.numpy as jnp
        _MAG16 = jax.jit(lambda p: jnp.sqrt(p).astype(jnp.float16))
    return _MAG16(pwr3)


def _resolve_device_l2() -> bool:
    """Decide ONCE whether L2 burst decode runs batched on the device.

    Default 'auto' enables it on TPU (where the MXU RS decoder wins);
    DUMPVDL2_TPU_L2=1 forces it on any backend (used by the CPU parity
    tests), =0 forces the scalar host path.
    """
    import os
    import jax
    v = os.environ.get("DUMPVDL2_TPU_L2", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() == "tpu"


def _resolve_device_gate() -> bool:
    """Decide whether candidate gating + the NF tracker run on device.

    'auto' (default) follows the device-L2 decision — the gating scan
    consumes the device L2 results, so it is only available there.
    DUMPVDL2_TPU_GATE=0 forces the host loop (keeps the magnitude
    stream in the drain); =1 is accepted but still requires device L2.
    """
    import os
    return os.environ.get("DUMPVDL2_TPU_GATE", "auto") != "0"


@dataclass
class ChannelState:
    freq: int
    busy_until: int = 0         # global decimated index; no sync search before
    next_det_min: int = 0       # first unprocessed detection index
    mag_lp: float = 0.0
    mag_nf: float = 2.0
    nfcnt: int = 0
    deferred_at: int | None = None   # deferred burst position this block
    # Noise-tracker hold: while a deferred burst awaits decision, later
    # magnitude columns are saved here and replayed once the burst
    # resolves (the reference's tracker would still be paused in
    # DM_SYNC at that point, demod.c:229-250).
    nf_hold: int | None = None
    nf_saved: list = field(default_factory=list)
    stats: dict = field(default_factory=dict)

    def bump(self, counter: str, n: int = 1) -> None:
        """Count locally AND export to the global sink with the
        reference's per-channel metric names (statsd.c:34-63), so
        --statsd emits the full demod/decoder funnel."""
        self.stats[counter] = self.stats.get(counter, 0) + n
        _stats.increment_per_channel(self.freq, counter, n)


class VDL2Pipeline:
    def __init__(self, freqs: list[int], centerfreq: int, sample_rate: int,
                 oversample: int, max_ppm: float = 0.0,
                 station_id: str | None = None,
                 max_candidates: int = 64, demod_fn=None):
        self.freqs = list(freqs)
        self.centerfreq = int(centerfreq)
        self.sample_rate = int(sample_rate)
        self.oversample = int(oversample)
        self.max_ppm = float(max_ppm)
        self.station_id = station_id
        self.max_candidates = int(max_candidates)
        self._demod_fn = demod_fn or demod_mod.find_and_slice

        self.taps = prepare_taps(fir_taps(sample_rate), oversample)
        self.dphi = np.array([nco_dphi(centerfreq, f, sample_rate)
                              for f in freqs], dtype=np.uint32)
        C, T = len(freqs), self.taps.size
        self.carry = np.zeros((2, T - 1), dtype=np.float32)
        self.n0 = 0                                   # raw-sample NCO index
        self.hist = np.zeros((2, C, 0), dtype=np.float32)
        self.hist_base = 0        # global decimated index of hist[:, 0]
        self.channels = [ChannelState(freq=f) for f in freqs]
        self._ema_zi = np.zeros((C, 1))
        self._residual = np.zeros(0, dtype=np.complex64)
        self.use_device_l2 = _resolve_device_l2()
        # Device-side gating + NF tracker (core/nf_gate.py): the whole
        # per-channel state machine runs on device, the drain carries
        # verdicts instead of the magnitude stream.  Host-loop parity
        # is pinned by tests/test_nf_gate.py dual-mode differentials.
        self.use_device_gate = self.use_device_l2 and _resolve_device_gate()
        self._gate_state = None
        self._gate_base = 0
        self._freqs_f32 = np.asarray(self.freqs, np.float32)
        # Pipelined host loop (reference analog: producer/demod thread
        # overlap across the barrier pair, dumpvdl2.c:117-135): block
        # N's device step is dispatched before older blocks' results
        # are consumed, result transfers run in a background thread,
        # and the host processes the oldest fetched block — up to two
        # blocks in flight, so device compute, link transfer and host
        # decode all overlap.
        from collections import deque
        self._pending_q = deque()
        self._fetch_pool = None
        self._pending = None            # MeshPipeline's 1-deep slot
        self._last_proc_base = None

    def _launch_l2(self, cands):
        """Dispatch the batched device L2 decode for a candidate set
        (see _launch_compacted_l2); returns ``(l2, l2_map)`` with the
        slot->row map shaped (C, K)."""
        if not self.use_device_l2:
            return None, None
        l2, inv = _launch_compacted_l2(cands.symbols, cands.power,
                                       cands.count, self.max_candidates)
        if inv is not None:
            inv = inv.reshape(len(self.channels), self.max_candidates)
        return l2, inv

    # ------------------------------------------------------------- front end
    def _channelize(self, iq: np.ndarray):
        dec, carry = bandpass_channelize(
            iq, self.taps, self.dphi, np.uint32(self.n0 & 0xFFFFFF),
            self.carry, self.oversample)
        self.carry = carry
        self.n0 = (self.n0 + iq.shape[1]) & 0xFFFFFF
        return dec

    # ----------------------------------------------------------- noise floor
    # The reference updates its magnitude EMA + noise floor only in
    # DM_INIT (every 3rd sample) and PAUSES while receiving a burst
    # (demod.c:229-250).  Block form: feed() stashes the block's
    # every-3rd-sample magnitudes; _process_candidates advances the
    # tracker up to each burst's sync point before emitting (so header
    # fields see the pre-burst floor), skipping busy windows.

    def _stash_noise_block(self, mags: np.ndarray, base: int) -> None:
        """``mags`` columns are magnitudes of fresh decimated samples
        base, base+3, base+6, ... (global indices).  The sqrt runs on
        device (see _mag16) so only half-precision magnitudes cross the
        host link — f16 rounding is ~5e-4 relative, three orders below
        the 0.1 dB display resolution of the noise floor."""
        self._nf_mags = np.asarray(mags, np.float64)
        self._nf_base = base
        self._nf_col = np.zeros(len(self.channels), np.int64)

    def _advance_noise_floor(self, c: int, upto: int) -> None:
        """Track magnitudes for channel ``c`` up to global dec index
        ``upto``, skipping samples inside busy (burst) windows."""
        mags = getattr(self, "_nf_mags", None)
        if mags is None:
            return
        ch = self.channels[c]
        ncols = mags.shape[1]
        while self._nf_col[c] < ncols:
            j = int(self._nf_col[c])
            idx = self._nf_base + 3 * j
            if idx >= upto:
                break
            # skip the busy window in one step
            if idx < ch.busy_until:
                skip_to = min(ch.busy_until, upto)
                self._nf_col[c] = min(
                    ncols, (skip_to - self._nf_base + 2) // 3)
                continue
            # a deferred burst is still undecided: save, don't track
            if ch.nf_hold is not None and idx >= ch.nf_hold:
                run_end = min(ncols, (upto - self._nf_base + 2) // 3)
                jj = np.arange(j, run_end)
                ch.nf_saved.append((self._nf_base + 3 * jj,
                                    mags[c, j:run_end].copy()))
                self._nf_col[c] = run_end
                continue
            # contiguous trackable run: up to busy/hold/upto boundary
            end_idx = upto
            if ch.nf_hold is not None:
                end_idx = min(end_idx, ch.nf_hold)
            run_end = min(ncols, (end_idx - self._nf_base + 2) // 3)
            seg = mags[c, j:run_end]
            self._nf_col[c] = run_end
            self._track_channel(ch, seg)

    def _release_nf_hold(self, ch: ChannelState) -> None:
        """A deferred burst was decided: replay held magnitude columns
        through the tracker, skipping the (now known) busy window."""
        saved, ch.nf_saved, ch.nf_hold = ch.nf_saved, [], None
        for idxs, mags in saved:
            self._track_channel(ch, mags[idxs >= ch.busy_until])

    def _track_channel(self, ch: ChannelState, seg: np.ndarray) -> None:
        """EMA + per-1000 noise-floor update (demod.c:238-243)."""
        if seg.size == 0:
            return
        alpha = 1.0 - MAG_LP
        y, _zi = scipy.signal.lfilter(
            [alpha], [1.0, -MAG_LP], seg,
            zi=np.array([MAG_LP * ch.mag_lp]))
        ch.mag_lp = float(y[-1])
        n = seg.size
        first = 1000 - ch.nfcnt
        k = ch.nfcnt + n
        while first <= n:
            v = float(y[first - 1])
            ch.mag_nf = NF_LP * ch.mag_nf + \
                (1.0 - NF_LP) * min(v, ch.mag_nf) + 0.0001
            first += 1000
        ch.nfcnt = k % 1000

    def _finish_noise_block(self) -> None:
        """Advance every channel to the block end — but not past a
        deferred burst's sync point (the reference would already be in
        DM_SYNC there; the skipped tail is re-covered as the burst's
        busy window next block)."""
        mags = getattr(self, "_nf_mags", None)
        if mags is None:
            return
        end = self._nf_base + 3 * mags.shape[1]
        for c, ch in enumerate(self.channels):
            upto = end if ch.deferred_at is None \
                else min(end, ch.deferred_at)
            self._advance_noise_floor(c, upto)
            if ch.deferred_at is not None:
                # burst pending across blocks: pause the tracker here
                # until _process_candidates decides it (stash columns
                # past this point were discarded by the upto bound)
                ch.nf_hold = ch.deferred_at if ch.nf_hold is None \
                    else min(ch.nf_hold, ch.deferred_at)
            elif (ch.nf_hold is not None
                  and self._last_proc_base is not None
                  and self._last_proc_base <= ch.nf_hold):
                # this block re-covered the held position but the
                # candidate neither resolved nor re-deferred: it
                # vanished — release the held columns
                self._release_nf_hold(ch)
            ch.deferred_at = None
        self._nf_mags = None

    # ------------------------------------------------------------- candidates
    @staticmethod
    def _candidate_fields(cands, l2):
        """Device arrays a drain must fetch for host processing.  With
        the device L2 path symbols/power stay ON DEVICE: the burst
        decode consumes them there and frame_pwr comes back in the l2
        result, so the (C, K, S) arrays never cross the host link."""
        small = (cands.count, cands.det_idx, cands.sync_idx,
                 cands.dphi, cands.pherr, cands.sym_valid)
        if l2 is None:
            return small + (cands.symbols, cands.power)
        return small

    def _fetch_candidates(self, cands, l2):
        from ..utils.fetch import coalesced_get
        return coalesced_get(self._candidate_fields(cands, l2))

    # ------------------------------------------------------- device gating
    def _gate_rows(self, l2_map):
        """Slot -> L2 batch row map as a (C, K) device/host array."""
        if l2_map is not None:
            return l2_map
        # identity map for the uncompacted case: constant per (C, K),
        # cached so each block doesn't re-upload the same table
        rows = getattr(self, "_gate_rows_cache", None)
        if rows is None:
            C, K = len(self.channels), self.max_candidates
            rows = np.arange(C * K, dtype=np.int32).reshape(C, K)
            self._gate_rows_cache = rows
        return rows

    def _gate_delta(self, base: int) -> np.int32:
        from . import nf_gate
        d = base - self._gate_base
        self._gate_base = base
        return np.int32(np.clip(d, -nf_gate.MAX_DELTA,
                                nf_gate.MAX_DELTA))

    def _dispatch_gate(self, cands, l2, l2_map, pwr3, base: int, H: int):
        """Launch the device gate+NF step for one block (state chains
        on device; see core/nf_gate.py)."""
        from . import nf_gate
        if self._gate_state is None:
            self._gate_state = nf_gate.init_state(len(self.channels))
        out, self._gate_state = nf_gate.gate_nf_single(
            cands.count, cands.det_idx, cands.sync_idx, cands.sym_valid,
            cands.dphi, self._gate_rows(l2_map), l2["hdr_ok"],
            l2["bits_consumed"], pwr3, np.int32(H),
            self._gate_delta(base), self._gate_state, self._freqs_f32,
            np.float32(self.max_ppm))
        return out

    def _process_verdicts(self, gout, fetched, l2_np, l2_map_np,
                          base: int) -> list[DecodedFrame]:
        """Device-gated twin of _process_candidates: the decisions were
        made on device; the host only mirrors state, bumps the
        reference counters, and assembles frames for accepts."""
        from . import nf_gate as ng
        out: list[DecodedFrame] = []
        v = np.asarray(gout["verdicts"])
        nf_read = np.asarray(gout["nf_read"])
        count, det_idx, sync_idx, dphi, pherr, sym_valid = fetched
        self._last_proc_base = base
        deferred = np.asarray(gout["deferred_at"])
        mins = deferred[deferred >= 0]
        self.last_deferred_min = base + int(mins.min()) if mins.size \
            else None
        K = det_idx.shape[1]

        def l2_row(c: int, k: int) -> int:
            return int(l2_map_np[c, k]) if l2_map_np is not None \
                else c * self.max_candidates + k

        for c, ch in enumerate(self.channels):
            if int(count[c]) > K:
                ch.bump("demod.sync.overflow")
            # mirror the carried device state (debug / introspection;
            # the decisions themselves never consult these mirrors)
            ch.busy_until = base + int(gout["busy_until"][c])
            ch.next_det_min = base + int(gout["next_det_min"][c])
            ch.mag_nf = float(gout["mag_nf"][c])
            ch.mag_lp = float(gout["mag_lp"][c])
            ch.nfcnt = int(gout["nfcnt"][c])
            ch.nf_hold = base + int(gout["hold"][c]) \
                if bool(gout["hold_active"][c]) else None
            ch.deferred_at = None
            vc = v[c]
            for k in np.nonzero((vc != ng.V_EMPTY) & (vc != ng.V_SKIP)
                                & (vc != ng.V_UNPROCESSED))[0]:
                verdict = int(vc[k])
                det_g = base + int(det_idx[c, k])
                sp_g = base + int(sync_idx[c, k])
                if verdict == ng.V_L2_OVERFLOW:
                    ch.bump("demod.sync.overflow")
                    continue
                if verdict not in ng.SYNC_GOOD_VERDICTS:
                    continue          # V_DEFER / V_EOF_SHORT: pending
                ch.bump("demod.sync.good")
                debug_print(D_DEMOD,
                            "ch %d (%d Hz): sync at %d err=%.3f dphi=%.5f",
                            c, ch.freq, sp_g, float(pherr[c, k]),
                            float(dphi[c, k]))
                if verdict == ng.V_DEFER_DATA:
                    continue
                if verdict == ng.V_HDR_REJECT:
                    res = _result_from_batch(l2_np, l2_row(c, k))
                    debug_print(D_BURST, "ch %d: header rejected (%s)",
                                c, res.reason)
                    ch.bump(_error_counter(res.reason))
                    continue
                if verdict == ng.V_EOF_TRUNC:
                    ch.bump("decoder.errors.eof_truncated")
                    continue
                if verdict == ng.V_PPM_REJECT:
                    continue
                # V_ACCEPT
                row = l2_row(c, k)
                res = _result_from_batch(l2_np, row)
                ppm = SYMBOL_RATE * float(dphi[c, k]) \
                    / (2.0 * math.pi * ch.freq) * 1e6
                debug_print(D_BURST,
                            "ch %d: burst ok=%s reason=%s datalen=%d "
                            "blocks=%d fec_corr=%d frames=%d",
                            c, res.ok, res.reason or "-", res.datalen,
                            res.blocks_processed,
                            res.num_fec_corrections, len(res.frames))
                for fr in res.frames:
                    debug_print_buf_hex(D_BURST_DETAIL, fr,
                                        "unstuffed frame:")
                frame_pwr = float(l2_np["frame_pwr"][row])
                self._count_burst(ch, res, frame_pwr)
                nf = float(nf_read[c, k])
                for i, frame in enumerate(res.frames):
                    md = MsgMetadata(
                        station_id=self.station_id, freq=ch.freq,
                        frame_pwr_dbfs=10.0 * math.log10(
                            max(frame_pwr, 1e-30)),
                        nf_pwr_dbfs=20.0 * math.log10(nf + 0.001),
                        ppm_error=ppm,
                        burst_timestamp=time.time(),
                        datalen_octets=res.datalen_octets,
                        synd_weight=res.synd_weight,
                        num_fec_corrections=res.num_fec_corrections,
                        idx=i)
                    out.append(DecodedFrame(metadata=md, frame=frame))
        return out

    def _process_candidates(self, cands, base: int, eof: bool,
                            l2=None, l2_map=None, fetched=None,
                            l2_np=None) -> list[DecodedFrame]:
        out: list[DecodedFrame] = []
        self.last_deferred_min: int | None = None

        def l2_index(c: int, k: int) -> int:
            return int(l2_map[c, k]) if l2_map is not None \
                else c * self.max_candidates + k

        def l2_result(c: int, k: int) -> BurstResult:
            nonlocal l2_np
            if l2_np is None:
                l2_np = jax_tree_to_numpy(l2)
            return _result_from_batch(l2_np, l2_index(c, k))

        def l2_frame_pwr(c: int, k: int) -> float:
            return float(l2_np["frame_pwr"][l2_index(c, k)])

        self._last_proc_base = base

        def defer(det_g: int, ch: ChannelState) -> None:
            if self.last_deferred_min is None \
                    or det_g < self.last_deferred_min:
                self.last_deferred_min = det_g
            if ch.deferred_at is None or det_g < ch.deferred_at:
                ch.deferred_at = det_g

        def decided(ch: ChannelState, det_g: int) -> None:
            # A candidate at/after a tracker hold point was decided:
            # replay held magnitude columns (busy window now known).
            if ch.nf_hold is not None and det_g >= ch.nf_hold:
                self._release_nf_hold(ch)

        # ONE coalesced device_get for all small candidate fields (per
        # fetch there is a host sync — on latency-bound links each
        # separate np.asarray costs a full roundtrip).  Callers that
        # already fetched (e.g. _drain_pending, which coalesces these
        # with pwr3 + the L2 results into a single roundtrip) pass the
        # arrays in via ``fetched``.
        if fetched is None:
            fetched = self._fetch_candidates(cands, l2)
        if l2 is None:
            (count, det_idx, sync_idx, dphi, pherr, sym_valid,
             symbols, power) = fetched
        else:
            count, det_idx, sync_idx, dphi, pherr, sym_valid = fetched
            symbols = power = None

        for c, ch in enumerate(self.channels):
            for k in range(int(count[c])):
                if k >= det_idx.shape[1]:
                    ch.bump("demod.sync.overflow")
                    break
                det_g = base + int(det_idx[c, k])
                sp_g = base + int(sync_idx[c, k])
                if det_g < ch.next_det_min or det_g < ch.busy_until:
                    continue
                if l2 is not None and l2_map is not None \
                        and int(l2_map[c, k]) < 0:
                    # candidate overflowed the compacted L2 batch cap
                    # (same degradation semantics as the per-channel K
                    # cap): count it and move on
                    ch.bump("demod.sync.overflow")
                    ch.next_det_min = det_g + 1
                    decided(ch, det_g)
                    continue
                nsyms_avail = int(sym_valid[c, k])
                if nsyms_avail < (HEADER_LEN + 2) // 3 + 1:
                    if eof:
                        ch.next_det_min = det_g + 1
                        decided(ch, det_g)
                        continue
                    ch.next_det_min = det_g   # retry next block
                    defer(det_g, ch)
                    break
                ch.bump("demod.sync.good")
                debug_print(D_DEMOD,
                            "ch %d (%d Hz): sync at %d err=%.3f dphi=%.5f",
                            c, ch.freq, sp_g, float(pherr[c, k]),
                            float(dphi[c, k]))
                full: BurstResult | None = None
                if l2 is not None:
                    full = l2_result(c, k)
                    hdr_ok = full.ok or full.reason not in _HEADER_REASONS
                    hdr_reason = full.reason
                    hdr_bits_consumed = full.bits_consumed
                else:
                    hdr_bits = symbols_to_bits_msb(
                        symbols[c, k][:9])[:HEADER_LEN]
                    hdr = header_info(descramble(hdr_bits))
                    hdr_ok = hdr.ok
                    hdr_reason = hdr.reason
                    hdr_bits_consumed = hdr.bits_consumed
                if not hdr_ok:
                    debug_print(D_BURST, "ch %d: header rejected (%s)",
                                c, hdr_reason)
                    ch.bump(_error_counter(hdr_reason))
                    self._advance_noise_floor(c, sp_g)
                    ch.busy_until = sp_g + 9 * SPS
                    ch.next_det_min = det_g + 1
                    decided(ch, det_g)
                    continue
                total_syms = -(-hdr_bits_consumed // 3)
                if nsyms_avail < total_syms:
                    if not eof:
                        ch.next_det_min = det_g
                        defer(det_g, ch)
                        break
                    ch.next_det_min = det_g + 1   # truncated at EOF: lost
                    ch.bump("decoder.errors.eof_truncated")
                    decided(ch, det_g)
                    continue
                dphi_ck = float(dphi[c, k])
                ppm = SYMBOL_RATE * dphi_ck / (2.0 * math.pi * ch.freq) * 1e6
                if self.max_ppm and abs(ppm) > self.max_ppm:
                    ch.next_det_min = det_g + 1
                    decided(ch, det_g)
                    continue
                if full is not None:
                    res = full
                else:
                    bits = symbols_to_bits_msb(
                        symbols[c, k][:total_syms])[:hdr_bits_consumed]
                    res = decode_burst(bits)
                self._advance_noise_floor(c, sp_g)
                ch.busy_until = sp_g + total_syms * SPS
                ch.next_det_min = det_g + 1
                decided(ch, det_g)
                debug_print(D_BURST,
                            "ch %d: burst ok=%s reason=%s datalen=%d "
                            "blocks=%d fec_corr=%d frames=%d",
                            c, res.ok, res.reason or "-", res.datalen,
                            res.blocks_processed, res.num_fec_corrections,
                            len(res.frames))
                for fr in res.frames:
                    debug_print_buf_hex(D_BURST_DETAIL, fr,
                                        "unstuffed frame:")
                frame_pwr = l2_frame_pwr(c, k) if full is not None \
                    else float(power[c, k, :total_syms].mean())
                self._count_burst(ch, res, frame_pwr)
                for i, frame in enumerate(res.frames):
                    md = MsgMetadata(
                        station_id=self.station_id, freq=ch.freq,
                        frame_pwr_dbfs=10.0 * math.log10(max(frame_pwr, 1e-30)),
                        nf_pwr_dbfs=20.0 * math.log10(ch.mag_nf + 0.001),
                        ppm_error=ppm,
                        burst_timestamp=time.time(),
                        datalen_octets=res.datalen_octets,
                        synd_weight=res.synd_weight,
                        num_fec_corrections=res.num_fec_corrections,
                        idx=i)
                    out.append(DecodedFrame(metadata=md, frame=frame))
        return out

    def _count_burst(self, ch: ChannelState, res: BurstResult,
                     frame_pwr: float = 0.0) -> None:
        """Reference decode-funnel counters (decode.c:210-380)."""
        if res.synd_weight == 0:
            ch.bump("decoder.crc.good")
        if res.blocks_processed:
            ch.bump("decoder.blocks.processed", res.blocks_processed)
        if res.blocks_fec_ok:
            ch.bump("decoder.blocks.fec_ok", res.blocks_fec_ok)
        if res.ok:
            ch.bump("decoder.msg.good", max(len(res.frames), 1))
            if frame_pwr > 1.0:          # > 0 dBFS (decode.c:372)
                ch.bump("decoder.msg.good_loud")
        elif res.reason:
            ch.bump(_error_counter(res.reason))

    # ------------------------------------------------------------------ feed
    def feed(self, iq: np.ndarray, eof: bool = False) -> list[DecodedFrame]:
        """Process one wideband complex64 block; returns decoded frames.

        ``iq`` is the dequantized complex baseband at the ingest rate.
        Length need not be aligned; a residual is carried internally.
        """
        iq = np.ascontiguousarray(iq, dtype=np.complex64)
        if self._residual.size:
            iq = np.concatenate([self._residual, iq])
        usable = (iq.size // self.oversample) * self.oversample
        self._residual = iq[usable:]
        return self.feed_planar(to_planar(iq[:usable]), eof=eof)

    def feed_planar(self, iq, eof: bool = False) -> list[DecodedFrame]:
        """feed() for planar (2, N) float32 blocks, N a multiple of the
        oversample factor.  ``iq`` may be a DEVICE-resident jax array —
        an ingest path that DMAs straight into device memory (or reuses
        an on-device block) skips the host->device copy entirely."""
        if iq.shape[1] == 0:
            return self.finish() if eof else []

        H = self.hist.shape[2]
        if self.use_device_l2:
            # Detect-only device step + fused compact/slice/L2 decode:
            # symbol windows are sliced from the device-resident block
            # for the compacted candidate rows only (never (C, K, S)).
            cands, phases_arr, pwr_arr, new_hist, new_carry, pwr3 = \
                process_block_detect(
                    iq, self.taps, self.dphi,
                    np.uint32(self.n0 & 0xFFFFFF), self.carry,
                    self.hist, self.oversample, DEFAULT_HALO,
                    SYNC_THRESHOLD, self.max_candidates, MAX_BURST_SYMS)
            l2, l2_map = _launch_sliced_l2(phases_arr, pwr_arr, cands,
                                           self.max_candidates)
            if l2_map is not None:
                l2_map = l2_map.reshape(len(self.channels),
                                        self.max_candidates)
        else:
            cands, new_hist, new_carry, pwr3 = process_block(
                iq, self.taps, self.dphi, np.uint32(self.n0 & 0xFFFFFF),
                self.carry, self.hist, self.oversample, DEFAULT_HALO,
                SYNC_THRESHOLD, self.max_candidates, MAX_BURST_SYMS)
            l2, l2_map = self._launch_l2(cands)
        self.carry = new_carry
        self.n0 = (self.n0 + iq.shape[1]) & 0xFFFFFF

        base = self.hist_base
        M_total = H + iq.shape[1] // self.oversample
        keep = min(DEFAULT_HALO, M_total)
        self.hist = new_hist
        self.hist_base = base + M_total - keep

        # Two-deep host pipeline: this block's device work is in
        # flight, its result fetch runs in a BACKGROUND thread (the
        # transfer is pure I/O on a latency-bound link), and the host
        # processes the block fetched two feeds ago — so per-block wall
        # time is max(transfer, host work), not their sum.  Deferred
        # candidates are safe at any drain lag: re-detection happens in
        # the DEVICE pass of the following block (the carried halo
        # retains a full max-length burst), independent of when the
        # host drains the results.
        if self.use_device_gate and l2 is not None:
            # Device gating: the gate+NF step chains its own carried
            # state on device; the drain fetches verdicts + per-accept
            # noise-floor readings instead of the magnitude stream.
            gout = self._dispatch_gate(cands, l2, l2_map, pwr3, base, H)
            fut = self._submit_fetch(
                (gout, self._candidate_fields(cands, l2), l2, l2_map))
            self._pending_q.append(("gate", fut, base, base + H))
        else:
            fut = self._submit_fetch(
                (_mag16(pwr3), self._candidate_fields(cands, l2), l2,
                 l2_map))
            # queue carries NO device arrays: the fetch future owns the
            # only references, so each block's (C, K, S) symbol/power
            # buffers are freed as soon as the transfer completes
            # (hundreds of MB per block at wideband), instead of
            # pinning HBM for the queue's lifetime
            self._pending_q.append((l2 is not None, fut, base, base + H))
        frames = []
        while len(self._pending_q) > 2 \
                or (self._pending_q and self._pending_q[0][1].done()):
            frames.extend(self._drain_oldest())
        if eof:
            frames.extend(self.finish())
        return frames

    def _submit_fetch(self, tree):
        from concurrent.futures import ThreadPoolExecutor
        from ..utils.fetch import coalesced_get
        if self._fetch_pool is None:
            self._fetch_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="vdl2-fetch")
        return self._fetch_pool.submit(coalesced_get, tree)

    def _drain_oldest(self) -> list[DecodedFrame]:
        """Host-process the oldest in-flight block, if any.

        EVERYTHING the host needs for the block — noise-tracker
        magnitude columns (host-gated mode) or gate verdicts
        (device-gated mode), candidate fields, and the device-L2
        results — arrived in ONE background transfer (utils/fetch.py).
        """
        if not self._pending_q:
            return []
        has_l2, fut, base, nf_base = self._pending_q.popleft()
        if has_l2 == "gate":
            gout, fetched, l2_np, l2_map_np = fut.result()
            return self._process_verdicts(gout, fetched, l2_np,
                                          l2_map_np, base)
        mags_np, fetched, l2_np, l2_map_np = fut.result()
        self._stash_noise_block(mags_np, nf_base)
        # cands/l2 device arrays were released with the fetch; the
        # fetched numpy views carry everything (l2_np doubles as the
        # "device L2 path" flag the candidate loop keys on)
        frames = self._process_candidates(
            None, base, eof=False, l2=l2_np if has_l2 else None,
            l2_map=l2_map_np, fetched=fetched, l2_np=l2_np)
        self._finish_noise_block()
        return frames

    def _drain_pending(self) -> list[DecodedFrame]:
        """Drain every in-flight block in order."""
        frames = []
        while self._pending_q:
            frames.extend(self._drain_oldest())
        return frames

    def finish(self) -> list[DecodedFrame]:
        """Flush: resolve deferred candidates with the data we have."""
        frames = self._drain_pending()
        if self._fetch_pool is not None:
            # EOF: release the background fetch thread (recreated
            # lazily if the pipeline is fed again)
            self._fetch_pool.shutdown(wait=False)
            self._fetch_pool = None
        if self.hist.shape[2] == 0:
            return frames
        cands = self._demod_fn(self.hist, SYNC_THRESHOLD,
                               self.max_candidates, MAX_BURST_SYMS)
        l2, l2_map = self._launch_l2(cands)
        from ..utils.fetch import coalesced_get
        if self.use_device_gate and l2 is not None:
            # EOF through the device gate: no fresh magnitude columns
            # (the host's finish() never stashes a noise block either).
            from . import nf_gate
            if self._gate_state is None:
                self._gate_state = nf_gate.init_state(len(self.channels))
            gout, self._gate_state = nf_gate.gate_only(
                cands.count, cands.det_idx, cands.sync_idx,
                cands.sym_valid, cands.dphi, self._gate_rows(l2_map),
                l2["hdr_ok"], l2["bits_consumed"],
                self._gate_delta(self.hist_base), self._gate_state,
                self._freqs_f32, np.float32(self.max_ppm), eof=True)
            gout_np, fetched, l2_np, l2_map_np = coalesced_get(
                (gout, self._candidate_fields(cands, l2), l2, l2_map))
            frames.extend(self._process_verdicts(
                gout_np, fetched, l2_np, l2_map_np, self.hist_base))
            return frames
        fetched, l2_np, l2_map_np = coalesced_get(
            (self._candidate_fields(cands, l2), l2, l2_map))
        frames.extend(self._process_candidates(
            cands, self.hist_base, eof=True, l2=l2, l2_map=l2_map_np,
            fetched=fetched, l2_np=l2_np))
        return frames
