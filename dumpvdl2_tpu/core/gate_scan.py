"""Device-side candidate gating: the host decision loop as a lax.scan.

This moves the per-channel burst state machine onto the device.  The
wideband end-to-end path used to be bound by the noise-tracker
magnitude stream it had to ship to the host (~75% of the per-block
drain, BASELINE.md round-4 notes); eliminating it requires the device
to know each block's busy windows — i.e. to run the candidate gating
decisions of ``VDL2Pipeline._process_candidates`` (core/pipeline.py)
itself.  This module implements those decisions as a vmapped
``lax.scan`` over candidate slots and is pinned against the REAL host
loop by tests/test_gate_scan.py over randomized scenarios.  It IS
wired into the pipeline (default ON): ``core/nf_gate.py`` holds the
device NF tracker consuming these busy windows (hold/replay, EOF
flush), ``core/pipeline.py`` and the mesh path consume its verdicts,
and ``DUMPVDL2_TPU_GATE=0`` falls back to the host loop (both modes
are held to set-identical accepts by tests/test_nf_gate.py and the
margin sweep in tests/test_sync_margin_sweep.py).

Decision semantics replicated 1:1 from the host loop
(reference analog: the DM_* / DEC_* state machine, demod.c:229-285 +
decode.c:198-258, re-expressed block-wise):

* candidates are processed in time order per channel;
* a candidate inside the channel's busy window or before the
  next-detection watermark is skipped;
* too few symbols for a header => DEFER (stop the channel's block)
  unless EOF, where the candidate is abandoned;
* header-FEC failure => 9-symbol busy window, move on;
* not enough symbols for the full burst => DEFER unless EOF
  (abandoned as eof-truncated);
* |ppm| beyond --max-ppm => rejected;
* acceptance claims the full burst length as the busy window.

Production-wiring notes: the host computes ppm in float64 (this scan
receives precomputed per-slot ppm values, so the caller decides where
that rounding happens), and global indices are carried as int32 here —
the wired caller therefore feeds BLOCK-RELATIVE indices with a clamped
rebase each block, so multi-hour streams never wrap 2^31 decimated
samples (soak-tested past a 2^31 global index by
tests/test_soak_longstream.py).
"""
from __future__ import annotations

from functools import partial

import jax

from ..constants import HEADER_LEN, SPS

# verdict codes (int8)
V_EMPTY = 0        # slot >= count: no candidate
V_SKIP = 1         # inside busy window / before next_det_min
V_L2_OVERFLOW = 2  # compacted L2 batch had no row (l2_row < 0)
V_DEFER = 3        # header doesn't fit the available symbols: deferred
V_DEFER_DATA = 10  # header ok but burst tail missing: deferred
                   # (counts demod.sync.good, unlike V_DEFER)
V_EOF_SHORT = 4    # same at EOF: abandoned
V_HDR_REJECT = 5   # header FEC rejected
V_EOF_TRUNC = 6    # burst truncated at EOF: abandoned
V_PPM_REJECT = 7   # --max-ppm gate
V_ACCEPT = 8       # burst decoded; busy window claimed
V_UNPROCESSED = 9  # after a deferral stopped the channel

_MIN_HDR_SYMS = (HEADER_LEN + 2) // 3 + 1


@partial(jax.jit, static_argnames=("eof",))
def gate_scan(count, det_idx, sync_idx, sym_valid, hdr_ok,
              bits_consumed, ppm, l2_row, busy_until0, next_det_min0,
              base, max_ppm, eof: bool = False):
    """Run the gating decisions for one block on device.

    Args (shapes: C channels x K candidate slots):
      count (C,) i32; det_idx/sync_idx (C, K) i32 block-local indices
      (-1 pad); sym_valid (C, K) i32; hdr_ok (C, K) bool;
      bits_consumed (C, K) i32; ppm (C, K) f32; l2_row (C, K) i32
      (-1 = overflowed the compacted L2 batch; pass zeros when no
      compaction); busy_until0/next_det_min0 (C,) i32 carried global
      state; base i32 global index of det/sync origin; max_ppm f32
      (0 disables the gate).

    Returns dict: verdicts (C, K) i8, busy_until / next_det_min (C,)
    i32 final state, deferred_at (C,) i32 (-1 = none).
    """
    import jax.numpy as jnp

    K = det_idx.shape[1]

    def channel(count_c, det_c, sync_c, nsyms_c, hdr_c, bits_c, ppm_c,
                row_c, busy0, next0):
        def step(carry, slot):
            busy, nxt, stopped, deferred = carry
            k, det, sp, nsyms, hok, bits, pm, row = slot
            det_g = base + det.astype(jnp.int32)
            sp_g = base + sp.astype(jnp.int32)

            is_cand = k < count_c
            live = is_cand & ~stopped
            skip = live & ((det_g < nxt) | (det_g < busy))
            act = live & ~skip

            overflow = act & (row < 0)
            act = act & ~overflow

            short = act & (nsyms < _MIN_HDR_SYMS)
            defer_hdr = short & (not eof)
            eof_short = short & eof
            act = act & ~short

            hdr_rej = act & ~hok
            act = act & ~hdr_rej

            total = -(-bits // 3)
            trunc = act & (nsyms < total)
            defer_dat = trunc & (not eof)
            eof_trunc = trunc & eof
            act = act & ~trunc

            ppm_rej = act & (max_ppm > 0) & (jnp.abs(pm) > max_ppm)
            accept = act & ~ppm_rej

            verdict = jnp.where(
                ~is_cand, V_EMPTY,
                jnp.where(stopped, V_UNPROCESSED,
                jnp.where(skip, V_SKIP,
                jnp.where(overflow, V_L2_OVERFLOW,
                jnp.where(defer_hdr, V_DEFER,
                jnp.where(defer_dat, V_DEFER_DATA,
                jnp.where(eof_short, V_EOF_SHORT,
                jnp.where(hdr_rej, V_HDR_REJECT,
                jnp.where(eof_trunc, V_EOF_TRUNC,
                jnp.where(ppm_rej, V_PPM_REJECT,
                          V_ACCEPT)))))))))).astype(jnp.int8)

            new_busy = jnp.where(
                hdr_rej, sp_g + 9 * SPS,
                jnp.where(accept, sp_g + total.astype(jnp.int32) * SPS,
                          busy))
            deferring = defer_hdr | defer_dat
            advanced = (overflow | eof_short | hdr_rej | eof_trunc
                        | ppm_rej | accept)
            new_next = jnp.where(deferring, det_g,
                                 jnp.where(advanced, det_g + 1, nxt))
            new_deferred = jnp.where(deferring & (deferred < 0), det_g,
                                     deferred)
            new_stopped = stopped | deferring
            return ((new_busy, new_next, new_stopped, new_deferred),
                    verdict)

        ks = jnp.arange(K, dtype=jnp.int32)
        slots = (ks, det_c, sync_c, nsyms_c, hdr_c, bits_c, ppm_c,
                 row_c)
        (busy, nxt, _stopped, deferred), verdicts = jax.lax.scan(
            step, (busy0, next0, jnp.bool_(False), jnp.int32(-1)),
            slots)
        return verdicts, busy, nxt, deferred

    verdicts, busy, nxt, deferred = jax.vmap(channel)(
        count, det_idx, sync_idx, sym_valid, hdr_ok, bits_consumed,
        ppm, l2_row, jnp.asarray(busy_until0, jnp.int32),
        jnp.asarray(next_det_min0, jnp.int32))
    return {"verdicts": verdicts, "busy_until": busy,
            "next_det_min": nxt, "deferred_at": deferred}
