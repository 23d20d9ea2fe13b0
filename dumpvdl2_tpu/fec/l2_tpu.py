"""Device-side batched L2 burst decode: symbols -> RS-corrected octets.

Runs the whole bit-level decode chain of the reference's
``decode_vdl2_burst`` (decode.c:196-380) for a BATCH of candidate
bursts in one fused XLA computation on TPU:

    symbols -> bits -> PRBS descramble (XOR) -> (25,20) header FEC
    -> transmission length / RS geometry -> octet packing
    -> deinterleave (vectorized gather) -> batched RS(255,249)
    errors+erasures decode (fec/rs_tpu.py, MXU syndromes).

Only HDLC bit-unstuffing + CRC stay on the host (inherently
sequential, tiny per frame).  The scalar path (burst.decode_burst)
remains the executable spec; tests/test_burst.py asserts parity.

Everything is static-shaped: a candidate batch B is padded to a
bucket, geometry is carried as per-burst scalars, and invalid rows
decode with fec_octets == 0 (a no-op in rs_verify_batch).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (HDRFECLEN, HEADER_LEN, MAX_FRAME_LENGTH,
                         MAX_FRAME_LENGTH_CORRECTED, RS_K, RS_N, TRLEN)
from .header import H_ROWS, SYND_WEIGHT, SYNDTABLE
from .rs_tpu import rs_verify_batch
from .scramble import PRBS

# Worst-case burst geometry (decode.c:45-48): datalen <= 0x3FFF bits
# -> 2048 data octets -> 9 RS blocks -> 8*6+4 = 52 FEC octets.
MAX_DATA_OCT = (MAX_FRAME_LENGTH + 7) // 8              # 2048
MAX_BLOCKS = -(-MAX_DATA_OCT // RS_K)                   # 9
MAX_TOTAL_OCT = MAX_DATA_OCT + (MAX_BLOCKS - 1) * (RS_N - RS_K) + 4  # 2100

_SYNDTABLE = jnp.asarray(np.array(SYNDTABLE, np.int32))
_SYND_WEIGHT = jnp.asarray(np.array(SYND_WEIGHT, np.int32))
_H_ROWS = np.array(H_ROWS, np.int64)


def _parity32(v: jax.Array) -> jax.Array:
    """Bitwise parity of each int32 element (VPU shift/xor fold)."""
    v = v ^ (v >> 16)
    v = v ^ (v >> 8)
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & 1


def _fec_octetcount(last_len: jax.Array) -> jax.Array:
    """get_fec_octetcount (decode.c:124-133) as nested selects."""
    return jnp.where(last_len < 3, 0,
                     jnp.where(last_len < 31, 2,
                               jnp.where(last_len < 68, 4, 6)))


@partial(jax.jit, static_argnames=("max_symbols", "rs_burst_cap"))
def l2_decode_batch(symbols: jax.Array, max_symbols: int,
                    power: jax.Array | None = None,
                    rs_burst_cap: int | None = None):
    """Decode a batch of candidate bursts from their raw D8PSK symbols.

    Args:
      symbols: (B, S) uint8 gray-decoded 3-bit symbols, S == max_symbols.
      power: optional (B, S) f32 per-symbol |iq|^2; when given, the
        output gains "frame_pwr" (B,) — the mean power over each
        burst's actual symbol count (decode.c:268-269) — so the host
        never needs the full power array.
    Returns a dict of per-burst arrays:
      syndrome (B,) int32, synd_weight (B,) int32,
      reserved_bad / too_long / no_fec / hdr_ok (B,) bool,
      datalen (B,) int32 bits, datalen_octets (B,) int32,
      num_blocks (B,) int32, last_len (B,) int32,
      bits_consumed (B,) int32,
      blocks (B, MAX_BLOCKS, 255) uint8 RS-corrected codeword rows,
      counts (B, MAX_BLOCKS) int32 per-row RS outcome (-1 failure),
      fec_row (B, MAX_BLOCKS) int32 parity octets carried per row.

    ``rs_burst_cap``: when set (< B), the heavy payload stages (octet
    packing, deinterleave gather, RS) run only for the first
    ``rs_burst_cap`` hdr-ok bursts — the same second-stage compaction
    ``core/pipeline._compact_blocks`` applies to the TRANSFER, moved
    before the COMPUTE.  blocks/counts/fec_row then have rs_burst_cap
    rows and ``blocks_row`` maps burst index -> compacted row (-1 =
    overflow, reported by the host as decoder.errors.l2_overflow —
    identical degradation semantics, ~4x less device work at wideband
    where the candidate cap far exceeds live traffic).
    """
    B, S = symbols.shape
    assert S == max_symbols
    nbits = 3 * S

    # symbols -> bits (MSB of each 3-bit symbol first, demod.c:274)
    shifts = jnp.array([2, 1, 0], jnp.int32)
    bits = ((symbols.astype(jnp.int32)[:, :, None] >> shifts) & 1)
    bits = bits.reshape(B, nbits)
    clear = bits ^ jnp.asarray(PRBS[:nbits], jnp.int32)[None, :]

    # ---- (25,20) header FEC (decode.c:111-122) ----------------------
    w_hdr = (1 << jnp.arange(HEADER_LEN - 1, -1, -1, dtype=jnp.int32))
    word = (clear[:, :HEADER_LEN] * w_hdr[None, :]).sum(axis=1)
    word = word & ((1 << (TRLEN + HDRFECLEN)) - 1)      # zero reserved bits
    synd = jnp.zeros_like(word)
    for i, row in enumerate(_H_ROWS):
        synd = synd | (_parity32(word & jnp.int32(row))
                       << (HDRFECLEN - 1 - i))
    corrected = word ^ _SYNDTABLE[synd]
    weight = _SYND_WEIGHT[synd]
    reserved_bad = (corrected >> (TRLEN + HDRFECLEN)) != 0

    trfield = (corrected >> HDRFECLEN) & ((1 << TRLEN) - 1)
    datalen = jnp.zeros_like(trfield)
    for i in range(TRLEN):                              # bit-reverse TRLEN
        datalen = datalen | (((trfield >> i) & 1) << (TRLEN - 1 - i))
    too_long = ((synd != 0) & (datalen > MAX_FRAME_LENGTH_CORRECTED)) \
        | (datalen > MAX_FRAME_LENGTH)

    # ---- geometry (burst_geometry / decode.c:222-258) ----------------
    doct = (datalen + 7) // 8
    q, r = doct // RS_K, doct % RS_K
    num_blocks = q + (r != 0)
    last_len = jnp.where(r == 0, RS_K, r)
    fec_last = jnp.where(r == 0, jnp.int32(0), _fec_octetcount(r))
    fec_total = q * (RS_N - RS_K) + fec_last
    no_fec = fec_total == 0
    hdr_ok = ~reserved_bad & ~too_long & ~no_fec
    # last row's parity count (r == 0 -> full 6-octet final block)
    lf = jnp.where(r == 0, RS_N - RS_K, fec_last)
    bits_consumed = HEADER_LEN + 8 * (doct + fec_total)

    # Gate geometry of rejected bursts to zero so downstream index math
    # stays in range and RS rows skip (fec_row == 0).
    nb = jnp.where(hdr_ok, num_blocks, 0)

    # ---- optional burst compaction before the payload stages ---------
    blocks_row = None
    if rs_burst_cap is not None and rs_burst_cap < B:
        order = jnp.argsort(~hdr_ok, stable=True).astype(jnp.int32)
        sel = order[:rs_burst_cap]
        blocks_row = jnp.full((B,), -1, jnp.int32)
        blocks_row = blocks_row.at[sel].set(
            jnp.arange(rs_burst_cap, dtype=jnp.int32))
        clear_p, nb_p = clear[sel], nb[sel]
        hdr_p, ll_p = hdr_ok[sel], last_len[sel]
        lf_p, doct_p = lf[sel], doct[sel]
    else:
        clear_p, nb_p, hdr_p = clear, nb, hdr_ok
        ll_p, lf_p, doct_p = last_len, lf, doct
    Bp = clear_p.shape[0]

    # ---- octet packing (LSB-first, bitstream_read_lsbfirst order) ----
    w_oct = (1 << jnp.arange(8, dtype=jnp.int32))
    po = clear_p[:, HEADER_LEN:HEADER_LEN + 8 * MAX_TOTAL_OCT]
    octets = (po.reshape(Bp, MAX_TOTAL_OCT, 8) * w_oct[None, None, :]) \
        .sum(axis=2)                                    # (Bp, 2100) int32

    # ---- deinterleave as a gather (fec/interleave.py mapping) --------
    # Destination cell (row, col) of the (nb, 255) table takes
    # transmission index  col*(nb-1) + min(col, cpr) + row  where cpr is
    # the shortened final row's column count for that region.
    rows = jnp.arange(MAX_BLOCKS, dtype=jnp.int32)[None, :, None]
    cols = jnp.arange(RS_N, dtype=jnp.int32)[None, None, :]
    nb_ = nb_p[:, None, None]
    ll_ = jnp.where(hdr_p, ll_p, 0)[:, None, None]
    lf_ = jnp.where(hdr_p, lf_p, 0)[:, None, None]
    doct_ = jnp.where(hdr_p, doct_p, 0)[:, None, None]

    is_data = cols < RS_K
    cf = cols - RS_K                                    # FEC-region column
    src_data = cols * (nb_ - 1) + jnp.minimum(cols, ll_) + rows
    src_fec = doct_ + cf * (nb_ - 1) + jnp.minimum(cf, lf_) + rows
    src = jnp.where(is_data, src_data, src_fec)
    cpr = jnp.where(is_data,
                    jnp.where(rows < nb_ - 1, RS_K, ll_),
                    jnp.where(rows < nb_ - 1, RS_N - RS_K, lf_))
    valid = (rows < nb_) & (jnp.where(is_data, cols, cf) < cpr)
    src = jnp.clip(jnp.where(valid, src, 0), 0, MAX_TOTAL_OCT - 1)
    tab = jnp.take_along_axis(octets, src.reshape(Bp, -1), axis=1)
    tab = tab.reshape(Bp, MAX_BLOCKS, RS_N) * valid     # pad cells zero

    # ---- batched RS(255,249) -----------------------------------------
    row_is_last = rows[0, :, 0] == (nb_p[:, None] - 1)  # (Bp, MAX_BLOCKS)
    fec_row = jnp.where(rows[0, :, 0] < nb_p[:, None] - 1,
                        RS_N - RS_K,
                        jnp.where(row_is_last, lf_p[:, None], 0))
    fec_row = jnp.where(hdr_p[:, None], fec_row, 0).astype(jnp.int32)
    corr, counts = rs_verify_batch(
        tab.reshape(Bp * MAX_BLOCKS, RS_N).astype(jnp.uint8),
        fec_row.reshape(Bp * MAX_BLOCKS))
    extra = {}
    if blocks_row is not None:
        extra["blocks_row"] = blocks_row
    if power is not None:
        total_syms = jnp.maximum(-(-bits_consumed // 3), 1)
        sidx = jnp.arange(S, dtype=jnp.int32)
        msk = sidx[None, :] < total_syms[:, None]
        extra["frame_pwr"] = jnp.where(
            hdr_ok,
            (power * msk).sum(axis=1) / total_syms.astype(jnp.float32),
            0.0)
    return {
        **extra,
        "syndrome": synd, "synd_weight": weight,
        "reserved_bad": reserved_bad, "too_long": too_long,
        "no_fec": no_fec, "hdr_ok": hdr_ok,
        "datalen": datalen, "datalen_octets": doct,
        "num_blocks": num_blocks, "last_len": last_len,
        "bits_consumed": bits_consumed,
        "blocks": corr.reshape(Bp, MAX_BLOCKS, RS_N),
        "counts": counts.reshape(Bp, MAX_BLOCKS),
        "fec_row": fec_row,
    }
