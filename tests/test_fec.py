"""Unit tests for the bit-level FEC layer (L2 building blocks)."""
import numpy as np
import pytest

from dumpvdl2_tpu.constants import HDRFECLEN, HEADER_LEN, LFSR_IV, TRLEN
from dumpvdl2_tpu.fec import rs
from dumpvdl2_tpu.fec.header import (H_ROWS, SYND_WEIGHT, SYNDTABLE,
                                     decode_header, syndrome_of)
from dumpvdl2_tpu.fec.interleave import (burst_geometry, deinterleave_burst,
                                         get_fec_octetcount)
from dumpvdl2_tpu.fec.scramble import PRBS, descramble
from dumpvdl2_tpu.link.crc import crc16_ccitt, fcs_check
from dumpvdl2_tpu.link.unstuff import UnstuffError, frames_from_bits
from dumpvdl2_tpu.utils import bits as B

rng = np.random.default_rng(0)


# ---------------------------------------------------------------- scrambler

def test_prbs_matches_direct_lfsr():
    # Independent step-by-step LFSR (x^15+x+1), IV 0x6959
    lfsr = LFSR_IV
    want = []
    for _ in range(1000):
        bit = (lfsr ^ (lfsr >> 14)) & 1
        lfsr = (lfsr >> 1) | (bit << 14)
        want.append(bit)
    assert PRBS[:1000].tolist() == want


def test_descramble_involution():
    bits = rng.integers(0, 2, 777, dtype=np.uint8)
    assert np.array_equal(descramble(descramble(bits)), bits)


# ---------------------------------------------------------------- header FEC

def test_syndtable_consistent_and_minimal():
    for s in range(1 << HDRFECLEN):
        e = SYNDTABLE[s]
        assert syndrome_of(e) == s
        assert bin(e).count("1") == SYND_WEIGHT[s]
    # weight profile identical to the published decoder's table
    assert SYND_WEIGHT == [0, 1, 1, 2, 1, 2, 1, 1, 1, 1, 1, 1, 1, 2, 1, 1,
                           1, 1, 2, 1, 2, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1]


def test_header_single_and_double_error_correction():
    word = 0b10101 << HDRFECLEN  # arbitrary valid-looking content
    # build a codeword: find parity bits so syndrome == 0
    for fec in range(32):
        if syndrome_of(word | fec) == 0:
            word |= fec
            break
    assert syndrome_of(word) == 0
    corrected, s = decode_header(word)
    assert s == 0 and corrected == word
    for k in range(HEADER_LEN):
        got, s = decode_header(word ^ (1 << k))
        assert got == word, f"single-bit error at {k} not corrected"
        assert SYND_WEIGHT[s] == 1


# ----------------------------------------------------------------- RS codec

def test_rs_roundtrip_no_errors():
    data = rng.integers(0, 256, rs.KK, dtype=np.uint8)
    cw = rs.encode(data)
    out, n = rs.decode(cw)
    assert n == 0
    assert np.array_equal(out, cw)


@pytest.mark.parametrize("nerrs", [1, 2, 3])
def test_rs_corrects_errors(nerrs):
    data = rng.integers(0, 256, rs.KK, dtype=np.uint8)
    cw = rs.encode(data)
    bad = cw.copy()
    pos = rng.choice(rs.NN, nerrs, replace=False)
    for p in pos:
        bad[p] ^= rng.integers(1, 256)
    out, n = rs.decode(bad)
    assert n == nerrs
    assert np.array_equal(out, cw)


def test_rs_detects_too_many_errors():
    data = rng.integers(0, 256, rs.KK, dtype=np.uint8)
    cw = rs.encode(data)
    bad = cw.copy()
    for p in rng.choice(rs.NN, 6, replace=False):
        bad[p] ^= rng.integers(1, 256)
    out, n = rs.decode(bad)
    # 6 errors exceeds t=3: must not silently "correct" into the original
    assert n == -1 or not np.array_equal(out, cw)


@pytest.mark.parametrize("fec_octets", [2, 4])
def test_rs_shortened_block_with_erasures(fec_octets):
    # Shortened final block: parity positions beyond fec_octets are
    # declared erasures; with 1 real error the decoder must still win.
    data = rng.integers(0, 256, rs.KK, dtype=np.uint8)
    cw = rs.encode(data)
    bad = cw.copy()
    bad[rs.KK + fec_octets:] = 0          # absent parity -> zeros
    bad[10] ^= 0x55                        # one real error
    out, n = rs.rs_verify(bad, fec_octets)
    assert n >= 1
    assert np.array_equal(out[:rs.KK + fec_octets], cw[:rs.KK + fec_octets])


def test_rs_erasure_only_decode():
    data = rng.integers(0, 256, rs.KK, dtype=np.uint8)
    cw = rs.encode(data)
    bad = cw.copy()
    bad[rs.KK + 4:] = 0
    out, n = rs.rs_verify(bad, 4)
    assert np.array_equal(out[:rs.KK + 4], cw[:rs.KK + 4])


# ------------------------------------------------------------- deinterleave

def test_fec_octetcount_thresholds():
    assert get_fec_octetcount(0) == 0
    assert get_fec_octetcount(2) == 0
    assert get_fec_octetcount(3) == 2
    assert get_fec_octetcount(30) == 2
    assert get_fec_octetcount(31) == 4
    assert get_fec_octetcount(67) == 4
    assert get_fec_octetcount(68) == 6
    assert get_fec_octetcount(249) == 6


def _reference_style_deinterleave(octets, datalen_octets):
    """Brute-force emulation of the row/column fill for cross-checking."""
    num_blocks, last_len, fec_octets = burst_geometry(datalen_octets)
    tab = np.zeros((num_blocks, 255), dtype=np.uint8)

    def fill(stream, rows, fillwidth, offset, last_row_len):
        row, col = 0, offset
        last = last_row_len + offset
        it = iter(stream)
        for val in it:
            while row == rows - 1 and col >= last and rows > 1:
                row = 0
                col += 1
            if rows == 1 and col >= last:
                break
            tab[row][col] = val
            row += 1
            if row == rows:
                row = 0
                col += 1

    fill(octets[:datalen_octets], num_blocks, 249, 0, last_len)
    last_fec = get_fec_octetcount(last_len)
    fec_rows = num_blocks if last_fec > 0 else num_blocks - 1
    if fec_rows:
        lr = (datalen_octets + fec_octets - datalen_octets) % 6 or 6
        lr = last_fec if fec_rows == num_blocks else 6
        fill(octets[datalen_octets:], fec_rows, 6, 249, lr)
    return tab


@pytest.mark.parametrize("datalen_octets", [1, 3, 17, 100, 248, 249, 250,
                                            498, 500, 1000, 2048])
def test_deinterleave_matches_rowcol_fill(datalen_octets):
    num_blocks, last_len, fec_octets = burst_geometry(datalen_octets)
    octets = rng.integers(1, 256, datalen_octets + fec_octets, dtype=np.uint8)
    tab, nb, ll = deinterleave_burst(octets, datalen_octets)
    assert (nb, ll) == (num_blocks, last_len)
    want = _reference_style_deinterleave(octets, datalen_octets)
    assert np.array_equal(tab, want)


def test_deinterleave_single_full_block_identity():
    octets = rng.integers(0, 256, 255, dtype=np.uint8)
    tab, nb, ll = deinterleave_burst(octets, 249)
    assert nb == 1 and ll == 249
    assert np.array_equal(tab[0], octets)


# ---------------------------------------------------------------------- CRC

def test_crc16_known_vector():
    # CRC-16/X-25 style usage: appendable FCS with magic residual
    data = b"123456789"
    crc = crc16_ccitt(data) ^ 0xFFFF
    # CRC-16/X-25 check value for "123456789" is 0x906E
    assert crc == 0x906E


def test_fcs_residual():
    payload = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    crc = crc16_ccitt(payload) ^ 0xFFFF
    framed = payload + bytes([crc & 0xFF, crc >> 8])
    assert fcs_check(framed)
    assert not fcs_check(framed[:-1] + bytes([framed[-1] ^ 1]))


# ------------------------------------------------------------------ unstuff

def _stuff(frame_octets: list[int]) -> list[int]:
    """Build a stuffed bitstream flag + frame + flag (LSB-first octets)."""
    bits = []
    for o in frame_octets:
        bits.extend((o >> i) & 1 for i in range(8))
    out = [0, 1, 1, 1, 1, 1, 1, 0]
    ones = 0
    for b in bits:
        out.append(b)
        if b == 1:
            ones += 1
            if ones == 5:
                out.append(0)
                ones = 0
        else:
            ones = 0
    out.extend([0, 1, 1, 1, 1, 1, 1, 0])
    return out


def test_unstuff_roundtrip():
    frame = [0x12, 0xFF, 0x7E, 0xAA, 0x3F, 0xF8]
    bits = np.array(_stuff(frame), dtype=np.uint8)
    frames = list(frames_from_bits(bits))
    assert len(frames) >= 1
    got = B.pack_lsb(frames[0])
    assert got.tolist() == frame


def test_unstuff_multiframe():
    f1, f2 = [0x01, 0x02, 0x03], [0xFE, 0xFD]
    bits = np.array(_stuff(f1) + _stuff(f2), dtype=np.uint8)
    frames = [f for f in frames_from_bits(bits) if f.size]
    assert len(frames) == 2
    assert B.pack_lsb(frames[0]).tolist() == f1
    assert B.pack_lsb(frames[1]).tolist() == f2


def test_unstuff_seven_ones_invalid():
    bits = np.array([0, 1, 1, 1, 1, 1, 1, 0] + [1] * 7 + [0] * 9,
                    dtype=np.uint8)
    with pytest.raises(UnstuffError):
        list(frames_from_bits(bits))


# ----------------------------------------------------------------- bit utils

def test_pack_unpack_roundtrip():
    data = rng.integers(0, 256, 64, dtype=np.uint8)
    assert np.array_equal(B.pack_lsb(B.unpack_lsb(data)), data)
    assert np.array_equal(B.pack_msb(B.unpack_msb(data)), data)


def test_reverse_bits():
    assert B.reverse_bits(0b1, 17) == 1 << 16
    assert B.reverse_bits(0b10110, 5) == 0b01101
