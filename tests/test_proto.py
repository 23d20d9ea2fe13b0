"""Protocol-stack unit tests: AVLC, XID, ACARS, X.25, reassembly."""
import numpy as np
import pytest

from dumpvdl2_tpu.config import MsgFilter, reset_config
from dumpvdl2_tpu.core.metadata import MsgMetadata
from dumpvdl2_tpu.proto.acars import ETB, ETX, NAK, STX, _crc16_arinc, acars_parse
from dumpvdl2_tpu.proto.avlc import avlc_parse, parse_dlc_addr
from dumpvdl2_tpu.proto.base import TextOut, tree_format_json, tree_format_text
from dumpvdl2_tpu.proto.reasm import ReasmContexts, ReasmStatus
from dumpvdl2_tpu.proto.x25 import x25_parse
from dumpvdl2_tpu.proto.xid import parse_freq, xid_parse
from dumpvdl2_tpu.sim import frame_with_fcs
from dumpvdl2_tpu.utils.bits import reverse_bits


@pytest.fixture(autouse=True)
def _fresh_config():
    reset_config()
    yield
    reset_config()


# ------------------------------------------------------------ AVLC helpers

def enc_dlc_addr(addr24: int, addr_type: int, status: int,
                 final: bool) -> bytes:
    """Inverse of parse_dlc_addr (for building test frames)."""
    val = (addr24 & 0xFFFFFF) | ((addr_type & 7) << 24) | ((status & 1) << 27)
    packed = reverse_bits(val, 28)
    out = bytes([
        ((packed >> 0) & 0x7F) << 1,
        ((packed >> 7) & 0x7F) << 1,
        ((packed >> 14) & 0x7F) << 1,
        (((packed >> 21) & 0x7F) << 1) | (1 if final else 0),
    ])
    return out


def make_avlc(src_addr: int, dst_addr: int, lcf: int, info: bytes,
              src_type: int = 1, dst_type: int = 4, cr: int = 0,
              ag: int = 0) -> bytes:
    frame = (enc_dlc_addr(dst_addr, dst_type, ag, False)
             + enc_dlc_addr(src_addr, src_type, cr, True)
             + bytes([lcf]) + info)
    return frame_with_fcs(frame)


def parse(frame: bytes):
    md = MsgMetadata(freq=136975000)
    return avlc_parse(frame, md, ReasmContexts())


def render(node) -> str:
    out = TextOut()
    tree_format_text(out, node)
    return out.getvalue()


def test_dlc_addr_roundtrip():
    raw = enc_dlc_addr(0xABCDEF, 5, 1, True)
    a = parse_dlc_addr(raw)
    assert a.addr == 0xABCDEF
    assert a.type == 5
    assert a.status == 1


def test_avlc_bad_fcs_rejected():
    frame = bytearray(make_avlc(0x123456, 0x654321, 0x01, b"hello"))
    frame[-1] ^= 0xFF
    node, msg_type = parse(bytes(frame))
    assert node is None


def test_avlc_sframe():
    # S frame: lcf & 3 == 1; sfunc=0 (RR), pf=1, rseq=5
    lcf = 0x01 | (0 << 2) | (1 << 4) | (5 << 5)
    node, msg_type = parse(make_avlc(0x123456, 0x654321, lcf, b""))
    assert msg_type & MsgFilter.AVLC_S
    text = render(node)
    assert "AVLC type: S (Receive Ready) P/F: 1 rseq: 5" in text
    assert "123456 (Aircraft" in text


# ------------------------------------------------------------------- ACARS

def make_acars_block(mode="2", reg=".N12345", label="H1", blk="2",
                     msg_num="M01A", flight="AB1234", text="#DFB TEST MSG",
                     suffix=ETX, with_crc=True) -> bytes:
    body = (mode + reg).encode() + bytes([NAK]) + label.encode() + \
        blk.encode() + bytes([STX]) + (msg_num + flight + text).encode() + \
        bytes([suffix])
    if with_crc:
        crc = _crc16_arinc(body)
        body += bytes([crc & 0xFF, crc >> 8])
    return body + b"\x7f"


def test_acars_downlink_parse():
    node = acars_parse(make_acars_block(), "air2gnd")
    assert not node.err
    assert node.crc_ok
    assert node.reg == ".N12345"
    assert node.label == "H1"
    assert node.block_id == "2"
    assert node.ack == "!"
    assert node.msg_num == "M01"
    assert node.msg_num_seq == "A"
    assert node.flight_id == "AB1234"
    assert node.sublabel == "DF"
    assert node.txt == " TEST MSG"


def test_acars_text_format():
    node = acars_parse(make_acars_block(), "air2gnd")
    text = render(node)
    assert "ACARS:" in text
    assert "Reg: .N12345 Flight: AB1234" in text
    assert "Mode: 2 Label: H1 Blk id: 2 Ack: ! Msg no.: M01A" in text
    assert "Sublabel: DF" in text


def test_acars_uplink_ack_only():
    body = ("2" + ".N54321").encode() + bytes([NAK]) + b"_d" + b"A"
    node = acars_parse(body, "gnd2air")
    assert not node.err
    assert node.txt == ""


def test_acars_via_avlc_routing():
    info = b"\xff\xff\x01" + make_acars_block()
    node, msg_type = parse(make_avlc(0xA12345, 0x104050, 0x00, info))
    assert msg_type & MsgFilter.AVLC_I
    assert msg_type & MsgFilter.SRC_AIR
    assert msg_type & MsgFilter.ACARS_DATA
    assert node.next is not None
    assert node.next.json_key == "acars"
    assert node.next.reg == ".N12345"


def test_acars_multiblock_reassembly():
    ctx = ReasmContexts()
    b1 = make_acars_block(blk="2", text="#DFBPART1-", suffix=ETB)
    b2 = make_acars_block(blk="3", text="PART2", suffix=ETX)
    from dumpvdl2_tpu.proto.acars import parse_acars
    n1, _ = parse_acars(b1, MsgFilter.SRC_AIR, ctx, rx_time=0.0)
    assert n1.reasm_status is ReasmStatus.IN_PROGRESS
    n2, _ = parse_acars(b2, MsgFilter.SRC_AIR, ctx, rx_time=1.0)
    assert n2.reasm_status is ReasmStatus.COMPLETE
    assert "PART1-" in n2.txt and n2.txt.endswith("PART2")


# --------------------------------------------------------------------- XID

def test_parse_freq_csc():
    mods, mhz = parse_freq(bytes([0x20 | 0x0E, 0x71]))  # field 0xE71 = 3697
    assert mhz == pytest.approx(136.975)
    assert mods == 2


def test_xid_gsif():
    # private group with conn mgmt (h=1, r=1 -> type GSIF when cr=0,pf=0)
    vdl_params = bytes([0x01, 0x01, 0x03])      # conn mgmt: h=1 r=1
    vdl_params += bytes([0xC8, 0x03, 0x1F, 0x58, 0x83])  # gs location
    group = bytes([0xF0]) + len(vdl_params).to_bytes(2, "big") + vdl_params
    buf = bytes([0x82]) + group + bytes([0x80, 0x00, 0x00])
    node, msg_type = xid_parse(0, 0, buf, 0)
    assert not node.err
    assert msg_type & MsgFilter.XID_GSIF
    text = render(node)
    assert "XID: Ground Station Information Frame" in text
    assert "Connection management: 03" in text
    assert "Ground station location:" in text


def test_xid_le():
    # no conn mgmt parameter -> h,r forced 1; cr=1 pf=0 -> XID_RSP_LE? ICAO:
    # type idx = (1<<3)|(0<<2)|(1<<1)|1 = 11 -> empty; use cr=1,pf=1 -> 15 LPM
    vdl_params = bytes([0x00, 0x02, 0x56, 0x32])   # param set id "V2"
    group = bytes([0xF0]) + len(vdl_params).to_bytes(2, "big") + vdl_params
    buf = bytes([0x82]) + group
    node, msg_type = xid_parse(1, 1, buf, 0)
    assert not node.err
    assert node.type == 15
    assert msg_type & MsgFilter.XID_NO_GSIF


def test_xid_via_avlc():
    vdl_params = bytes([0x01, 0x01, 0x03])
    group = bytes([0xF0]) + len(vdl_params).to_bytes(2, "big") + vdl_params
    info = bytes([0x82]) + group + bytes([0x80, 0x00, 0x00])
    lcf = 0x03 | (0x2B << 2)   # U frame, XID, P/F=0... XID=0x2b -> mfunc
    # U frame: lcf bits: type=3 (bits0-1), mfunc bits 2-7; XID cmd = 0x2b
    lcf = 0x03 | (0x2B << 2)
    node, msg_type = parse(make_avlc(0x104050, 0xA12345, lcf & 0xFF, info,
                                     src_type=4, dst_type=1))
    assert node.next is not None and node.next.json_key == "xid"
    assert not node.next.err


# -------------------------------------------------------------------- X.25

def x25(data: bytes, msg_type=MsgFilter.SRC_AIR, ctx=None):
    return x25_parse(data, msg_type, ctx or ReasmContexts(), 0.0,
                     0xA12345, 0x104050)


def test_x25_unparseable_gfi():
    node, _ = x25(b"TAF AMD KROC")
    assert node.err
    text = render(node)
    assert "-- Unparseable X.25 packet" in text
    assert "Data (12 bytes):" in text
    assert "54 41 46" in text


def test_x25_receive_ready():
    node, msg_type = x25(bytes([0x1B, 0xFF, 0x01]))
    assert not node.err
    assert msg_type & MsgFilter.X25_CONTROL
    assert "X.25 Receive Ready: grp: 11 chan: 255" in render(node)


def test_x25_clear_request_with_diag():
    node, _ = x25(bytes([0x1B, 0xFF, 0x13, 0x05, 0xF9]))
    text = render(node)
    assert "X.25 Clear Request" in text
    assert "Cause: 0x05 (Network congestion)" in text
    assert "Diagnostic code: 0xf9 (Unrecognized protocol ID)" in text


def test_x25_call_request_with_facilities():
    # addr block: 0 nibbles each; facilities: fast select + pkt size;
    # SNDCF: id c1, len 4, [version=1, 0, 0, compression=0x02]
    pkt = bytes([0x1B, 0xFF, 0x0B])
    pkt += bytes([0x00])                       # addr lengths
    pkt += bytes([0x05, 0x01, 0x80, 0x42, 0x09, 0x08])  # facilities
    pkt += bytes([0xC1, 0x04, 0x01, 0x00, 0x00, 0x02])  # SNDCF
    node, msg_type = x25(pkt)
    assert not node.err, render(node)
    text = render(node)
    assert "X.25 Call Request" in text
    assert "Fast Select: requested" in text
    assert "Max. packet size:" in text
    assert "From calling DTE: 256 bytes" in text
    assert "Compression support: LREF" in text


def test_x25_data_mbit_reassembly():
    ctx = ReasmContexts()
    # sseq 0, more=1
    p1 = bytes([0x1B, 0xFF, (0 << 5) | (1 << 4) | (0 << 1)]) + b"\x81AAAA"
    # sseq 1, more=0
    p2 = bytes([0x1B, 0xFF, (0 << 5) | (0 << 4) | (1 << 1)]) + b"BBBB"
    n1, _ = x25(p1, ctx=ctx)
    assert n1.reasm_status is ReasmStatus.IN_PROGRESS
    n2, _ = x25(p2, ctx=ctx)
    assert n2.reasm_status is ReasmStatus.COMPLETE
    # reassembled payload starts with 0x81 -> dispatched to CLNP
    assert n2.next is not None and n2.next.json_key == "clnp"


def test_x25_json():
    node, _ = x25(bytes([0x1B, 0xFF, 0x13, 0x00]))
    tree = tree_format_json(node)
    assert tree["x25"]["pkt_type_name"] == "Clear Request"
    assert tree["x25"]["clear_cause"] == 0
