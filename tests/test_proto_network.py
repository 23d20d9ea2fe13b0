"""CLNP / COTP / ES-IS / IDRP parser tests with synthetic PDUs."""
import numpy as np
import pytest

from dumpvdl2_tpu.config import MsgFilter, reset_config
from dumpvdl2_tpu.proto.base import TextOut, tree_format_json, tree_format_text
from dumpvdl2_tpu.proto.clnp import (clnp_compressed_data_pdu_parse,
                                     clnp_pdu_parse)
from dumpvdl2_tpu.proto.cotp import cotp_concatenated_pdu_parse
from dumpvdl2_tpu.proto.esis import esis_pdu_parse
from dumpvdl2_tpu.proto.idrp import idrp_pdu_parse
from dumpvdl2_tpu.proto.reasm import ReasmContexts, ReasmStatus


@pytest.fixture(autouse=True)
def _fresh_config():
    reset_config()
    yield
    reset_config()


def render(node) -> str:
    out = TextOut()
    tree_format_text(out, node)
    return out.getvalue()


# --------------------------------------------------------------------- COTP

def make_cotp_dt(payload: bytes, seq=0, eot=1, dst_ref=0x1234) -> bytes:
    # normal format DT: LI=4, code 0xF0, dst_ref, [EOT|seq]
    hdr = bytes([4, 0xF0, dst_ref >> 8, dst_ref & 0xFF,
                 (0x80 if eot else 0) | (seq & 0x7F)])
    return hdr + payload


def test_cotp_dt_single():
    node, _ = cotp_concatenated_pdu_parse(
        make_cotp_dt(b"\xde\xad\xbe\xef"), 0, ReasmContexts(), 0.0, 1, 2)
    text = render(node)
    assert "X.224 COTP Data:" in text
    assert "dst_ref: 0x1234" in text
    assert "sseq: 0 req_of_ack: 0 EoT: 1" in text
    # unknown payload hexdumped by the next node
    assert "de ad be ef" in text


def test_cotp_dt_reassembly():
    ctx = ReasmContexts()
    n1, _ = cotp_concatenated_pdu_parse(
        make_cotp_dt(b"AAAA", seq=0, eot=0), 0, ctx, 0.0, 1, 2)
    assert n1.pdu_list[0].reasm_status is ReasmStatus.IN_PROGRESS
    n2, _ = cotp_concatenated_pdu_parse(
        make_cotp_dt(b"BBBB", seq=1, eot=1), 0, ctx, 1.0, 1, 2)
    assert n2.pdu_list[0].reasm_status is ReasmStatus.COMPLETE
    assert "41 41 41 41 42 42 42 42" in render(n2)


def test_cotp_cr_with_params():
    # CR: LI=6+params, code 0xE0, dst_ref 0, src_ref, class/options
    params = bytes([0xC0, 0x01, 0x0A])        # TPDU size 1024
    li = 6 + len(params)
    pdu = bytes([li, 0xE0, 0, 0, 0xAB, 0xCD, 0x40]) + params
    node, _ = cotp_concatenated_pdu_parse(pdu, 0, ReasmContexts(), 0.0, 1, 2)
    text = render(node)
    assert "X.224 COTP Connect Request:" in text
    assert "src_ref: 0xabcd" in text
    assert "Protocol class: 4" in text
    assert "TPDU size (bytes): 1024" in text


def test_cotp_concatenated():
    # AK (normal, LI=4) followed by DT
    ak = bytes([4, 0x60, 0x00, 0x07, 0x05])
    buf = ak + make_cotp_dt(b"XY")
    node, _ = cotp_concatenated_pdu_parse(buf, 0, ReasmContexts(), 0.0, 1, 2)
    assert len(node.pdu_list) == 2
    text = render(node)
    assert "X.224 COTP Data Ack:" in text
    assert "X.224 COTP Data:" in text


def test_cotp_dr_with_x225_reason():
    pdu = bytes([6, 0x80, 0, 1, 0, 2, 128]) + bytes([1])
    node, _ = cotp_concatenated_pdu_parse(pdu, 0, ReasmContexts(), 0.0, 1, 2)
    text = render(node)
    assert "Reason: 128 (Normal disconnect)" in text
    assert "X.225 disconnect reason: 1" in text


# --------------------------------------------------------------------- CLNP

def make_clnp_dt(payload: bytes, sp=0, ms=0, pdu_id=0, offset=0,
                 total=0) -> bytes:
    dst = bytes([3, 0x47, 0x00, 0x27])
    src = bytes([2, 0x49, 0x99])
    seg = b""
    if sp:
        seg = pdu_id.to_bytes(2, "big") + offset.to_bytes(2, "big") + \
            total.to_bytes(2, "big")
    hdr_len = 9 + len(dst) + len(src) + len(seg)
    flags = 0x1C | (0x80 if sp else 0) | (0x40 if ms else 0)
    hdr = bytes([0x81, hdr_len, 1, 20, flags, 0, 0, 0, 0]) + dst + src + seg
    return hdr + payload


def test_clnp_dt_basic():
    pdu = make_clnp_dt(make_cotp_dt(b"PAYLOAD!"))
    node, _ = clnp_pdu_parse(pdu, 0, ReasmContexts(), 0.0, 1, 2)
    text = render(node)
    assert "X.233 CLNP Data:" in text
    assert "Src NSAP: 49 99" in text
    assert "Lifetime: 10.0 sec" in text
    assert "X.224 COTP Data:" in text


def test_clnp_segmentation_reassembly():
    ctx = ReasmContexts()
    p1 = make_clnp_dt(b"AAAA", sp=1, ms=1, pdu_id=7, offset=0, total=8)
    p2 = make_clnp_dt(b"BBBB", sp=1, ms=0, pdu_id=7, offset=4, total=8)
    n1, _ = clnp_pdu_parse(p1, 0, ctx, 0.0, 1, 2)
    assert n1.reasm_status is ReasmStatus.IN_PROGRESS
    n2, _ = clnp_pdu_parse(p2, 0, ctx, 1.0, 1, 2)
    assert n2.reasm_status is ReasmStatus.COMPLETE
    assert "41 41 41 41 42 42 42 42" in render(n2)


def test_clnp_compressed():
    # uncompressed-unfragmented compressed-header PDU type 0 with payload
    pdu = bytes([0x0E, 20, 0x00, 0x05]) + make_cotp_dt(b"Z")
    node, _ = clnp_compressed_data_pdu_parse(pdu, 0, ReasmContexts(),
                                             0.0, 1, 2)
    text = render(node)
    assert "X.233 CLNP Data (compressed header):" in text
    assert "LRef: 0x5" in text
    assert "X.224 COTP Data:" in text


def test_clnp_er_nested():
    inner = make_clnp_dt(b"")
    # discard-reason option: code 0xC1, len 2, code+octet
    opts = bytes([0xC1, 0x02, 0x02, 0x00])
    dst = bytes([1, 0x47])
    src = bytes([1, 0x49])
    hdr_len = 9 + 2 + 2 + len(opts)
    hdr = bytes([0x81, hdr_len, 1, 10, 0x01, 0, 0, 0, 0]) + dst + src + opts
    node, _ = clnp_pdu_parse(hdr + inner, 0, ReasmContexts(), 0.0, 1, 2)
    text = render(node)
    assert "X.233 CLNP Error Report:" in text
    assert "Discard reason: 2 (Incorrect checksum)" in text
    assert "Erroneous NPDU:" in text
    assert "X.233 CLNP Data:" in text


# -------------------------------------------------------------------- ES-IS

def test_esis_ish():
    net = bytes.fromhex("470027015841410000000200")
    opts = bytes([0x81, 0x02, 0x1F, 0xFF])     # mobile subnet caps
    pdu_len = 9 + 1 + len(net) + len(opts)
    pdu = bytes([0x82, pdu_len, 1, 0, 4, 0x00, 0x1E, 0, 0]) + \
        bytes([len(net)]) + net + opts
    node, msg_type = esis_pdu_parse(pdu, 0)
    assert not node.err
    assert msg_type & MsgFilter.ESIS
    text = render(node)
    assert "ES-IS IS Hello: Hold Time: 30 sec" in text
    assert "NET: 47 00 27" in text
    assert "Permitted traffic: all" in text
    assert "Supported ATSC classes: all" in text


# --------------------------------------------------------------------- IDRP

def make_idrp_hdr(pdu_type: int, body: bytes, seq=1, ack=2) -> bytes:
    total = 30 + len(body)
    return bytes([0x85]) + total.to_bytes(2, "big") + bytes([pdu_type]) + \
        seq.to_bytes(4, "big") + ack.to_bytes(4, "big") + \
        bytes([3, 4]) + bytes(16) + body


def test_idrp_keepalive():
    node, msg_type = idrp_pdu_parse(make_idrp_hdr(4, b""), 0)
    assert not node.err
    assert msg_type & MsgFilter.IDRP_KEEPALIVE
    assert "IDRP Keepalive: seq: 1 ack: 2 credit_offered: 3 " \
           "credit_avail: 4" in render(node)


def test_idrp_error_fsm():
    body = bytes([4, (2 << 4) | 5])    # FSM error: Update PDU, ESTABLISHED
    node, msg_type = idrp_pdu_parse(make_idrp_hdr(3, body), 0)
    assert msg_type & MsgFilter.IDRP_NO_KEEPALIVE
    text = render(node)
    assert "Code: 4 (FSM error)" in text
    assert "Erroneous BISPDU type: Update" in text
    assert "FSM state: ESTABLISHED" in text


def test_idrp_open():
    rdi = bytes.fromhex("470027")
    body = bytes([1]) + (60).to_bytes(2, "big") + (1024).to_bytes(2, "big")
    body += bytes([len(rdi)]) + rdi
    body += bytes([1, 2, 13, 15])      # 1 ribatt: 2 attrs (hop count, capacity)
    body += bytes([0])                 # no confed ids
    body += bytes([1])                 # auth mech: simple checksum
    node, _ = idrp_pdu_parse(make_idrp_hdr(1, body), 0)
    assert not node.err, render(node)
    text = render(node)
    assert "IDRP Open:" in text
    assert "Hold Time: 60 seconds" in text
    assert "Max. PDU size: 1024 octets" in text
    assert "Source RDI: 47 00 27" in text
    assert "RibAtt #0:" in text
    assert "RD hop count" in text
    assert "Auth mechanism: simple checksum" in text


def test_idrp_update_with_nlri():
    # withdrawn: 1 route; no attributes; one CLNP NLRI
    prefix = bytes.fromhex("47002701")
    nlri = bytes([1, 1, 0x81]) + (1 + len(prefix)).to_bytes(2, "big") + \
        bytes([32]) + prefix
    body = (1).to_bytes(2, "big") + (42).to_bytes(4, "big") + \
        (0).to_bytes(2, "big") + nlri
    node, _ = idrp_pdu_parse(make_idrp_hdr(2, body), 0)
    assert not node.err, render(node)
    text = render(node)
    assert "Withdrawn Routes:" in text
    assert "ID: 42" in text
    assert "Protocol: CLNP" in text
    assert "Prefix length: 32" in text
    assert "Dest. address prefix: 47 00 27 01" in text
    tree = tree_format_json(node)
    assert tree["idrp"]["nlri_list"][0]["prefix_len"] == 32
