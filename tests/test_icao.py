"""End-to-end ICAO application-layer tests: construct full ULCS stacks
with the UPER encoder and run them through icao_apdu_parse, checking
the rendered protocol tree (reference behavior: icao.c:626-658).
"""
import pytest

from dumpvdl2_tpu.config import MsgFilter
from dumpvdl2_tpu.proto import icao
from dumpvdl2_tpu.proto.asn1 import runtime as rt
from dumpvdl2_tpu.proto.asn1.tables_icao import SCHEMA
from dumpvdl2_tpu.proto.base import TextOut, tree_format_json, \
    tree_format_text


def render(node):
    out = TextOut()
    tree_format_text(out, node)
    return out.getvalue()


def bitstr(data: bytes):
    return (data, len(data) * 8)


def make_uplink_msg():
    return {
        "header": {"messageIdNumber": 7,
                   "dateTime": {"date": {"year": 2026, "month": 8,
                                         "day": 17},
                                "timehhmmss": {
                                    "hoursminutes": {"hours": 10,
                                                     "minutes": 30},
                                    "seconds": 0}}},
        "messageData": {"elementIds": [
            ("uM20Level", ("singleLevel", ("levelFlightLevel", 350)))]},
    }


def wrap_protected_uplink(msg) -> bytes:
    enc = rt.encode(SCHEMA, "ATCUplinkMessage", msg)
    return rt.encode(SCHEMA, "ProtectedGroundPDUs",
                     ("send", {"protectedMessage": bitstr(enc),
                               "integrityCheck": bitstr(b"\x12\x34")}))


def wrap_fed(payload: bytes, pci: int) -> bytes:
    fed = {"data": {"presentation-context-identifier": pci,
                    "presentation-data-values":
                        ("arbitrary", bitstr(payload))}}
    return rt.encode(SCHEMA, "Fully_encoded_data", fed)


def test_cpdlc_uplink_via_fed_user_ase():
    payload = wrap_protected_uplink(make_uplink_msg())
    buf = wrap_fed(payload, 3)
    assert (buf[0] & 0x80) == 0     # must take the null-encoding path
    node, msg_type = icao.icao_apdu_parse(buf, MsgFilter.SRC_GND)
    assert msg_type & MsgFilter.CPDLC
    text = render(node)
    assert "CPDLC Uplink Message" in text
    assert "CLIMB TO [level]" in text
    assert "FL350" in text or "350" in text
    js = tree_format_json(node)
    assert "cpdlc" in js


def test_cpdlc_downlink_wilco_via_fed():
    msg = {
        "header": {"messageIdNumber": 1,
                   "dateTime": {"date": {"year": 2026, "month": 8,
                                         "day": 17},
                                "timehhmmss": {
                                    "hoursminutes": {"hours": 1,
                                                     "minutes": 2},
                                    "seconds": 3}}},
        "messageData": {"elementIds": [("dM0NULL", None)]},
    }
    enc = rt.encode(SCHEMA, "ATCDownlinkMessage", msg)
    payload = rt.encode(
        SCHEMA, "ProtectedAircraftPDUs",
        ("send", {"protectedMessage": bitstr(enc),
                  "integrityCheck": bitstr(b"\xAA\xBB")}))
    buf = wrap_fed(payload, 3)
    node, msg_type = icao.icao_apdu_parse(buf, MsgFilter.SRC_AIR)
    assert msg_type & MsgFilter.CPDLC
    text = render(node)
    assert "CPDLC Downlink Message" in text
    assert "WILCO" in text


def test_cm_logon_via_acse_x225():
    cm = ("cmLogonRequest", {
        "aircraftFlightIdentification": "BAW123",
        "cMLongTSAP": {"rDP": b"\x41\x42\x43\x44\x45",
                       "shortTsap": {"locSysNselTsel": b"0123456789"}},
        "facilityDesignation": "EGLL",
    })
    cm_enc = rt.encode(SCHEMA, "CMAircraftMessage", cm)
    aarq = ("aarq", {
        "application-context-name": (1, 3, 27, 3, 0),
        "calling-AE-qualifier": ("ae-qualifier-form2", 1),
        "user-information": {
            "data": {"encoding": ("arbitrary", bitstr(cm_enc))}},
    })
    acse_enc = rt.encode(SCHEMA, "ACSE_apdu", aarq)
    # X.225 Short Connect + X.226 PPCI (UPER)
    buf = bytes([0xE8, 0x02]) + acse_enc
    node, msg_type = icao.icao_apdu_parse(buf, MsgFilter.SRC_AIR)
    assert msg_type & MsgFilter.CM
    text = render(node)
    assert "X.225 Session SPDU: Short Connect" in text
    assert "X.227 ACSE Associate Request" in text
    assert "BAW123" in text
    js = tree_format_json(node)
    assert "x225_spdu" in js


def test_adsc_v2_report_two_pass():
    # generate a structurally valid ADSPositiveAcknowledgement
    import random
    from test_asn1 import _gen_value
    rng = random.Random(11)
    ack = _gen_value(SCHEMA, "ADSPositiveAcknowledgement", rng)
    ack_enc = rt.encode(SCHEMA, "ADSPositiveAcknowledgement", ack)
    # generate a valid outer envelope, then graft the real inner
    # encoding into the aDSPositiveAck BIT STRING
    pa = _gen_value(SCHEMA, "PositiveAcknowledgement", rng)
    pa["ic-positive-ack"]["aDSPositiveAck"] = bitstr(ack_enc)
    pdus = {
        "timestamp": _gen_value(SCHEMA, "PMADSCDateTimeGroup", rng),
        "adsAircraftPdu": ("aDS-positive-acknowledgement-PDU", pa),
    }
    buf = rt.encode(SCHEMA, "ADSAircraftPDUs", pdus)
    node, msg_type = icao.icao_apdu_parse(wrap_fed(buf, 3),
                                          MsgFilter.SRC_AIR)
    assert msg_type & MsgFilter.ADSC, render(node)
    text = render(node)
    assert len(text) > 0


def test_x225_srf_refusal_flags():
    node, _ = icao.x225_spdu_parse(bytes([0xE0 | 0x3]), 0)
    text = render(node)
    assert "Short Refuse" in text
    assert "Refusal: persistent" in text
    assert "Transport connection: release" in text


def test_garbage_returns_unknown():
    node, msg_type = icao.icao_apdu_parse(b"\x00\x01\x02\x03",
                                          MsgFilter.SRC_AIR)
    assert node is not None
