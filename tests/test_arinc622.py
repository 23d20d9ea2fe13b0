"""ARINC 622 ATS unit framing + ADS-C v1 + FANS-1/A CPDLC decode tests."""
import numpy as np

from dumpvdl2_tpu.config import MsgFilter
from dumpvdl2_tpu.link.crc import crc16_ccitt
from dumpvdl2_tpu.proto.acars import (MSG_DIR_AIR2GND, MSG_DIR_GND2AIR,
                                      AcarsNode)
from dumpvdl2_tpu.proto.adsc_v1 import adsc_parse
from dumpvdl2_tpu.proto.arinc622 import maybe_parse_arinc622
from dumpvdl2_tpu.proto.base import JsonObj, TextOut
from dumpvdl2_tpu.proto.fans import cpdlc_fans_parse
from dumpvdl2_tpu.proto.asn1.runtime import encode
from dumpvdl2_tpu.proto.asn1.tables_fans import SCHEMA


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            sum(b << (7 - i) for i, b in enumerate(bits[j:j + 8]))
            for j in range(0, len(bits), 8))


def _basic_report_bytes(lat, lon, alt_ft, ts_sec, acc=5):
    w = _BitWriter()
    w.put(int(round(lat / (180.0 / (1 << 20)))) & 0x1FFFFF, 21)
    w.put(int(round(lon / (180.0 / (1 << 20)))) & 0x1FFFFF, 21)
    w.put(int(round(alt_ft / 4.0)) & 0xFFFF, 16)
    w.put(int(round(ts_sec / 0.125)), 15)
    w.put(1, 1)          # redundancy ok
    w.put(acc, 3)
    w.put(1, 1)          # tcas ok
    w.put(0, 2)
    out = w.bytes()
    assert len(out) == 10
    return out


def test_adsc_basic_report_decode():
    payload = bytes([7]) + _basic_report_bytes(45.0, -90.0, 36000, 1000.0)
    node = adsc_parse(payload, downlink=True)
    assert not node.error
    assert len(node.groups) == 1
    g = node.groups[0]
    assert g.name == "Basic report"
    assert abs(g.fields["lat"] - 45.0) < 1e-4
    assert abs(g.fields["lon"] + 90.0) < 1e-4
    assert g.fields["alt_ft"] == 36000
    assert g.fields["timestamp_sec"] == 1000.0
    assert g.fields["position_accuracy"] == 5


def test_adsc_multi_group():
    w = _BitWriter()
    for ch in "QFA123  ":
        c = ord(ch)
        w.put(c - 64 if c >= 64 else c, 6)
    fid = w.bytes()
    assert len(fid) == 6
    payload = (bytes([7]) + _basic_report_bytes(-33.9, 151.2, 38000, 500)
               + bytes([12]) + fid
               + bytes([17]) + bytes.fromhex("7C49F2"))
    node = adsc_parse(payload, downlink=True)
    assert [g.name for g in node.groups] == \
        ["Basic report", "Flight ID data", "Airframe ID"]
    assert node.groups[1].fields["flight_id"] == "QFA123"
    assert node.groups[2].fields["icao_hex"] == "7C49F2"
    # renders without crashing, json has groups
    out = TextOut()
    node.format_text(out, 0)
    assert "Flight ID" in out.getvalue()


def test_adsc_unknown_tag_falls_back_raw():
    node = adsc_parse(bytes([99, 1, 2, 3]), downlink=True)
    assert node.groups[0].name.startswith("Unknown group")
    assert node.error


def _wrap_ats(addr, imi, reg, payload):
    """Build an ATS unit with the HDLC-style complemented CRC."""
    unit = f"{addr}.{imi}{reg}".encode() + payload
    crc = crc16_ccitt(unit, 0xFFFF) ^ 0xFFFF
    return b"/" + unit + bytes((crc & 0xFF, crc >> 8))


def _acars_with(label, txt_raw, downlink=True):
    node = AcarsNode()
    node.label = label
    node.msg_dir = MSG_DIR_AIR2GND if downlink else MSG_DIR_GND2AIR
    node.txt_raw = txt_raw
    node.txt = "".join(chr(b & 0x7F) for b in txt_raw)
    return node


def test_arinc622_framing_and_crc():
    payload = bytes([7]) + _basic_report_bytes(10.0, 20.0, 30000, 100)
    raw = _wrap_ats("AKLCDYA", "ADS", ".N123AB", payload)
    acars = _acars_with("B6", raw)
    node, msg_type = maybe_parse_arinc622(acars, 0)
    assert node is not None
    assert node.imi == "ADS"
    assert node.addr == "AKLCDYA"
    assert node.reg == "N123AB"
    assert node.crc_ok, node.crc_convention
    assert msg_type & MsgFilter.ADSC
    assert node.next is not None               # decoded ADS-C chain
    assert node.next.groups[0].name == "Basic report"


def test_arinc622_bad_crc_detected():
    payload = bytes([7]) + _basic_report_bytes(10.0, 20.0, 30000, 100)
    raw = bytearray(_wrap_ats("AKLCDYA", "ADS", ".N123AB", payload))
    raw[-1] ^= 0xFF
    node, _ = maybe_parse_arinc622(_acars_with("B6", bytes(raw)), 0)
    assert node is not None
    assert not node.crc_ok


def test_fans_cpdlc_uplink_roundtrip():
    msg = {
        "header": {"msgIdentificationNumber": 12,
                   "timestamp": {"hours": 14, "minutes": 32,
                                 "seconds": 11}},
        "messageData": [("uM161", None)],      # END SERVICE
    }
    data = encode(SCHEMA, "FANSATCUplinkMessage", msg)
    node = cpdlc_fans_parse(data, uplink=True)
    assert node.msg is not None, node.error
    hdr = node.msg["header"]
    assert hdr["msgIdentificationNumber"] == 12
    assert hdr["timestamp"] == {"hours": 14, "minutes": 32, "seconds": 11}
    assert node.msg["messageData"] == [("uM161", None)]
    out = TextOut()
    node.format_text(out, 0)
    assert "END SERVICE" in out.getvalue()
    assert "14:32:11" in out.getvalue()


def test_fans_cpdlc_downlink_args():
    msg = {
        "header": {"msgIdentificationNumber": 5, "msgReferenceNumber": 3},
        "messageData": [("dM0", None),
                        ("dM67", "DUE TO TURBULENCE")],
    }
    data = encode(SCHEMA, "FANSATCDownlinkMessage", msg)
    node = cpdlc_fans_parse(data, uplink=False)
    assert node.msg is not None, node.error
    els = node.msg["messageData"]
    assert els[0] == ("dM0", None)
    assert els[1] == ("dM67", "DUE TO TURBULENCE")
    out = TextOut()
    node.format_text(out, 0)
    assert "WILCO" in out.getvalue()
    assert "DUE TO TURBULENCE" in out.getvalue()
    obj = JsonObj()
    node.format_json(obj)
    assert obj["elements"][0]["num"] == 0


def test_fans_cpdlc_unparsed_args_honest():
    """Elements with unmodelled arg types surface raw bits, not junk.

    After the round-3 table fill only uM178 ("reserved") still uses the
    raw-bits fallback; it keeps exercising the honesty path."""
    msg = {
        "header": {"msgIdentificationNumber": 1},
        "messageData": [("uM178", (b"\xAB\xCD", 16))],
    }
    data = encode(SCHEMA, "FANSATCUplinkMessage", msg)
    node = cpdlc_fans_parse(data, uplink=True)
    assert node.msg is not None, node.error
    alt, val = node.msg["messageData"][0]
    assert alt == "uM178"
    # decode absorbs the final byte-alignment padding into the tail
    assert val[0][:2] == b"\xAB\xCD" and val[1] >= 16
    out = TextOut()
    node.format_text(out, 0)
    assert "(reserved)" in out.getvalue()
    assert "unparsed" in out.getvalue()


def test_fans_cpdlc_garbage_fails_gracefully():
    node = cpdlc_fans_parse(b"", uplink=True)
    assert node.msg is None
    out = TextOut()
    node.format_text(out, 0)
    assert "decode failed" in out.getvalue()


def test_fans_element_tables_complete():
    from dumpvdl2_tpu.proto.asn1.tables_fans import (DOWNLINK_MSGS,
                                                     UPLINK_MSGS)
    assert sorted(UPLINK_MSGS) == list(range(183))
    assert sorted(DOWNLINK_MSGS) == list(range(81))
