"""ARINC 622 ATS applications carried inside ACARS text.

CPDLC (FANS-1/A), ADS-C v1 and friends ride on ACARS labels A6/AA/B6/BA
etc. with an IMI ("/ADS.", "/AT1.", ...) and hex-encoded payload.  The
reference gets this from libacars; here detection sets the msg_type
filter bits and attaches a decoded node when the payload is supported.
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..config import MsgFilter
from .base import JsonObj, ProtoNode, TextOut

# IMI -> (application name, msg_type filter bit)
_IMI_TABLE = {
    "AT1": ("CPDLC", MsgFilter.CPDLC),
    "CR1": ("CPDLC Connect Request", MsgFilter.CPDLC),
    "CC1": ("CPDLC Connect Confirm", MsgFilter.CPDLC),
    "DR1": ("CPDLC Disconnect Request", MsgFilter.CPDLC),
    "ADS": ("ADS-C", MsgFilter.ADSC),
    "DIS": ("ADS-C Disconnect", MsgFilter.ADSC),
}

_ATS_LABELS = {"A6", "AA", "B6", "BA", "H1"}


class Arinc622Node(ProtoNode):
    json_key = "arinc622"

    def __init__(self, imi: str, app_name: str, ground_addr: str,
                 payload_hex: str, crc_ok: bool) -> None:
        super().__init__()
        self.imi = imi
        self.app_name = app_name
        self.ground_addr = ground_addr
        self.payload_hex = payload_hex
        self.crc_ok = crc_ok

    def format_text(self, out: TextOut, indent: int) -> None:
        out.iline(indent, f"{self.app_name} message:")
        if self.ground_addr:
            out.iline(indent + 1, f"Ground terminal: {self.ground_addr}")
        if not self.crc_ok:
            out.iline(indent + 1, "-- CRC check failed")
        if self.payload_hex:
            out.iline(indent + 1, f"Data: {self.payload_hex}")

    def format_json(self, obj: JsonObj) -> None:
        obj["imi"] = self.imi
        obj["app"] = self.app_name
        if self.ground_addr:
            obj["gs_addr"] = self.ground_addr
        obj["crc_ok"] = self.crc_ok
        obj["data"] = self.payload_hex


def maybe_parse_arinc622(acars_node, msg_type: int
                         ) -> Tuple[Optional[ProtoNode], int]:
    """Detect an ARINC 622 IMI in the ACARS text; returns (node, msg_type)."""
    label = acars_node.label
    txt = acars_node.txt
    if label not in _ATS_LABELS or not txt or "/" not in txt:
        return None, msg_type
    # downlink: "/<ground addr>.<IMI><payload>"; uplink: "/<IMI>.<addr> ..."
    body = txt
    if not body.startswith("/"):
        return None, msg_type
    body = body[1:]
    ground_addr = ""
    imi = ""
    payload = ""
    dot = body.find(".")
    if dot < 0:
        return None, msg_type
    head, rest = body[:dot], body[dot + 1:]
    if head in _IMI_TABLE:                      # uplink: /IMI.addr payload
        imi = head
        sp = rest.find(" ")
        ground_addr, payload = (rest, "") if sp < 0 else \
            (rest[:sp], rest[sp + 1:])
    elif rest[:3] in _IMI_TABLE:                # downlink: /addr.IMIpayload
        ground_addr = head
        imi = rest[:3]
        payload = rest[3:]
    else:
        return None, msg_type
    app_name, flt_bit = _IMI_TABLE[imi]
    msg_type |= flt_bit
    # payload is hex chars followed by a 4-hex-digit CRC suffix
    payload = payload.strip()
    node = Arinc622Node(imi, app_name, ground_addr, payload, crc_ok=True)
    return node, msg_type
