"""FANS-1/A CPDLC message decode + rendering (ARINC 622 IMI AT1).

The reference renders these through libacars' cpdlc.c + the DO-219
ASN.1 module; here the schema-driven UPER runtime decodes against the
hand-written FANS tables (proto/asn1/tables_fans.py) and this module
renders the element tree with the published phraseology.  Arguments
whose types are not modelled yet surface as hex bits — see the honesty
note in tables_fans.py.
"""
from __future__ import annotations

from typing import Any, Optional

from .asn1.runtime import BitReader, UperDecodeError, decode
from .asn1.tables_fans import DOWNLINK_MSGS, SCHEMA, UPLINK_MSGS
from .base import JsonObj, ProtoNode, TextOut, hex_str


def _fmt_arg(name: str, value: Any) -> tuple[str, Any]:
    """Render one decoded element argument for text/JSON output."""
    if value is None:
        return "", None
    if isinstance(value, dict):           # FANSTime
        if set(value) >= {"hours", "minutes"}:
            s = f"{value['hours']:02d}:{value['minutes']:02d}"
            if "seconds" in value:
                s += f":{value['seconds']:02d}"
            return s, s
    if isinstance(value, list):           # beacon code digits
        s = "".join(str(d) for d in value)
        return s, s
    if isinstance(value, tuple):
        if len(value) == 2 and isinstance(value[0], (bytes, bytearray)) \
                and isinstance(value[1], int):   # unparsed bits
            return (f"(unparsed args: {hex_str(value[0])} "
                    f"[{value[1]} bits])",
                    {"unparsed_bits": hex_str(value[0]),
                     "nbits": value[1]})
        alt, sub = value                  # CHOICE (e.g. degrees)
        txt, js = _fmt_arg(name, sub)
        return f"{txt} ({alt})", {alt: js}
    return str(value), value


class CpdlcFansNode(ProtoNode):
    """One decoded (or decode-failed) FANS-1/A CPDLC message."""
    json_key = "cpdlc_fans"

    def __init__(self, uplink: bool, msg: Optional[dict],
                 raw: bytes, error: str = "") -> None:
        super().__init__()
        self.uplink = uplink
        self.msg = msg
        self.raw = raw
        self.error = error

    # ------------------------------------------------------------ text
    def format_text(self, out: TextOut, indent: int) -> None:
        direction = "uplink" if self.uplink else "downlink"
        out.iline(indent, f"FANS-1/A CPDLC {direction} message:")
        indent += 1
        if self.msg is None:
            out.iline(indent, f"-- decode failed: {self.error}")
            out.iline(indent, f"Data: {hex_str(self.raw)}")
            return
        hdr = self.msg.get("header", {})
        out.iline(indent, f"Msg ID: {hdr.get('msgIdentificationNumber')}")
        if "msgReferenceNumber" in hdr:
            out.iline(indent, f"Msg Ref: {hdr['msgReferenceNumber']}")
        if "timestamp" in hdr:
            t = hdr["timestamp"]
            out.iline(indent, "Timestamp: %02d:%02d:%02d" % (
                t["hours"], t["minutes"], t["seconds"]))
        table = UPLINK_MSGS if self.uplink else DOWNLINK_MSGS
        prefix = "uM" if self.uplink else "dM"
        out.iline(indent, "Message data:")
        for alt, val in self.msg.get("messageData", []):
            num = int(alt[len(prefix):])
            title = table.get(num, ("(unknown)", None))[0]
            out.iline(indent + 1, f"{prefix[0].upper()}M{num}: {title}")
            txt, _ = _fmt_arg(alt, val)
            if txt:
                out.iline(indent + 2, txt)

    # ------------------------------------------------------------ json
    def format_json(self, obj: JsonObj) -> None:
        obj["dir"] = "uplink" if self.uplink else "downlink"
        if self.msg is None:
            obj["err"] = self.error
            obj["data"] = hex_str(self.raw)
            return
        hdr = self.msg.get("header", {})
        obj["msg_id"] = hdr.get("msgIdentificationNumber")
        if "msgReferenceNumber" in hdr:
            obj["msg_ref"] = hdr["msgReferenceNumber"]
        if "timestamp" in hdr:
            t = hdr["timestamp"]
            obj["timestamp"] = "%02d:%02d:%02d" % (
                t["hours"], t["minutes"], t["seconds"])
        table = UPLINK_MSGS if self.uplink else DOWNLINK_MSGS
        prefix = "uM" if self.uplink else "dM"
        elements = []
        for alt, val in self.msg.get("messageData", []):
            num = int(alt[len(prefix):])
            el = JsonObj(num=num, title=table.get(num, ("(unknown)",))[0])
            _, js = _fmt_arg(alt, val)
            if js is not None:
                el["arg"] = js
            elements.append(el)
        obj["elements"] = elements


def cpdlc_fans_parse(data: bytes, uplink: bool) -> CpdlcFansNode:
    """Decode an AT1 payload (UPER FANSATC{Up,Down}linkMessage)."""
    ref = "FANSATCUplinkMessage" if uplink else "FANSATCDownlinkMessage"
    try:
        msg = decode(SCHEMA, ref, BitReader(data))
    except (UperDecodeError, KeyError, ValueError) as e:
        return CpdlcFansNode(uplink, None, data, error=str(e))
    return CpdlcFansNode(uplink, msg, data)
