"""XID / GSIF parser (ISO 8885 + ICAO Doc 9776 private parameters).

Placeholder pending the full implementation pass.
"""
from __future__ import annotations

from .base import JsonObj, ProtoNode, TextOut, UnknownProtoNode


class XidNode(ProtoNode):
    json_key = "xid"

    def __init__(self) -> None:
        super().__init__()
        self.err = True

    def format_text(self, out: TextOut, indent: int) -> None:
        if self.err:
            out.iline(indent, "-- Unparseable XID frame")

    def format_json(self, obj: JsonObj) -> None:
        obj["err"] = self.err


def xid_parse(cr: int, pf: int, buf: bytes, msg_type: int):
    node = XidNode()
    node.next = UnknownProtoNode(buf)
    return node, msg_type
