"""ES-IS (ISO 9542) hello PDUs.

Placeholder pending the full implementation pass.
"""
from __future__ import annotations

from .base import JsonObj, ProtoNode, TextOut, UnknownProtoNode


class EsisPduNode(ProtoNode):
    json_key = "esis"

    def __init__(self) -> None:
        super().__init__()
        self.err = True

    def format_text(self, out: TextOut, indent: int) -> None:
        if self.err:
            out.iline(indent, "-- Unparseable ES-IS PDU")

    def format_json(self, obj: JsonObj) -> None:
        obj["err"] = self.err


def esis_pdu_parse(buf: bytes, msg_type: int):
    node = EsisPduNode()
    node.next = UnknownProtoNode(buf)
    return node, msg_type
