"""CLNP (ISO 8473 / X.233) network layer — full and LREF-compressed NPDUs.

Placeholder pending the full implementation pass: currently renders the
PDU as an unparseable-CLNP node with a hexdump, which matches the
reference's fail-path output shape (clnp.c err handling).
"""
from __future__ import annotations

from .base import JsonObj, ProtoNode, TextOut, UnknownProtoNode


class ClnpPduNode(ProtoNode):
    json_key = "clnp"

    def __init__(self, compressed: bool = False) -> None:
        super().__init__()
        self.err = True
        self.compressed = compressed

    def format_text(self, out: TextOut, indent: int) -> None:
        if self.err:
            kind = "compressed " if self.compressed else ""
            out.iline(indent, f"-- Unparseable {kind}CLNP PDU")

    def format_json(self, obj: JsonObj) -> None:
        obj["err"] = self.err


def clnp_pdu_parse(buf: bytes, msg_type: int, reasm_ctx, rx_time,
                   src_addr: int, dst_addr: int):
    node = ClnpPduNode(compressed=False)
    node.next = UnknownProtoNode(buf)
    return node, msg_type


def clnp_compressed_data_pdu_parse(buf: bytes, msg_type: int, reasm_ctx,
                                   rx_time, src_addr: int, dst_addr: int):
    node = ClnpPduNode(compressed=True)
    node.next = UnknownProtoNode(buf)
    return node, msg_type
