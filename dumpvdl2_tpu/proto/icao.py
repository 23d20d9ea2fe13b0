"""ICAO ULCS: X.225 session, X.226 presentation, X.227 ACSE and the
CM / CPDLC / ADS-C applications (ASN.1 UPER).

Placeholder pending the ASN.1 implementation pass.
"""
from __future__ import annotations

from typing import Optional, Tuple

from .base import JsonObj, ProtoNode, TextOut, UnknownProtoNode


def icao_apdu_parse(buf: bytes, msg_type: int
                    ) -> Tuple[Optional[ProtoNode], int]:
    return UnknownProtoNode(buf), msg_type
