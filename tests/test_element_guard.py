"""Per-element-id guard over the generated CPDLC/ADS-C tables.

proto/asn1/tables_icao.py + icao_meta.py carry ~120 KB of
machine-generated schema and label data (238 uplink + 114 downlink
CPDLC element CHOICEs, the ADS-C v2 PDU families, and the ICAO Doc
9880 phraseology labels, reference asn1-format-icao-text.c:82-1044).
This module generates ONE round-trip fixture per element id /
PDU variant: UPER encode -> decode -> text + json format must succeed
and the element's display label must be rendered.  A single lost or
mistyped table entry fails exactly one named test case.
"""
import random

import pytest

from test_asn1 import _gen_value, _strip_defaults

import dumpvdl2_tpu.proto.asn1.runtime as rt
from dumpvdl2_tpu.proto.asn1.format import IcaoFormatter
from dumpvdl2_tpu.proto.asn1.icao_meta import (DOWNLINK_LABELS,
                                               UPLINK_LABELS)
from dumpvdl2_tpu.proto.asn1.tables_icao import SCHEMA
from dumpvdl2_tpu.proto.base import TextOut

_UP_ALTS = [a[0] for a in SCHEMA["ATCUplinkMsgElementId"][1]]
_DOWN_ALTS = [a[0] for a in SCHEMA["ATCDownlinkMsgElementId"][1]]
_ADS_AIR_ALTS = [a[0] for a in SCHEMA["ADSAircraftPDU"][1]]
_ADS_GND_ALTS = [a[0] for a in SCHEMA["ADSGroundPDU"][1]]


def _gen_alt_value(choice_tname, altname):
    """Deterministic generated value for one CHOICE alternative,
    retrying seeds (deep types like RouteClearance can hit the
    generator's recursion guard on an unlucky seed)."""
    alts = dict((a[0], a[1]) for a in SCHEMA[choice_tname][1])
    tref = alts[altname]
    for attempt in range(8):
        rng = random.Random(hash((altname, attempt)) & 0xFFFFFFFF)
        try:
            return (altname, _gen_value(SCHEMA, tref, rng))
        except RecursionError:
            continue
    pytest.fail(f"could not generate a value for {altname} ({tref})")


def _roundtrip_and_format(root, value, must_contain):
    enc = rt.encode(SCHEMA, root, value)
    dec = rt.decode(SCHEMA, root, enc)
    assert _strip_defaults(SCHEMA, root, dec) \
        == _strip_defaults(SCHEMA, root, value), f"{root} roundtrip"
    fmt = IcaoFormatter(SCHEMA)
    out = TextOut()
    fmt.text(out, root, dec, 0)
    text = out.getvalue()
    assert text.strip(), f"{root}: empty text rendering"
    js = fmt.json(root, dec)
    assert js is not None
    for frag in must_contain:
        assert frag in text, f"{root}: {frag!r} not rendered"
    return text, js


def _cpdlc_msg(direction, elem_value):
    rng = random.Random(0xC0DE)
    header = _gen_value(SCHEMA, "ATCMessageHeader", rng)
    key = "ATCUplinkMessage" if direction == "up" \
        else "ATCDownlinkMessage"
    return key, {
        "header": header,
        "messageData": {"elementIds": [elem_value]},
    }


@pytest.mark.parametrize("alt", _UP_ALTS)
def test_uplink_element(alt):
    assert alt in UPLINK_LABELS, f"{alt}: no phraseology label entry"
    root, msg = _cpdlc_msg("up", _gen_alt_value(
        "ATCUplinkMsgElementId", alt))
    label = UPLINK_LABELS[alt]
    _roundtrip_and_format(root, msg, [label] if label else [])


@pytest.mark.parametrize("alt", _DOWN_ALTS)
def test_downlink_element(alt):
    assert alt in DOWNLINK_LABELS, f"{alt}: no phraseology label entry"
    root, msg = _cpdlc_msg("down", _gen_alt_value(
        "ATCDownlinkMsgElementId", alt))
    label = DOWNLINK_LABELS[alt]
    _roundtrip_and_format(root, msg, [label] if label else [])


@pytest.mark.parametrize("alt", _ADS_AIR_ALTS)
def test_adsc_v2_aircraft_pdu(alt):
    rng = random.Random(hash(alt) & 0xFFFF)
    msg = {"timestamp": _gen_value(SCHEMA, "PMADSCDateTimeGroup", rng),
           "adsAircraftPdu": _gen_alt_value("ADSAircraftPDU", alt)}
    _roundtrip_and_format("ADSAircraftPDUs", msg, [])


@pytest.mark.parametrize("alt", _ADS_GND_ALTS)
def test_adsc_v2_ground_pdu(alt):
    rng = random.Random(hash(alt) & 0xFFFF)
    msg = {"timestamp": _gen_value(SCHEMA, "PMADSCDateTimeGroup", rng),
           "adsGroundPdu": _gen_alt_value("ADSGroundPDU", alt)}
    _roundtrip_and_format("ADSGroundPDUs", msg, [])


def test_element_counts_match_reference():
    """The reference CHOICEs carry exactly 238 uplink and 114 downlink
    alternatives (asn1c output of the ICAO ATN B1 message sets)."""
    assert len(_UP_ALTS) == 238
    assert len(_DOWN_ALTS) == 114
    assert len(UPLINK_LABELS) == 238
    assert len(DOWNLINK_LABELS) == 114
