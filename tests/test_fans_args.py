"""FANS-1/A typed element-argument tests (round-3 table fill).

Covers the high-traffic argument families end to end: encode with the
schema tables -> UPER bytes -> cpdlc_fans_parse -> text/JSON render,
plus a randomized round-trip sweep over every element id in both
directions (so no element's argument type can break the envelope).
"""
import random

import pytest

from dumpvdl2_tpu.proto.asn1.runtime import encode
from dumpvdl2_tpu.proto.asn1.tables_fans import (DOWNLINK_MSGS, SCHEMA,
                                                 UPLINK_MSGS)
from dumpvdl2_tpu.proto.base import JsonObj, TextOut
from dumpvdl2_tpu.proto.fans import cpdlc_fans_parse

from test_asn1 import _gen_value


def _roundtrip(uplink, elements):
    msg = {"header": {"msgIdentificationNumber": 7,
                      "timestamp": {"hours": 12, "minutes": 34,
                                    "seconds": 56}},
           "messageData": elements}
    ref = "FANSATCUplinkMessage" if uplink else "FANSATCDownlinkMessage"
    node = cpdlc_fans_parse(encode(SCHEMA, ref, msg), uplink=uplink)
    assert node.msg is not None, node.error
    return node


def _text(node) -> str:
    out = TextOut()
    node.format_text(out, 0)
    return out.getvalue()


def test_altitude_flight_level():
    node = _roundtrip(True, [("uM20", ("altitudeFlightLevel", 350))])
    txt = _text(node)
    assert "CLIMB TO AND MAINTAIN" in txt and "FL350" in txt


def test_altitude_feet_scaled():
    node = _roundtrip(True, [("uM19", ("altitudeQNH", 500))])
    assert "5000 ft QNH" in _text(node)


def test_block_altitude():
    node = _roundtrip(True, [("uM30", [("altitudeFlightLevel", 310),
                                       ("altitudeFlightLevel", 350)])])
    txt = _text(node)
    assert "MAINTAIN BLOCK" in txt and "FL310" in txt and "FL350" in txt


def test_speed_mach_and_kts():
    node = _roundtrip(False, [("dM34", ("speedMach", 820)),
                              ("dM18", ("speedIndicated", 25))])
    txt = _text(node)
    assert "0.820 Mach" in txt
    assert "250 kts IAS" in txt


def test_position_fix_and_latlon():
    latlon = {"latitude": {"latitudeDegrees": 49, "minutesLatLon": 3050,
                           "latitudeDirection": "north"},
              "longitude": {"longitudeDegrees": 122,
                            "minutesLatLon": 1500,
                            "longitudeDirection": "west"}}
    node = _roundtrip(False, [("dM31", ("fixName", "BOKTO")),
                              ("dM33", ("latitudeLongitude", latlon))])
    txt = _text(node)
    assert "PASSING" in txt and "BOKTO" in txt
    assert "49 30.50'N 122 15.00'W" in txt


def test_profiled_scale_markers():
    """Fields whose UPER scaling is profiled (not second-source
    audited, tables_fans.py) carry an explicit marker in text and a
    "profiled" flag in JSON; audited fields don't (VERDICT r4 #9)."""
    node = _roundtrip(False, [("dM34", ("speedGround", 82))])
    txt = _text(node)
    assert "820 kts GS [profiled scale]" in txt
    obj = JsonObj()
    node.format_json(obj)
    import json
    assert "profiled" in json.dumps(obj, default=str)

    latlon = {"latitude": {"latitudeDegrees": 10, "minutesLatLon": 100,
                           "latitudeDirection": "north"},
              "longitude": {"longitudeDegrees": 20, "minutesLatLon": 200,
                            "longitudeDirection": "east"}}
    node = _roundtrip(False, [("dM33", ("latitudeLongitude", latlon))])
    assert "[profiled scale]" in _text(node)

    # audited families stay unmarked
    node = _roundtrip(True, [("uM19", ("altitudeQNH", 500))])
    assert "[profiled scale]" not in _text(node)


def test_position_altitude_composite():
    node = _roundtrip(True, [
        ("uM46", {"position": ("navaid", "YVR"),
                  "altitude": ("altitudeFlightLevel", 280)})])
    txt = _text(node)
    assert "CROSS" in txt and "YVR" in txt and "FL280" in txt


def test_contact_unit_frequency():
    node = _roundtrip(True, [
        ("uM117", {"icaoUnitName": {"facilityDesignation": "CZEG",
                                    "facilityFunction": "center"},
                   "frequency": ("frequencyvhf", 26750)})])
    txt = _text(node)
    assert "CONTACT" in txt and "CZEG" in txt
    assert "133.750 MHz" in txt


def test_offset_direction():
    node = _roundtrip(True, [
        ("uM64", {"distanceOffset": ("distanceOffsetNm", 200),
                  "direction": "left"})])
    txt = _text(node)
    assert "OFFSET" in txt and "20.0 nm" in txt and "left" in txt


def test_route_clearance():
    rc = {"airportDeparture": "KSFO", "airportDestination": "RJAA",
          "routeInformations": [
              ("publishedIdentifier", {"fixName": "TRYSH"}),
              ("airwayIdentifier", "R220"),
          ]}
    node = _roundtrip(True, [("uM80", rc)])
    txt = _text(node)
    assert "CLEARED" in txt and "KSFO" in txt and "RJAA" in txt
    assert "TRYSH" in txt and "R220" in txt


def test_altimeter_and_vertical_rate():
    node = _roundtrip(True, [
        ("uM153", ("altimeterEnglish", 2992)),
        ("uM171", ("verticalRateEnglish", 200))])
    txt = _text(node)
    assert "29.92 inHg" in txt
    assert "2000 ft/min" in txt


def test_error_information_enum():
    node = _roundtrip(False, [("dM62", "unableToProcessMsg")])
    assert "unableToProcessMsg" in _text(node)


def test_position_report():
    rep = {"positionCurrent": ("fixName", "OMOTO"),
           "timeAtPositionCurrent": {"hours": 3, "minutes": 41},
           "altitude": ("altitudeFlightLevel", 390),
           "fixNext": ("fixName", "ONION"),
           "timeEtaAtFixNext": {"hours": 4, "minutes": 2},
           "speed": ("speedMach", 840),
           "winds": {"windDirection": 270,
                     "windSpeed": ("windSpeedEnglish", 85)}}
    node = _roundtrip(False, [("dM48", rep)])
    txt = _text(node)
    assert "POSITION REPORT" in txt and "OMOTO" in txt and "FL390" in txt
    assert "03:41" in txt and "0.840 Mach" in txt
    obj = JsonObj()
    node.format_json(obj)
    arg = obj["elements"][0]["arg"]
    assert arg["positionCurrent"] == {"fixName": "OMOTO"}
    assert arg["winds"]["windDirection"] == 270


def test_remaining_fuel_souls():
    node = _roundtrip(False, [
        ("dM57", {"remainingFuel": {"hours": 2, "minutes": 15},
                  "soulsOnBoard": 245})])
    txt = _text(node)
    assert "02:15" in txt and "245" in txt


@pytest.mark.parametrize("uplink,table", [(True, UPLINK_MSGS),
                                          (False, DOWNLINK_MSGS)])
def test_every_element_roundtrips(uplink, table):
    """Random values for EVERY element id survive encode->decode."""
    prefix = "uM" if uplink else "dM"
    rng = random.Random(42)
    ids = sorted(table)
    for i in range(0, len(ids), 5):
        batch = ids[i:i + 5]
        elements = []
        for num in batch:
            tref = table[num][1]
            if SCHEMA.resolve(tref)[0] == "rest":
                continue          # uM178: raw-bits fallback, not typed
            val = _gen_value(SCHEMA, tref, rng)
            elements.append((f"{prefix}{num}", val))
        if not elements:
            continue
        node = _roundtrip(uplink, elements)
        got = node.msg["messageData"]
        assert [alt for alt, _ in got] == [a for a, _ in elements]
        # every rendered element must carry its phraseology title
        txt = _text(node)
        sent = {int(a[len(prefix):]) for a, _ in elements}
        for num in batch:
            if num not in sent:
                continue
            title = table[num][0].split("[")[0].strip()
            if title:
                assert title in txt
