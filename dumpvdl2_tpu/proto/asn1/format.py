"""Schema-driven text/JSON rendering of decoded ICAO ASN.1 values.

Re-implements the reference's formatter-table architecture
(asn1-format-icao-text.c:1044-1537, asn1-format-icao-json.c, plus the
libacars asn1-format-common generics it builds on): every ASN.1 type
has a rendering style and display label; SEQUENCE/CHOICE/SET OF walk
their children through the same dispatch; CPDLC message-element CHOICEs
print ICAO Doc 9880 phraseology; physical quantities print with their
unit and scale factor.

The dispatch metadata lives in icao_meta.py (machine-extracted); the
engine below is original.
"""
from __future__ import annotations

from typing import Any, Optional

from .icao_meta import (ACSE_JSON_FMT, ACSE_TEXT_FMT, DOWNLINK_LABELS,
                        ENUM_LABEL_DICTS, JSON_FMT, TEXT_FMT, UPLINK_LABELS)
from .ir import Schema

# ---------------------------------------------------------------- units
# fn-name -> (unit suffix, multiplier, decimals); ports of the
# la_format_INTEGER_with_unit_as_text call sites in
# asn1-format-icao-text.c
UNIT_FMT = {
    "asn1_format_AltimeterEnglish_as_text": (" inHg", 0.01, 2),
    "asn1_format_AltimeterMetric_as_text": (" hPa", 0.1, 1),
    "asn1_format_Deg_as_text": (" deg", 1, 0),
    "asn1_format_DepartureMinimumInterval_as_text": (" min", 0.1, 1),
    "asn1_format_DistanceKm_as_text": (" km", 0.25, 2),
    "asn1_format_DistanceNm_as_text": (" nm", 0.1, 1),
    "asn1_format_Humidity_as_text": ("%", 1, 0),
    "asn1_format_DistanceEnglish_as_text": (" nm", 1, 0),
    "asn1_format_DistanceMetric_as_text": (" km", 1, 0),
    "asn1_format_Frequencyvhf_as_text": (" MHz", 0.005, 3),
    "asn1_format_Frequencyuhf_as_text": (" MHz", 0.025, 3),
    "asn1_format_Frequencyhf_as_text": (" kHz", 1, 0),
    "asn1_format_LegTime_as_text": (" min", 1, 0),
    "asn1_format_LevelFeet_as_text": (" ft", 10, 0),
    "asn1_format_LevelFlightLevelMetric_as_text": (" m", 10, 0),
    "asn1_format_Meters_as_text": (" m", 1, 0),
    "asn1_format_RTASecTolerance_as_text": (" sec", 1, 0),
    "asn1_format_RTATolerance_as_text": (" min", 0.1, 1),
    "asn1_format_Feet_as_text": (" ft", 1, 0),
    "asn1_format_SpeedMetric_as_text": (" km/h", 1, 0),
    "asn1_format_SpeedEnglish_as_text": (" kts", 1, 0),
    "asn1_format_SpeedIndicated_as_text": (" kts", 1, 0),
    "asn1_format_SpeedMach_as_text": ("", 0.001, 3),
    "asn1_format_Temperature_as_text": (" C", 1, 0),
    "asn1_format_VerticalRateEnglish_as_text": (" ft/min", 10, 0),
    "asn1_format_VerticalRateMetric_as_text": (" m/min", 10, 0),
    "asn1_format_ADSv2Temperature_as_text": (" C", 0.25, 2),
    "asn1_format_ADSv2WindSpeedKts_as_text": (" kts", 1, 0),
    "asn1_format_ADSv2WindSpeedKmh_as_text": (" km/h", 2, 0),
    "asn1_format_EPPTimeInterval_as_text": (" minutes", 1, 0),
    "asn1_format_EPPTolETA_as_text": (" min", 0.1, 1),
    "asn1_format_EPPTolGCDistance_as_text": (" nm", 0.01, 2),
    "asn1_format_EPUChangeTolerance_as_text": (" nm", 0.01, 2),
    "asn1_format_GroundSpeed_as_text": (" kts", 0.5, 1),
    "asn1_format_GroundTrack_as_text": (" deg", 0.05, 2),
    "asn1_format_LateralDeviationThreshold_as_text": (" nm", 0.1, 1),
    "asn1_format_MachNumberTolerance_as_text": ("", 0.01, 2),
    "asn1_format_GrossMass_as_text": (" kg", 10, 0),
    "asn1_format_TurbulenceEDRValue_as_text": (" m^2/s^3", 0.01, 2),
    "asn1_format_TurbulenceMinutesInThePast_as_text": (" min", 0.5, 1),
    "asn1_format_TurbulenceObservationWindow_as_text": (" min", 1, 0),
    "asn1_format_TurnRadius_as_text": (" nm", 0.1, 1),
    "asn1_format_RNPValue_as_text": (" nm", 0.1, 1),
    "asn1_format_Modulus_as_text": None,   # handled specially
}

BIT_LABEL_FN = {
    "asn1_format_VerticalType_as_text": "VerticalType_bit_labels",
    "asn1_format_ReportTypeNotSupported_as_text":
        "ReportTypeNotSupported_bit_labels",
    "asn1_format_EventTypeNotSupported_as_text":
        "EventTypeNotSupported_bit_labels",
    "asn1_format_EPPLimitations_as_text": "EPPLimitations_bit_labels",
    "asn1_format_EmergencyUrgencyStatus_as_text":
        "EmergencyUrgencyStatus_bit_labels",
}

ENUM_DICT_FN = {
    "asn1_format_Associate_result_as_text": "Associate_result_labels",
    "asn1_format_Release_request_reason_as_text":
        "Release_request_reason_labels",
    "asn1_format_Release_response_reason_as_text":
        "Release_response_reason_labels",
    "asn1_format_ABRT_source_as_text": "ABRT_source_labels",
}


def _fmt_unit(value: int, unit: str, mult: float, dec: int) -> str:
    if dec == 0:
        return f"{int(value * mult)}{unit}"
    return f"{value * mult:.{dec}f}{unit}"


def _terminal(schema: Schema, ref: str):
    node = schema.resolve(ref)
    while node[0] == "alias":
        node = schema.resolve(node[1])
    return node


def _choice_tref(schema: Schema, tname: str, altname: str) -> Optional[str]:
    node = _terminal(schema, tname)
    if node[0] != "choice":
        return None
    for a in node[1]:
        if a[0] == altname:
            return a[1]
    return None


class IcaoFormatter:
    """One formatting pass; ``table`` selects icao vs acse dispatch."""

    def __init__(self, schema: Schema, table: str = "icao"):
        self.schema = schema
        self.text_tab = TEXT_FMT if table == "icao" else ACSE_TEXT_FMT
        self.json_tab = JSON_FMT if table == "icao" else ACSE_JSON_FMT

    # ------------------------------------------------------------- text
    def text(self, out, tname: str, value: Any, indent: int) -> None:
        """Render ``value`` of type ``tname`` (top-level entry point)."""
        self._t(out, tname, value, indent, override_label=None)

    def _lookup(self, tname: str):
        ent = self.text_tab.get(tname)
        if ent is None and self.text_tab is not TEXT_FMT:
            ent = TEXT_FMT.get(tname)
        if ent is None and self.text_tab is not ACSE_TEXT_FMT:
            ent = ACSE_TEXT_FMT.get(tname)
        return ent

    def _t(self, out, tname: str, value: Any, indent: int,
           override_label: Optional[str] = None) -> None:
        short = tname.split(".")[-1]
        ent = self._lookup(short)
        if ent is None:
            self._generic(out, tname, value, indent,
                          override_label or short)
            return
        fn, label = ent
        label = override_label or label
        if fn is None:
            return                      # deliberately not rendered
        self._dispatch_text(fn, out, tname, value, indent, label)

    # -- structural generics ------------------------------------------
    def _seq_text(self, out, tname, value, indent, label):
        if label:
            out.iline(indent, f"{label}:")
            indent += 1
        node = _terminal(self.schema, tname)
        for memb in node[1]:
            name, tref = memb[0], memb[1]
            if name in value:
                self._t(out, tref, value[name], indent)

    def _choice_text(self, out, tname, value, indent, label,
                     choice_labels=None):
        if _terminal(self.schema, tname)[0] != "choice":
            # the reference's formatter table registers a few
            # non-CHOICE types with the CHOICE formatter (e.g.
            # CancelContract, an extensible ENUM,
            # asn1-format-icao-text.c:1303); render as a labeled value
            self._generic(out, tname, value, indent, label)
            return
        altname, inner = value
        if choice_labels is not None:
            phrase = choice_labels.get(altname, altname)
            out.iline(indent, phrase)
            indent += 1
        elif label:
            out.iline(indent, f"{label}:")
            indent += 1
        tref = _choice_tref(self.schema, tname, altname)
        if tref is None:
            if inner is not None:
                out.iline(indent, f"{altname}: {inner}")
            return
        if _terminal(self.schema, tref)[0] == "null" and \
                choice_labels is not None:
            return                      # phraseology line says it all
        self._t(out, tref, inner, indent)

    def _seqof_text(self, out, tname, value, indent, label):
        if label:
            out.iline(indent, f"{label}:")
            indent += 1
        node = _terminal(self.schema, tname)
        for item in value:
            self._t(out, node[1], item, indent)

    def _any_text(self, out, tname, value, indent, label):
        out.iline(indent, f"{label or tname}: {self._scalar(tname, value)}")

    def _scalar(self, tname: str, value: Any) -> str:
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, bytes):
            try:
                s = value.decode("ascii")
                if s.isprintable():
                    return s
            except UnicodeDecodeError:
                pass
            return value.hex()
        if isinstance(value, tuple) and len(value) == 2 and \
                isinstance(value[0], (bytes, bytearray)):
            data, nbits = value
            return "".join(str((data[i >> 3] >> (7 - (i & 7))) & 1)
                           for i in range(nbits))
        if isinstance(value, tuple):
            return ".".join(str(x) for x in value)
        return str(value)

    def _generic(self, out, tname, value, indent, label):
        node = _terminal(self.schema, tname)
        kind = node[0]
        if kind == "seq":
            self._seq_text(out, tname, value, indent, label)
        elif kind == "choice":
            self._choice_text(out, tname, value, indent, label)
        elif kind == "seqof":
            self._seqof_text(out, tname, value, indent, label)
        elif kind == "null":
            out.iline(indent, f"{label}")
        else:
            self._any_text(out, tname, value, indent, label)

    # -- dispatch ------------------------------------------------------
    def _dispatch_text(self, fn, out, tname, value, indent, label):
        s = self.schema
        if fn in ("asn1_format_SEQUENCE_icao_as_text",
                  "asn1_format_SEQUENCE_acse_as_text"):
            self._seq_text(out, tname, value, indent, label)
        elif fn in ("asn1_format_CHOICE_icao_as_text",
                    "asn1_format_CHOICE_acse_as_text"):
            self._choice_text(out, tname, value, indent, label)
        elif fn == "asn1_format_SEQUENCE_OF_icao_as_text":
            self._seqof_text(out, tname, value, indent, label)
        elif fn == "asn1_format_ATCUplinkMsgElementId_as_text":
            self._choice_text(out, tname, value, indent, label,
                              choice_labels=UPLINK_LABELS)
        elif fn == "asn1_format_ATCDownlinkMsgElementId_as_text":
            self._choice_text(out, tname, value, indent, label,
                              choice_labels=DOWNLINK_LABELS)
        elif fn in ("la_asn1_format_any_as_text",):
            self._any_text(out, tname, value, indent, label)
        elif fn == "la_asn1_format_ENUM_as_text":
            out.iline(indent, f"{label}: {value}")
        elif fn == "la_asn1_format_label_only_as_text":
            out.iline(indent, f"{label}")
        elif fn in ENUM_DICT_FN:
            d = ENUM_LABEL_DICTS[ENUM_DICT_FN[fn]]
            pretty = None
            if isinstance(value, str):
                for sym, disp in d.items():
                    if sym.endswith(value.replace("-", "_")):
                        pretty = disp
                        break
            out.iline(indent, f"{label}: {pretty or value}")
        elif fn in BIT_LABEL_FN:
            d = ENUM_LABEL_DICTS[BIT_LABEL_FN[fn]]
            data, nbits = value
            bits = [d.get(str(i), f"bit{i}") for i in range(nbits)
                    if (data[i >> 3] >> (7 - (i & 7))) & 1]
            out.iline(indent, f"{label}: {', '.join(bits)}")
        elif fn == "asn1_format_Modulus_as_text":
            out.iline(indent, f"{label}: every {value} reports")
        elif fn in UNIT_FMT and UNIT_FMT[fn] is not None:
            unit, mult, dec = UNIT_FMT[fn]
            out.iline(indent, f"{label}: {_fmt_unit(value, unit, mult, dec)}")
        elif fn == "asn1_format_Code_as_text":
            out.iline(indent,
                      f"{label}: {''.join(str(x) for x in value)}")
        elif fn == "asn1_format_DateTime_as_text":
            d, t = value["date"], value["time"]
            out.iline(indent, "%s: %04d-%02d-%02d %02d:%02d" % (
                label, d["year"], d["month"], d["day"],
                t["hours"], t["minutes"]))
        elif fn == "asn1_format_DateTimeGroup_as_text":
            d, t = value["date"], value["timehhmmss"]
            hm = t["hoursminutes"]
            out.iline(indent, "%s: %04d-%02d-%02d %02d:%02d:%02d" % (
                label, d["year"], d["month"], d["day"],
                hm["hours"], hm["minutes"], t["seconds"]))
        elif fn == "asn1_format_ADSv2DateTimeGroup_as_text":
            d, t = value["date"], value["time"]
            out.iline(indent, "%s: %04d-%02d-%02d %02d:%02d:%02d" % (
                label, d["year"], d["month"], d["day"],
                t["hours"], t["minutes"], t["seconds"]))
        elif fn == "asn1_format_Time_as_text":
            out.iline(indent, "%s: %02d:%02d" % (
                label, value["hours"], value["minutes"]))
        elif fn == "asn1_format_Timesec_as_text":
            out.iline(indent, "%s: %02d:%02d:%02d" % (
                label, value["hours"], value["minutes"], value["seconds"]))
        elif fn == "asn1_format_Latitude_as_text":
            self._latlon_text(out, value, indent, label, lat=True)
        elif fn == "asn1_format_Longitude_as_text":
            self._latlon_text(out, value, indent, label, lat=False)
        elif fn == "asn1_format_ADSv2Latitude_as_text":
            out.iline(indent, "%s:  %02d %02d' %04.1f\" %s" % (
                label, value["degrees"], value["minutes"],
                value["seconds"] / 10.0, value["direction"]))
        elif fn == "asn1_format_ADSv2Longitude_as_text":
            out.iline(indent, "%s: %03d %02d' %04.1f\" %s" % (
                label, value["degrees"], value["minutes"],
                value["seconds"] / 10.0, value["direction"]))
        elif fn == "asn1_format_UnitName_as_text":
            fdes = value.get("facilityDesignation", "")
            fname = value.get("facilityName", "")
            ffun = value.get("facilityFunction", "")
            out.iline(indent, f"{label}: {fdes}, {fname}, {ffun}")
        elif fn == "asn1_format_RejectDetails_as_text":
            names = {
                "aDS-service-unavailable": "ADS service unavailable",
                "undefined-reason": "undefined reason",
                "maximum-capacity-exceeded": "max. capacity exceeded",
                "reserved": "(reserved)",
                "waypoint-in-request-not-on-the-route":
                    "requested waypoint not on the route",
                "aDS-contract-not-supported": "ADS contract not supported",
                "noneOfReportTypesSupported":
                    "none of report types supported",
                "noneOfEventTypesSupported":
                    "none of event types supported"}
            alt = value[0] if isinstance(value, tuple) else None
            out.iline(indent, f"{label}: {names.get(alt, 'none')}")
        elif fn == "asn1_format_ReportingRate_as_text":
            alt, v = value
            unit = " sec" if "seconds" in alt else " min"
            out.iline(indent, f"{label}: {v}{unit}")
        elif fn == "asn1_format_EstimatedPositionUncertainty_as_text":
            if value == 9900:
                out.iline(indent, f"{label}: complete-loss")
            else:
                out.iline(indent,
                          f"{label}: {_fmt_unit(value, ' nm', 0.01, 2)}")
        elif fn in ("asn1_format_ShortTsap_as_text",
                    "asn1_format_LongTsap_as_text"):
            data = b""
            v = value
            if fn == "asn1_format_LongTsap_as_text":
                data += v.get("rDP", b"")
                v = v.get("shortTsap", {})
            data += v.get("aRS", b"")
            data += v.get("locSysNselTsel", b"")
            out.iline(indent, f"{label}: {self._scalar(tname, data)}")
        elif fn in ("asn1_format_ADSAircraftPDUs_as_text",
                    "asn1_format_ADSGroundPDUs_as_text"):
            inner = ("adsAircraftPdu" if "adsAircraftPdu" in value
                     else "adsGroundPdu")
            tref = ("ADSAircraftPDU" if inner == "adsAircraftPdu"
                    else "ADSGroundPDU")
            self._t(out, tref, value[inner], indent)
        else:
            self._generic(out, tname, value, indent, label)

    def _latlon_text(self, out, value, indent, label, lat: bool):
        which = "latitude" if lat else "longitude"
        dirname = value.get(f"{which}Direction", "")
        typ = value.get(f"{which}Type")
        degfmt = "%02d" if lat else "%03d"
        pad = "  " if lat else ""
        if typ is None:
            out.iline(indent, f"{label}: none")
            return
        alt, v = typ
        if alt.endswith("Degrees"):
            out.iline(indent, f"{label}: {pad}" + degfmt % v + f" {dirname}")
        elif alt.endswith("DegreesMinutes"):
            whole = v[f"{which}WholeDegrees"]
            mins = v["minutesLatLon"] / 100.0
            out.iline(indent, f"{label}: {pad}" + degfmt % whole +
                      " %05.2f' %s" % (mins, dirname))
        elif alt.endswith("DMS"):
            whole = v[f"{which}WholeDegrees"]
            mins = v.get("latlonWholeMinutes", v.get("latLonWholeMinutes"))
            secs = v["secondsLatLon"]
            out.iline(indent, f"{label}: {pad}" + degfmt % whole +
                      " %02d' %02d\" %s" % (mins, secs, dirname))
        else:
            out.iline(indent, f"{label}: none")

    # ------------------------------------------------------------- json
    def json(self, tname: str, value: Any) -> Any:
        """Structured JSON-ready rendering (dicts/lists/scalars)."""
        node = _terminal(self.schema, tname)
        kind = node[0]
        if kind == "seq":
            obj = {}
            for memb in node[1]:
                name, tref = memb[0], memb[1]
                if name in value:
                    obj[name] = self.json(tref, value[name])
            return obj
        if kind == "choice":
            altname, inner = value
            tref = _choice_tref(self.schema, tname, altname)
            short = tname.split(".")[-1]
            rendered = (self.json(tref, inner) if tref is not None
                        else (inner.hex() if isinstance(inner, bytes)
                              else inner))
            obj = {"choice": altname, "data": rendered}
            if short == "ATCUplinkMsgElementId":
                obj["choice_label"] = UPLINK_LABELS.get(altname)
            elif short == "ATCDownlinkMsgElementId":
                obj["choice_label"] = DOWNLINK_LABELS.get(altname)
            return obj
        if kind == "seqof":
            return [self.json(node[1], x) for x in value]
        if kind == "bitstr" or (isinstance(value, tuple) and len(value) == 2
                                and isinstance(value[0], bytes)):
            data, nbits = value
            return {"bits": nbits, "value": data.hex()}
        if isinstance(value, bytes):
            return value.hex()
        if isinstance(value, tuple):
            return ".".join(str(x) for x in value)
        return value
