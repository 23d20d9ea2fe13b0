"""Generate the protocol-breadth golden corpus (SURVEY §4(3)).

Builds a deterministic raw-frames archive covering every protocol layer
the framework decodes — XID/GSIF, ACARS with applications (media
advisory, OHMA, MIAM single transfer + file transfer, ARINC 622 FANS
CPDLC / ADS-C v1 / connect management), X.25 (call, control, data,
M-bit reassembly, unparseable), CLNP full + segmented + compressed,
COTP (DT, concatenation, reassembly), ICAO ULCS (CPDLC, CM, ADS-C v2),
ES-IS, IDRP — and writes it to tests/fixtures/proto_corpus.frames.

Replaying the archive through the CLI must byte-match the committed
tests/fixtures/proto_corpus.{txt,json} fixtures
(tests/test_golden_corpus.py): a formatter regression in ANY layer
fails the e2e test, not just a unit test.  Regenerate after an
intentional behavior change with:

    python tools/gen_golden_corpus.py            # rewrites .frames
    python -m dumpvdl2_tpu --platform cpu \
        --raw-frames-file tests/fixtures/proto_corpus.frames \
        --extended-header --utc > tests/fixtures/proto_corpus.txt
    rm -f tests/fixtures/proto_corpus.json
    python -m dumpvdl2_tpu --platform cpu \
        --raw-frames-file tests/fixtures/proto_corpus.frames \
        --output decoded:json:file:path=tests/fixtures/proto_corpus.json

then review the fixture diff by hand.
"""
from __future__ import annotations

import base64
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dumpvdl2_tpu.core.metadata import MsgMetadata            # noqa: E402
from dumpvdl2_tpu.io.rawframes import frame_record            # noqa: E402
from dumpvdl2_tpu.link.crc import crc16_ccitt                 # noqa: E402
from dumpvdl2_tpu.proto import miam                           # noqa: E402
from dumpvdl2_tpu.proto.asn1 import runtime as rt             # noqa: E402
from dumpvdl2_tpu.proto.asn1.tables_icao import SCHEMA as ICAO  # noqa: E402
from dumpvdl2_tpu.proto.asn1.tables_fans import SCHEMA as FANS  # noqa: E402
from dumpvdl2_tpu.sim import frame_with_fcs                   # noqa: E402
from dumpvdl2_tpu.utils.bits import reverse_bits              # noqa: E402

FREQ = 136975000
T0 = 1755600000                      # fixed epoch: deterministic output

GS_ADDR = 0x104050                   # ground station
AC_ADDR = 0xA12345                   # aircraft
REG = ".N12345"                      # aircraft registration
FLIGHT = "AB1234"

NAK, STX, ETX, ETB = 0x15, 0x02, 0x03, 0x17


# ------------------------------------------------------------ AVLC layer

def enc_dlc_addr(addr24: int, addr_type: int, status: int,
                 final: bool) -> bytes:
    val = (addr24 & 0xFFFFFF) | ((addr_type & 7) << 24) \
        | ((status & 1) << 27)
    packed = reverse_bits(val, 28)
    return bytes([
        ((packed >> 0) & 0x7F) << 1,
        ((packed >> 7) & 0x7F) << 1,
        ((packed >> 14) & 0x7F) << 1,
        (((packed >> 21) & 0x7F) << 1) | (1 if final else 0),
    ])


def make_avlc(src_addr: int, dst_addr: int, lcf: int, info: bytes,
              src_type: int = 1, dst_type: int = 4, cr: int = 0,
              ag: int = 0) -> bytes:
    frame = (enc_dlc_addr(dst_addr, dst_type, ag, False)
             + enc_dlc_addr(src_addr, src_type, cr, True)
             + bytes([lcf]) + info)
    return frame_with_fcs(frame)


_ISEQ = {"n": 0}


def iframe(info: bytes, downlink: bool) -> bytes:
    """I-frame with an incrementing send sequence."""
    sseq = _ISEQ["n"] & 7
    _ISEQ["n"] += 1
    lcf = (sseq << 2) & 0xFF          # I frame: bit0 = 0
    if downlink:
        return make_avlc(AC_ADDR, GS_ADDR, lcf, info,
                         src_type=1, dst_type=4)
    return make_avlc(GS_ADDR, AC_ADDR, lcf, info,
                     src_type=4, dst_type=1, cr=1)


# ----------------------------------------------------------- ACARS layer

def _crc16_arinc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
    return crc


def acars_block(mode="2", reg=None, label="H1", blk="2",
                msg_num="M01A", flight=None, text="", raw_text=b"",
                suffix=ETX, downlink=True) -> bytes:
    reg = REG if reg is None else reg
    flight = FLIGHT if flight is None else flight
    body_txt = raw_text if raw_text else text.encode("latin-1")
    prelude = (msg_num + flight).encode() if downlink else b""
    body = (mode + reg).encode() + bytes([NAK]) + label.encode() + \
        blk.encode() + bytes([STX]) + prelude + body_txt + bytes([suffix])
    crc = _crc16_arinc(body)
    body += bytes([crc & 0xFF, crc >> 8]) + b"\x7f"
    return b"\xff\xff\x01" + body


def acars_frame(downlink=True, **kw) -> bytes:
    return iframe(acars_block(downlink=downlink, **kw), downlink)


def wrap_ats(addr, imi, reg, payload: bytes) -> bytes:
    """ARINC 622 ATS unit with the canonical complemented CRC."""
    unit = f"{addr}.{imi}{reg}".encode() + payload
    crc = crc16_ccitt(unit, 0xFFFF) ^ 0xFFFF
    return b"/" + unit + bytes((crc & 0xFF, crc >> 8))


# ------------------------------------------------------------ X.25 stack

def x25_data(payload: bytes, sseq: int, more: bool = False) -> bytes:
    return bytes([0x1B, 0xFF,
                  ((0 & 7) << 5) | ((1 if more else 0) << 4)
                  | ((sseq & 7) << 1)]) + payload


def clnp_dt(payload: bytes, sp=0, ms=0, pdu_id=0, offset=0,
            total=0) -> bytes:
    dst = bytes([3, 0x47, 0x00, 0x27])
    src = bytes([2, 0x49, 0x99])
    seg = b""
    if sp:
        seg = pdu_id.to_bytes(2, "big") + offset.to_bytes(2, "big") + \
            total.to_bytes(2, "big")
    hdr_len = 9 + len(dst) + len(src) + len(seg)
    flags = 0x1C | (0x80 if sp else 0) | (0x40 if ms else 0)
    hdr = bytes([0x81, hdr_len, 1, 20, flags, 0, 0, 0, 0]) + dst + src + seg
    return hdr + payload


def cotp_dt(payload: bytes, seq=0, eot=1, dst_ref=0x1234) -> bytes:
    hdr = bytes([4, 0xF0, dst_ref >> 8, dst_ref & 0xFF,
                 (0x80 if eot else 0) | (seq & 0x7F)])
    return hdr + payload


def cotp_ak(seq=1, dst_ref=0x1234, credit=4) -> bytes:
    return bytes([4, 0x60 | (credit & 0xF), dst_ref >> 8, dst_ref & 0xFF,
                  seq & 0x7F])


# ------------------------------------------------------------ ICAO ULCS

def bitstr(data: bytes):
    return (data, 8 * len(data))


def wrap_fed(payload: bytes, pci: int) -> bytes:
    fed = {"data": {"presentation-context-identifier": pci,
                    "presentation-data-values":
                        ("arbitrary", bitstr(payload))}}
    return rt.encode(ICAO, "Fully_encoded_data", fed)


def cpdlc_uplink_buf() -> bytes:
    msg = {
        "header": {"messageIdNumber": 7,
                   "dateTime": {"date": {"year": 2026, "month": 8,
                                         "day": 20},
                                "timehhmmss": {
                                    "hoursminutes": {"hours": 10,
                                                     "minutes": 30},
                                    "seconds": 0}}},
        "messageData": {"elementIds": [
            ("uM20Level", ("singleLevel", ("levelFlightLevel", 350)))]},
    }
    enc = rt.encode(ICAO, "ATCUplinkMessage", msg)
    prot = rt.encode(ICAO, "ProtectedGroundPDUs",
                     ("send", {"protectedMessage": bitstr(enc),
                               "integrityCheck": bitstr(b"\x12\x34")}))
    return wrap_fed(prot, 3)


def cpdlc_downlink_wilco_buf() -> bytes:
    msg = {
        "header": {"messageIdNumber": 2, "messageRefNumber": 7,
                   "dateTime": {"date": {"year": 2026, "month": 8,
                                         "day": 20},
                                "timehhmmss": {
                                    "hoursminutes": {"hours": 10,
                                                     "minutes": 31},
                                    "seconds": 12}}},
        "messageData": {"elementIds": [("dM0NULL", None)]},
    }
    enc = rt.encode(ICAO, "ATCDownlinkMessage", msg)
    prot = rt.encode(ICAO, "ProtectedAircraftPDUs",
                     ("send", {"protectedMessage": bitstr(enc),
                               "integrityCheck": bitstr(b"\x56\x78")}))
    return wrap_fed(prot, 3)


# ---------------------------------------------------------------- corpus

def build_corpus(gs_addr: int = 0x104050, ac_addr: int = 0xA12345,
                 reg: str = ".N12345", flight: str = "AB1234"
                 ) -> list[bytes]:
    """Build the full protocol-breadth frame sequence for ONE aircraft.

    The identity parameters let tools/gen_bench_archive.py synthesize
    whole fleets of distinct conversations; the defaults reproduce the
    committed golden corpus byte for byte.
    """
    global GS_ADDR, AC_ADDR, REG, FLIGHT
    GS_ADDR, AC_ADDR, REG, FLIGHT = gs_addr, ac_addr, reg, flight
    _ISEQ["n"] = 0
    frames: list[bytes] = []

    # --- XID: GSIF broadcast + LE response -------------------------------
    vdl_params = bytes([0x01, 0x01, 0x03])
    vdl_params += bytes([0xC8, 0x03, 0x1E, 0xCB, 0x31])   # 49.2N 123.1W
    group = bytes([0xF0]) + len(vdl_params).to_bytes(2, "big") + vdl_params
    info = bytes([0x82]) + group + bytes([0x80, 0x00, 0x00])
    lcf = 0x03 | (0x2B << 2)
    frames.append(make_avlc(GS_ADDR, AC_ADDR, lcf, info,
                            src_type=4, dst_type=1))

    le_params = bytes([0x00, 0x02, 0x56, 0x32])
    le_group = bytes([0xF0]) + len(le_params).to_bytes(2, "big") + le_params
    le_info = bytes([0x82]) + le_group
    frames.append(make_avlc(AC_ADDR, GS_ADDR, lcf | 0x10, le_info,
                            src_type=1, dst_type=4, cr=1))

    # --- plain ACARS downlink with H1 sublabel ---------------------------
    frames.append(acars_frame(label="H1",
                              text="#DFB/PIREP OVC BASES 020 TOPS 035"))

    # --- S-frame (receive ready) ----------------------------------------
    frames.append(make_avlc(GS_ADDR, AC_ADDR,
                            0x01 | (1 << 4) | (3 << 5), b"",
                            src_type=4, dst_type=1))

    # --- media advisory (label SA) --------------------------------------
    frames.append(acars_frame(label="SA", text="0EV121314/S2"))

    # --- OHMA (label H1) -------------------------------------------------
    ohma_doc = b'{"systemId":"ENG1","status":"OK","egt":612}'
    ohma = "OHMA" + base64.b64encode(zlib.compress(ohma_doc)).decode()
    frames.append(acars_frame(label="H1", text=ohma))

    # --- MIAM single transfer (label MA): deflated XML CORE PDU ----------
    pdu = miam.CorePdu(version=2, app_id="H1",
                       compression=miam.COMP_DEFLATE,
                       encoding=miam.ENC_ISO5, msg_num=41, msg_ack_num=40,
                       ack_option=1,
                       body=b"<engrpt><n1>92.4</n1><egt>612</egt></engrpt>")
    frames.append(acars_frame(label="MA",
                              text=miam.encode_single_transfer(pdu)))

    # --- MIAM file transfer: request + segments --------------------------
    fpdu = miam.CorePdu(version=1, app_id="H1", encoding=miam.ENC_BINARY,
                        msg_num=42,
                        body=bytes(range(256)) * 2)
    for i, f in enumerate(miam.encode_file_transfer(
            fpdu, file_id=7, seg_chars=220,
            complete_by="20260820120000")):
        frames.append(acars_frame(label="MA", text=f, blk=str(3 + i)))

    # --- ARINC 622: FANS CPDLC downlink request --------------------------
    fans_msg = {
        "header": {"msgIdentificationNumber": 12,
                   "timestamp": {"hours": 10, "minutes": 32,
                                 "seconds": 5}},
        "messageData": [
            ("dM9", ("altitudeFlightLevel", 370)),
            ("dM34", ("speedMach", 820)),
        ],
    }
    at1 = rt.encode(FANS, "FANSATCDownlinkMessage", fans_msg)
    frames.append(acars_frame(label="B6", blk="4",
                              raw_text=wrap_ats("USADCDYA", "AT1",
                                                REG, at1)))

    # --- ARINC 622: FANS connect request (CR1) ---------------------------
    cr1_msg = {
        "header": {"msgIdentificationNumber": 1,
                   "timestamp": {"hours": 10, "minutes": 29,
                                 "seconds": 55}},
        "messageData": [("dM64", "KZAK")],
    }
    cr1 = rt.encode(FANS, "FANSATCDownlinkMessage", cr1_msg)
    frames.append(acars_frame(label="A6", blk="5",
                              raw_text=wrap_ats("USADCDYA", "CR1",
                                                REG, cr1)))

    # --- ARINC 622: ADS-C v1 basic report + flight id --------------------
    def _put_bits(spec):
        bits = []
        for value, n in spec:
            for i in range(n - 1, -1, -1):
                bits.append((value >> i) & 1)
        bits += [0] * (-len(bits) % 8)
        return bytes(sum(b << (7 - i) for i, b in enumerate(bits[j:j + 8]))
                     for j in range(0, len(bits), 8))

    basic = _put_bits([
        (int(round(45.25 / (180.0 / (1 << 20)))) & 0x1FFFFF, 21),
        (int(round(-92.5 / (180.0 / (1 << 20)))) & 0x1FFFFF, 21),
        (int(round(37000 / 4.0)) & 0xFFFF, 16),
        (int(round(2250.0 / 0.125)), 15),
        (1, 1), (5, 3), (1, 1), (0, 2)])
    fid = _put_bits([(ord(c) - 64 if ord(c) >= 64 else ord(c), 6)
                     for c in "AB1234  "])
    adsc = bytes([7]) + basic + bytes([12]) + fid
    frames.append(acars_frame(label="B6", blk="6",
                              raw_text=wrap_ats("USADCDYA", "ADS",
                                                REG, adsc)))

    # --- X.25 call request with facilities + SNDCF -----------------------
    call = bytes([0x1B, 0xFF, 0x0B, 0x00])
    call += bytes([0x05, 0x01, 0x80, 0x42, 0x09, 0x08])
    call += bytes([0xC1, 0x04, 0x01, 0x00, 0x00, 0x02])
    frames.append(iframe(call, downlink=True))

    # --- X.25 control: RR + clear request with diag ----------------------
    frames.append(iframe(bytes([0x1B, 0xFF, 0x01]), downlink=False))
    frames.append(iframe(bytes([0x1B, 0xFF, 0x13, 0x05, 0xF9]),
                         downlink=False))

    # --- CPDLC uplink via X.25 -> CLNP -> COTP -> ICAO -------------------
    frames.append(iframe(
        x25_data(clnp_dt(cotp_dt(cpdlc_uplink_buf())), sseq=0),
        downlink=False))

    # --- CPDLC downlink WILCO via X.25 M-bit reassembly ------------------
    whole = clnp_dt(cotp_dt(cpdlc_downlink_wilco_buf(), dst_ref=0x77))
    frames.append(iframe(x25_data(whole[:20], sseq=1, more=True),
                         downlink=True))
    frames.append(iframe(x25_data(whole[20:], sseq=2), downlink=True))

    # --- CM logon (X.225 short connect + ACSE) via CLNP segmentation -----
    cm_msg = ("cmLogonRequest", {
        "aircraftFlightIdentification": "AB1234",
        "cMLongTSAP": {"rDP": b"\x47\x00\x27\x81\x41",
                       "shortTsap": {"locSysNselTsel": b"0123456789"}},
        "facilityDesignation": "KZAK",
    })
    cm = rt.encode(ICAO, "CMAircraftMessage", cm_msg)
    aarq = ("aarq", {
        "application-context-name": (1, 3, 27, 3, 0),
        "calling-AE-qualifier": ("ae-qualifier-form2", 1),
        "user-information": {
            "data": {"encoding": ("arbitrary", bitstr(cm))}},
    })
    acse = rt.encode(ICAO, "ACSE_apdu", aarq)
    # X.225 Short Connect SPDU + X.226 PPCI (UPER)
    cm_nsdu = cotp_dt(bytes([0xE8, 0x02]) + acse, dst_ref=0x55)
    half = (len(cm_nsdu) + 1) // 2
    frames.append(iframe(
        x25_data(clnp_dt(cm_nsdu[:half], sp=1, ms=1, pdu_id=9,
                         offset=0, total=len(cm_nsdu)), sseq=3),
        downlink=True))
    frames.append(iframe(
        x25_data(clnp_dt(cm_nsdu[half:], sp=1, ms=0, pdu_id=9,
                         offset=half, total=len(cm_nsdu)), sseq=4),
        downlink=True))

    # --- ADS-C v2 positive ack via COTP concatenation (AK + DT) ----------
    inner_ack = rt.encode(ICAO, "ADSPositiveAcknowledgement", {
        "contractNumber": 3,
        "requestType": "demand-contract",
        "connectedATSUList": {},
    })
    ads_buf = rt.encode(ICAO, "ADSAircraftPDUs", {
        "timestamp": {"date": {"year": 2026, "month": 8, "day": 20},
                      "time": {"timeHours": 10, "timeMinutes": 33}},
        "adsAircraftPdu": ("aDS-positive-acknowledgement-PDU", {
            "contract-type": "demand-contract",
            "ic-positive-ack": {"aDSPositiveAck": bitstr(inner_ack),
                                "integrityCheck": bitstr(b"\x9a\xbc")}}),
    })
    nsdu = cotp_ak(seq=2, dst_ref=0x31) + cotp_dt(wrap_fed(ads_buf, 3),
                                                  dst_ref=0x31, seq=1)
    frames.append(iframe(x25_data(clnp_dt(nsdu), sseq=5), downlink=True))

    # --- ES-IS ISH via X.25 -> CLNP? (ES-IS rides directly on X.25) ------
    net = bytes.fromhex("470027015841410000000200")
    opts = bytes([0x81, 0x02, 0x1F, 0xFF])
    pdu_len = 9 + 1 + len(net) + len(opts)
    ish = bytes([0x82, pdu_len, 1, 0, 4, 0x00, 0x1E, 0, 0]) + \
        bytes([len(net)]) + net + opts
    frames.append(iframe(x25_data(ish, sseq=6), downlink=False))

    # --- IDRP open + update w/ NLRI via X.25 -----------------------------
    def idrp_hdr(pdu_type, body, seq=1, ack=2):
        total = 30 + len(body)
        return bytes([0x85]) + total.to_bytes(2, "big") \
            + bytes([pdu_type]) + seq.to_bytes(4, "big") \
            + ack.to_bytes(4, "big") + bytes([3, 4]) + bytes(16) + body

    rdi = bytes.fromhex("470027")
    open_body = bytes([1]) + (60).to_bytes(2, "big") \
        + (1024).to_bytes(2, "big") + bytes([len(rdi)]) + rdi \
        + bytes([1, 2, 13, 15]) + bytes([0]) + bytes([1])
    frames.append(iframe(
        x25_data(clnp_dt(idrp_hdr(1, open_body)), sseq=7),
        downlink=False))

    prefix = bytes.fromhex("47002701")
    nlri = bytes([1, 1, 0x81]) + (1 + len(prefix)).to_bytes(2, "big") + \
        bytes([32]) + prefix
    upd_body = (1).to_bytes(2, "big") + (42).to_bytes(4, "big") + \
        (0).to_bytes(2, "big") + nlri
    frames.append(iframe(
        x25_data(clnp_dt(idrp_hdr(2, upd_body)), sseq=0),
        downlink=False))

    # --- compressed-header CLNP carrying a COTP expedited-style DT -------
    comp = bytes([0x0E, 20, 0x00, 0x05]) + cotp_dt(b"Z", dst_ref=0x42)
    frames.append(iframe(x25_data(comp, sseq=1), downlink=True))

    # --- unparseable X.25 (hexdump fallback, like real METAR traffic) ----
    frames.append(iframe(b"TAF KROC 201142Z 04012KT 2SM -RA BR\n",
                         downlink=False))

    return frames


def main() -> int:
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "proto_corpus.frames")
    frames = build_corpus()
    with open(out_path, "wb") as fh:
        for i, frame in enumerate(frames):
            md = MsgMetadata(
                station_id="CORPUS-1", freq=FREQ,
                frame_pwr_dbfs=-20.0 - (i % 5), nf_pwr_dbfs=-42.5,
                ppm_error=-0.25, burst_timestamp=float(T0 + i),
                datalen_octets=len(frame), synd_weight=0,
                num_fec_corrections=0, idx=0)
            fh.write(frame_record(md, frame))
    print(f"wrote {len(frames)} frames to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
