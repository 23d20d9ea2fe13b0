"""Drive the compiled reference demod oracle (tools/build_demodref.sh)
over a raw S16_LE IQ file and print one JSON object per decoded frame.

Run as a subprocess by tests/test_demod_diff.py — the oracle library
holds global channel state and a terminal flush, so each scenario gets
its own process.

Usage: python tools/demodref_drive.py <iq_file> [freq [center [rate [os]]]]
"""
import ctypes
import json
import sys

LIB = "/tmp/demodref/libdemodref.so"


class Evt(ctypes.Structure):
    _fields_ = [("frame_pwr_dbfs", ctypes.c_float),
                ("nf_pwr_dbfs", ctypes.c_float),
                ("ppm_error", ctypes.c_float),
                ("datalen_octets", ctypes.c_uint32),
                ("synd_weight", ctypes.c_uint32),
                ("num_fec_corrections", ctypes.c_int32),
                ("idx", ctypes.c_int32),
                ("frame_len", ctypes.c_int32)]


def main() -> int:
    path = sys.argv[1]
    freq = int(sys.argv[2]) if len(sys.argv) > 2 else 136975000
    center = int(sys.argv[3]) if len(sys.argv) > 3 else freq
    rate = int(sys.argv[4]) if len(sys.argv) > 4 else 1050000
    oversample = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    lib = ctypes.CDLL(LIB)
    lib.ref_demod_mag_nf.restype = ctypes.c_double
    rc = lib.ref_demod_start(center, freq, rate, oversample)
    assert rc == 0, rc

    raw = open(path, "rb").read()
    BUF = 320000                      # FILE_BUFSIZE, dumpvdl2.h:48
    for i in range(0, len(raw), BUF):
        chunk = raw[i:i + BUF]
        if len(chunk) % 2:
            chunk = chunk[:-1]
        b = ctypes.create_string_buffer(chunk, len(chunk))
        assert lib.ref_demod_feed_s16(b, len(chunk)) == 0
    n = lib.ref_demod_flush()

    e = Evt()
    out = []
    for i in range(n):
        lib.ref_demod_get_frame(i, ctypes.byref(e))
        buf = ctypes.create_string_buffer(1 << 16)
        ln = lib.ref_demod_get_frame_bytes(i, buf, 1 << 16)
        out.append({
            "frame_pwr_dbfs": e.frame_pwr_dbfs,
            "nf_pwr_dbfs": e.nf_pwr_dbfs,
            "ppm_error": e.ppm_error,
            "datalen_octets": e.datalen_octets,
            "synd_weight": e.synd_weight,
            "num_fec_corrections": e.num_fec_corrections,
            "idx": e.idx,
            "frame_hex": bytes(buf.raw[:ln]).hex() if ln >= 0 else None,
        })
    print(json.dumps({"frames": out,
                      "mag_nf": lib.ref_demod_mag_nf()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
