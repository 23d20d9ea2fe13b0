"""Live SDR ingest via SoapySDR (generic driver).

The reference ships five native SDR drivers (RTL-SDR, Mirics, SDRPlay
v2/v3, SoapySDR); this framework ingests live IQ through the SoapySDR
abstraction, which covers all those device families.  Requires the
SoapySDR python module; inputs fail gracefully when it is absent.
"""
from __future__ import annotations

import sys

import numpy as np

SOAPY_OVERSAMPLE = 20


def run_soapysdr(args, decoder, pipeline) -> int:
    from ..utils.debug import D_SDR, debug_print
    debug_print(D_SDR, "starting SoapySDR input: %r", args.soapysdr)
    try:
        import SoapySDR
        from SoapySDR import SOAPY_SDR_RX, SOAPY_SDR_CS16
    except ImportError:
        print("error: SoapySDR python module not available in this "
              "environment; use --iq-file or --raw-frames-file",
              file=sys.stderr)
        return 1

    dev = SoapySDR.Device(args.soapysdr)
    rate = pipeline.sample_rate
    dev.setSampleRate(SOAPY_SDR_RX, 0, rate)
    dev.setFrequency(SOAPY_SDR_RX, 0, pipeline.centerfreq)
    if args.gain is not None:
        dev.setGain(SOAPY_SDR_RX, 0, args.gain)
    if args.correction:
        try:
            dev.setFrequencyCorrection(SOAPY_SDR_RX, 0, args.correction)
        except Exception:
            pass
    if args.antenna:
        dev.setAntenna(SOAPY_SDR_RX, 0, args.antenna)
    if args.device_settings:
        for kv in args.device_settings.split(","):
            k, _, v = kv.partition("=")
            dev.writeSetting(k, v)

    stream = dev.setupStream(SOAPY_SDR_RX, SOAPY_SDR_CS16)
    dev.activateStream(stream)
    bufsize = 1 << 18
    buf = np.empty(2 * bufsize, dtype=np.int16)
    try:
        while True:
            sr = dev.readStream(stream, [buf], bufsize)
            n = sr.ret
            if n <= 0:
                print(f"SoapySDR read failed: {n}", file=sys.stderr)
                return 1
            flat = buf[: 2 * n].astype(np.float32) / 32768.0
            iq = (flat[0::2] + 1j * flat[1::2]).astype(np.complex64)
            decoder.process_all(pipeline.feed(iq))
    except KeyboardInterrupt:
        return 0
    finally:
        dev.deactivateStream(stream)
        dev.closeStream(stream)
