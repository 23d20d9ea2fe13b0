"""SoapySDR driver tests with a fake SoapySDR module (same pattern as
tests/test_rtl.py): configure-sequence assertions, gain precedence,
auto-gain, read loop -> pipeline feed, and failure paths.  Closes the
"only untested driver" gap from the round-2 review.
"""
import sys
import types

import numpy as np
import pytest

from dumpvdl2_tpu.io import sdr as sdr_mod


class FakeStreamResult:
    def __init__(self, ret):
        self.ret = ret


class FakeDevice:
    def __init__(self, query):
        self.query = query
        self.calls = []
        self.gain_elements = {}
        self.has_gain_mode = True
        self.has_dc_offset = True
        self.read_plan = []          # list of int16 arrays or int errors

    def _log(self, name, *a):
        self.calls.append((name,) + a)

    def setSampleRate(self, d, c, rate):
        self._log("setSampleRate", rate)

    def setFrequency(self, d, c, f):
        self._log("setFrequency", f)

    def setFrequencyCorrection(self, d, c, ppm):
        self._log("setFrequencyCorrection", ppm)

    def setBandwidth(self, d, c, bw):
        self._log("setBandwidth", bw)

    def hasDCOffsetMode(self, d, c):
        return self.has_dc_offset

    def setDCOffsetMode(self, d, c, on):
        self._log("setDCOffsetMode", on)

    def hasGainMode(self, d, c):
        return self.has_gain_mode

    def setGainMode(self, d, c, on):
        self._log("setGainMode", on)

    def setGain(self, d, c, g):
        self._log("setGain", g)

    def setGainElement(self, d, c, name, val):
        self.gain_elements[name] = val
        self._log("setGainElement", name, val)

    def getGainElement(self, d, c, name):
        return self.gain_elements.get(name, 0.0)

    def setAntenna(self, d, c, a):
        self._log("setAntenna", a)

    def getAntenna(self, d, c):
        return "RX"

    def writeSetting(self, k, v):
        self._log("writeSetting", k, v)

    def setupStream(self, d, fmt):
        self._log("setupStream", fmt)
        return "stream"

    def activateStream(self, s):
        self._log("activateStream")

    def deactivateStream(self, s):
        self._log("deactivateStream")

    def closeStream(self, s):
        self._log("closeStream")

    def readStream(self, s, bufs, n):
        if not self.read_plan:
            raise KeyboardInterrupt
        item = self.read_plan.pop(0)
        if isinstance(item, int):
            return FakeStreamResult(item)
        bufs[0][:item.size] = item
        return FakeStreamResult(item.size // 2)


@pytest.fixture
def fake_soapy(monkeypatch):
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_RX = 1
    mod.SOAPY_SDR_CS16 = "CS16"
    created = []

    def Device(query):
        dev = FakeDevice(query)
        created.append(dev)
        return dev

    mod.Device = Device
    mod.created = created
    monkeypatch.setitem(sys.modules, "SoapySDR", mod)
    return mod


class Args(types.SimpleNamespace):
    def __init__(self, **kw):
        base = dict(soapysdr="driver=rtlsdr", gain=None, correction=0.0,
                    bandwidth=0, antenna=None, device_settings=None,
                    soapy_gain=None, soapy_antenna=None)
        base.update(kw)
        super().__init__(**base)


class FakePipeline:
    sample_rate = 2100000
    centerfreq = 136975000

    def __init__(self):
        self.blocks = []

    def feed(self, iq, eof=False):
        self.blocks.append(np.asarray(iq))
        return []

    def finish(self):
        return []


class FakeDecoder:
    def process_all(self, frames):
        pass


def test_configure_sequence_manual_gain(fake_soapy):
    args = Args(gain=32.8, correction=1.5, bandwidth=300000,
                antenna="Tuner 1 50 ohm",
                device_settings="biastee=true,rfnotch_ctrl=false")
    pipe = FakePipeline()
    dev = fake_soapy.Device(args.soapysdr)
    assert sdr_mod.configure_device(fake_soapy, dev, args, pipe)
    names = [c[0] for c in dev.calls]
    assert names[:3] == ["setSampleRate", "setFrequency",
                         "setFrequencyCorrection"]
    assert ("setSampleRate", 2100000) in dev.calls
    assert ("setFrequency", 136975000) in dev.calls
    assert ("setFrequencyCorrection", 1.5) in dev.calls
    assert ("setBandwidth", 300000) in dev.calls
    assert ("setDCOffsetMode", True) in dev.calls
    assert ("setGain", 32.8) in dev.calls
    assert ("setAntenna", "Tuner 1 50 ohm") in dev.calls
    assert ("writeSetting", "biastee", "true") in dev.calls
    assert ("writeSetting", "rfnotch_ctrl", "false") in dev.calls


def test_soapy_antenna_takes_precedence(fake_soapy):
    """--soapy-antenna (reference soapysdr.c:91) wins over --antenna."""
    args = Args(gain=20.0, antenna="A", soapy_antenna="RX2")
    dev = fake_soapy.Device(args.soapysdr)
    assert sdr_mod.configure_device(fake_soapy, dev, args, FakePipeline())
    assert ("setAntenna", "RX2") in dev.calls
    assert ("setAntenna", "A") not in dev.calls


def test_auto_gain_when_no_gain_given(fake_soapy):
    dev = fake_soapy.Device("x")
    assert sdr_mod.configure_device(fake_soapy, dev, Args(),
                                    FakePipeline())
    assert ("setGainMode", True) in dev.calls
    assert not any(c[0] == "setGain" for c in dev.calls)


def test_auto_gain_unsupported_fails(fake_soapy):
    dev = fake_soapy.Device("x")
    dev.has_gain_mode = False
    assert not sdr_mod.configure_device(fake_soapy, dev, Args(),
                                        FakePipeline())


def test_soapy_gain_precedence_and_parse(fake_soapy):
    """--soapy-gain overrides --gain (reference soapysdr.c:75-76)."""
    dev = fake_soapy.Device("x")
    args = Args(gain=40.0, soapy_gain="LNA=20,VGA=12.5")
    assert sdr_mod.configure_device(fake_soapy, dev, args, FakePipeline())
    assert ("setGainElement", "LNA", 20.0) in dev.calls
    assert ("setGainElement", "VGA", 12.5) in dev.calls
    assert not any(c[0] in ("setGain", "setGainMode") for c in dev.calls)

    bad = fake_soapy.Device("x")
    assert not sdr_mod.configure_device(
        fake_soapy, bad, Args(soapy_gain="LNA20"), FakePipeline())


def test_read_loop_feeds_pipeline(fake_soapy):
    args = Args(gain=30.0)
    pipe = FakePipeline()
    rc_holder = {}

    orig_device = fake_soapy.Device

    def Device(query):
        dev = orig_device(query)
        samples = np.arange(64, dtype=np.int16)
        dev.read_plan = [samples, samples]   # then KeyboardInterrupt
        rc_holder["dev"] = dev
        return dev

    fake_soapy.Device = Device
    rc = sdr_mod.run_soapysdr(args, FakeDecoder(), pipe)
    assert rc == 0
    dev = rc_holder["dev"]
    assert ("setupStream", "CS16") in dev.calls
    assert ("activateStream",) in dev.calls
    assert ("deactivateStream",) in dev.calls and ("closeStream",) in dev.calls
    assert len(pipe.blocks) == 2
    # int16 interleaved -> complex64 scaled by 1/32768
    want = (np.arange(64)[0::2] + 1j * np.arange(64)[1::2]) / 32768.0
    np.testing.assert_allclose(pipe.blocks[0], want.astype(np.complex64),
                               rtol=1e-6)


def test_read_error_exits_nonzero(fake_soapy):
    """A failed read exits so a supervisor restarts the process
    (reference soapysdr.c:174-178 / NEWS 2.4.0)."""
    orig_device = fake_soapy.Device

    def Device(query):
        dev = orig_device(query)
        dev.read_plan = [-1]
        return dev

    fake_soapy.Device = Device
    rc = sdr_mod.run_soapysdr(Args(gain=10.0), FakeDecoder(),
                              FakePipeline())
    assert rc == 1


def test_missing_module_fails_gracefully(monkeypatch):
    monkeypatch.setitem(sys.modules, "SoapySDR", None)
    rc = sdr_mod.run_soapysdr(Args(), FakeDecoder(), FakePipeline())
    assert rc == 1
