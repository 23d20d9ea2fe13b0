"""RTL-SDR driver logic tests (no hardware: fake device objects)."""
import pytest

from dumpvdl2_tpu.io.rtl import (RTL_BUFSIZE, RTL_OVERSAMPLE, nearest_gain,
                                 rtl_configure, verbose_device_search)


class FakeDev:
    def __init__(self, serials=("00000001", "DV123456"),
                 gains=(0, 9, 14, 27, 37, 77, 87, 125, 144, 157,
                        166, 197, 207, 229, 254, 280, 297, 328,
                        338, 364, 372, 386, 402, 421, 434, 439,
                        445, 480, 496)):
        self.serials = list(serials)
        self.gains = list(gains)
        self.calls = []
        self.fail = set()

    def device_count(self):
        return len(self.serials)

    def device_usb_strings(self, i):
        return ("Realtek", "RTL2838UHIDIR", self.serials[i])

    def device_name(self, i):
        return f"Generic RTL2832U (device {i})"

    def _call(self, name, *a):
        self.calls.append((name,) + a)
        return -9 if name in self.fail else 0

    def __getattr__(self, name):
        if name == "get_tuner_gains_list":
            return lambda: self.gains
        if name == "get_tuner_gain":
            return lambda: 297
        return lambda *a: self._call(name, *a)


def test_device_search_by_index(capsys):
    dev = FakeDev()
    assert verbose_device_search("1", dev) == 1
    assert verbose_device_search("0x0", dev) == 0


def test_device_search_serial_exact_prefix_suffix():
    dev = FakeDev(serials=["00000001", "DV123456", "ABCD9999"])
    assert verbose_device_search("DV123456", dev) == 1   # exact (8 chars)
    assert verbose_device_search("ABCD", dev) == 2       # prefix
    assert verbose_device_search("9999", dev) == 2       # suffix
    assert verbose_device_search("XYZZY", dev) == -1


def test_device_search_eight_char_index_like_serial():
    """8-char numeric strings try serial match FIRST (rtl.c:76-77)."""
    dev = FakeDev(serials=["00000001", "00000000"])
    assert verbose_device_search("00000000", dev) == 1


def test_nearest_gain():
    dev = FakeDev()
    assert nearest_gain(dev, 280) == 280
    assert nearest_gain(dev, 300) == 297
    assert nearest_gain(dev, 10000) == 496
    assert nearest_gain(dev, -50) == 0


def test_rtl_configure_sequence():
    dev = FakeDev()
    rtl_configure(dev, 0, 1050000, 136975000, 0, 29.7, 1, 1)
    names = [c[0] for c in dev.calls]
    assert "set_sample_rate" in names
    assert "set_center_freq" in names
    assert "set_freq_correction" in names
    assert "set_tuner_gain" in names
    assert ("set_agc_mode", 0) in dev.calls
    assert ("set_bias_tee", 1) in dev.calls
    assert "reset_buffer" in names
    # nearest gain applied: 29.7 dB -> 297 tenths (exact entry)
    assert ("set_tuner_gain", 297) in dev.calls


def test_rtl_configure_auto_gain():
    from dumpvdl2_tpu.io.rtl import SDR_AUTO_GAIN
    dev = FakeDev()
    rtl_configure(dev, 0, 1050000, 136975000, 0, SDR_AUTO_GAIN, 0, 0)
    assert ("set_tuner_gain_mode", 0) in dev.calls
    assert "set_tuner_gain" not in [c[0] for c in dev.calls]


def test_rtl_configure_failure_raises():
    dev = FakeDev()
    dev.fail.add("set_center_freq")
    with pytest.raises(RuntimeError):
        rtl_configure(dev, 0, 1050000, 136975000, 0, 20.0, 0, 0)


def test_constants_match_reference():
    assert RTL_BUFSIZE == 320000      # rtl.h:21
    assert RTL_OVERSAMPLE == 10       # rtl.h:23


def test_cli_rtlsdr_without_library():
    """--rtlsdr on a host without librtlsdr fails cleanly."""
    import ctypes.util
    from test_cli import run_cli
    if ctypes.util.find_library("rtlsdr"):
        pytest.skip("librtlsdr present on this host")
    r = run_cli(["--rtlsdr", "0"])
    assert r.returncode == 1
    assert b"librtlsdr not found" in r.stderr
