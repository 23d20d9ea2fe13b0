"""Mirics driver logic tests (fake device; no hardware)."""
import pytest

from dumpvdl2_tpu.io.mirics import (MIRISDR_BUFSIZE, MIRISDR_OVERSAMPLE,
                                    SDR_AUTO_GAIN, mirics_configure)
from test_rtl import FakeDev


class FakeMiri(FakeDev):
    def __init__(self):
        # libmirisdr gains are whole dB
        super().__init__(gains=list(range(0, 103)))

    def get_tuner_gain(self):
        return 40


def test_mirics_configure_sequence():
    dev = FakeMiri()
    mirics_configure(dev, 0, 1, 1, 1365000, 136975000, 40.0, 100)
    calls = dev.calls
    assert ("set_hw_flavour", 1) in calls
    assert ("set_transfer", b"BULK") in calls
    assert ("set_sample_rate", 1365000) in calls
    # --correction is an absolute Hz offset for this driver
    assert ("set_center_freq", 136975000 - 100) in calls
    assert ("set_tuner_gain", 40) in calls
    assert ("set_sample_format", b"252_S16") in calls
    assert "reset_buffer" in [c[0] for c in calls]


def test_mirics_auto_gain_and_isoc():
    dev = FakeMiri()
    mirics_configure(dev, 0, 0, 0, 1365000, 136975000, SDR_AUTO_GAIN, 0)
    assert ("set_transfer", b"ISOC") in dev.calls
    assert ("set_tuner_gain_mode", 0) in dev.calls
    assert "set_tuner_gain" not in [c[0] for c in dev.calls]


def test_mirics_invalid_params():
    dev = FakeMiri()
    with pytest.raises(RuntimeError):
        mirics_configure(dev, 0, 7, 0, 1365000, 136975000, 40.0, 0)
    with pytest.raises(RuntimeError):
        mirics_configure(dev, 0, 0, 9, 1365000, 136975000, 40.0, 0)


def test_mirics_constants_match_reference():
    assert MIRISDR_BUFSIZE == 320000     # mirics.h:21
    assert MIRISDR_OVERSAMPLE == 13      # mirics.h:23


def test_cli_mirisdr_without_library():
    import ctypes.util
    from test_cli import run_cli
    if ctypes.util.find_library("mirisdr"):
        pytest.skip("libmirisdr present on this host")
    r = run_cli(["--mirisdr", "0"])
    assert r.returncode == 1
    assert b"libmirisdr-4 not found" in r.stderr
