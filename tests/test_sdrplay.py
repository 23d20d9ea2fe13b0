"""SDRPlay v2/v3 driver logic tests (fake devices; no hardware)."""
import types

import numpy as np
import pytest

from dumpvdl2_tpu.io import sdrplay, sdrplay3
from dumpvdl2_tpu.io.sdrplay_common import StreamBridge

# ------------------------------------------------------------------ v2


def test_v2_hw_type_mapping():
    # reference sdrplay.c:199-211
    assert sdrplay.hw_type_from_hwver(1) == sdrplay.HW_RSP1
    assert sdrplay.hw_type_from_hwver(2) == sdrplay.HW_RSP2
    assert sdrplay.hw_type_from_hwver(3) == sdrplay.HW_RSPDUO
    assert sdrplay.hw_type_from_hwver(254) == sdrplay.HW_RSP1A
    assert sdrplay.hw_type_from_hwver(255) == sdrplay.HW_RSP1A
    assert sdrplay.hw_type_from_hwver(4) is None


@pytest.mark.parametrize("hw,gr,want", [
    # lowest LNA state reachable wins (sdrplay.c:349-360)
    (sdrplay.HW_RSP1A, 40, (40, 0)),
    (sdrplay.HW_RSP1A, 70, (58, 2)),
    (sdrplay.HW_RSP1, 20, (20, 0)),
    (sdrplay.HW_RSP2, 85, (51, 5)),
    (sdrplay.HW_RSPDUO, 121, (59, 9)),
])
def test_v2_gain_reduction_split(hw, gr, want):
    assert sdrplay.select_gain_reduction(hw, gr) == want


def test_v2_gain_reduction_out_of_range():
    with pytest.raises(ValueError, match="min=20 max=102"):
        sdrplay.select_gain_reduction(sdrplay.HW_RSP1, 150)
    # RSP1A adds the mixer GR to the advertised max (sdrplay.c:362-367)
    with pytest.raises(ValueError, match="min=20 max=140"):
        sdrplay.select_gain_reduction(sdrplay.HW_RSP1A, 19)


def test_v2_device_search_numeric_then_serial():
    devices = [("1234567890", True, 2), ("ABCDEF", True, 3)]
    # numeric index takes precedence over serial match (sdrplay.c:172-189)
    assert sdrplay.verbose_device_search("1", devices) == 1
    assert sdrplay.verbose_device_search("ABCDEF", devices) == 1
    assert sdrplay.verbose_device_search("1234567890", devices) == 0
    assert sdrplay.verbose_device_search("nope", devices) == -1
    assert sdrplay.verbose_device_search("5", devices) == -1


def test_v2_device_search_rejects_unavailable_and_unsupported():
    assert sdrplay.verbose_device_search(
        "0", [("SN1", False, 2)]) == -1          # in use
    assert sdrplay.verbose_device_search(
        "0", [("SN1", True, 77)]) == -1          # unknown hwVer
    assert sdrplay.verbose_device_search("0", []) == -1


def test_v2_constants_match_reference():
    assert sdrplay.SDRPLAY_OVERSAMPLE == 20          # sdrplay.h:22
    assert sdrplay.SDRPLAY_DEFAULT_AGC_SETPOINT == -30
    assert (sdrplay.MIN_IF_GR, sdrplay.MAX_IF_GR) == (20, 59)
    assert sdrplay.LNA_GR_TABLES[sdrplay.HW_RSP2][8] == 64


# ------------------------------------------------------------------ v3


def _fake_params():
    mk = lambda **kw: types.SimpleNamespace(**kw)
    dev = mk(rsp1aParams=mk(rfNotchEnable=0, rfDabNotchEnable=0),
             rspDxParams=mk(hdrEnable=0, biasTEnable=0, antennaSel=-1,
                            rfNotchEnable=0, rfDabNotchEnable=0))
    ch = mk(tunerParams=mk(gain=mk(gRdB=0, LNAstate=0)),
            ctrlParams=mk(agc=mk(enable=-1, setPoint_dBfs=0)),
            rsp1aTunerParams=mk(biasTEnable=0),
            rsp2TunerParams=mk(biasTEnable=0, antennaSel=-1,
                               rfNotchEnable=0),
            rspDuoTunerParams=mk(biasTEnable=0, rfNotchEnable=0,
                                 rfDabNotchEnable=0))
    return dev, ch


@pytest.mark.parametrize("hwver,target", [
    (sdrplay3.RSP2_ID, "ch.rsp2TunerParams.biasTEnable"),
    (sdrplay3.RSP1A_ID, "ch.rsp1aTunerParams.biasTEnable"),
    (sdrplay3.RSP1B_ID, "ch.rsp1aTunerParams.biasTEnable"),
    (sdrplay3.RSPduo_ID, "ch.rspDuoTunerParams.biasTEnable"),
    (sdrplay3.RSPdx_ID, "dev.rspDxParams.biasTEnable"),
    (sdrplay3.RSPdxR2_ID, "dev.rspDxParams.biasTEnable"),
])
def test_v3_biast_routing(hwver, target):
    # parameter-block routing mirrors sdrplay3.c:165-191
    dev, ch = _fake_params()
    assert sdrplay3.set_biast(dev, ch, hwver)
    scope = {"dev": dev, "ch": ch}
    assert eval(target, scope) == 1


def test_v3_biast_unsupported_on_rsp1():
    dev, ch = _fake_params()
    assert not sdrplay3.set_biast(dev, ch, sdrplay3.RSP1_ID)


def test_v3_notch_routing():
    # RSP1A routes the bcast notch via DEVICE params, unlike bias-T
    # (sdrplay3.c:203-205)
    dev, ch = _fake_params()
    assert sdrplay3.set_notch_filter(dev, ch, sdrplay3.RSP1A_ID)
    assert dev.rsp1aParams.rfNotchEnable == 1
    assert sdrplay3.set_notch_filter(dev, ch, sdrplay3.RSP2_ID)
    assert ch.rsp2TunerParams.rfNotchEnable == 1
    assert not sdrplay3.set_notch_filter(dev, ch, sdrplay3.RSP1_ID)


def test_v3_dab_notch_routing():
    dev, ch = _fake_params()
    assert not sdrplay3.set_dab_notch_filter(dev, ch, sdrplay3.RSP2_ID)
    assert sdrplay3.set_dab_notch_filter(dev, ch, sdrplay3.RSPduo_ID)
    assert ch.rspDuoTunerParams.rfDabNotchEnable == 1
    assert sdrplay3.set_dab_notch_filter(dev, ch, sdrplay3.RSPdx_ID)
    assert dev.rspDxParams.rfDabNotchEnable == 1


def test_v3_antenna_routing():
    dev, ch = _fake_params()
    assert sdrplay3.select_antenna(dev, ch, sdrplay3.RSP2_ID, "B")
    assert ch.rsp2TunerParams.antennaSel == 6      # sdrplay_api_Rsp2_ANTENNA_B
    assert sdrplay3.select_antenna(dev, ch, sdrplay3.RSPdx_ID, "C")
    assert dev.rspDxParams.antennaSel == 2
    assert not sdrplay3.select_antenna(dev, ch, sdrplay3.RSP2_ID, "C")
    assert not sdrplay3.select_antenna(dev, ch, sdrplay3.RSP1A_ID, "A")


def test_v3_gain_config_agc_vs_manual():
    dev, ch = _fake_params()
    # either component unset -> AGC at default set point (sdrplay3.c:448-451)
    sdrplay3.configure_gain(ch, -100, 0, 0)
    assert ch.ctrlParams.agc.enable == 3           # sdrplay_api_AGC_5HZ
    assert ch.ctrlParams.agc.setPoint_dBfs == -30
    # explicit negative set point is honored
    sdrplay3.configure_gain(ch, -100, -100, -44)
    assert ch.ctrlParams.agc.setPoint_dBfs == -44
    # both set -> manual, AGC off
    sdrplay3.configure_gain(ch, 40, 3, 0)
    assert ch.ctrlParams.agc.enable == 0
    assert ch.tunerParams.gain.gRdB == 40
    assert ch.tunerParams.gain.LNAstate == 3


def test_v3_device_search_serial_before_numeric():
    # exact serial match first, then raw index (sdrplay3.c:299-314)
    devices = [("1", sdrplay3.RSPdx_ID), ("SN9", sdrplay3.RSP1A_ID)]
    assert sdrplay3.verbose_device_search("1", devices) == 0
    assert sdrplay3.verbose_device_search("SN9", devices) == 1
    assert sdrplay3.verbose_device_search("0", devices) == 0
    assert sdrplay3.verbose_device_search("XX", devices) == -1


def test_v3_struct_layout_sanity():
    import ctypes
    # spot-check the pinned 3.08+ ABI offsets
    assert ctypes.sizeof(sdrplay3._StreamCbParamsT) == 24
    assert sdrplay3._DeviceT.SerNo.size == 64
    assert sdrplay3._DeviceParamsT.rxChannelA.offset == \
        ctypes.sizeof(ctypes.c_void_p)
    # agc block must start right after dcOffset+decimation
    assert sdrplay3._CtrlParamsT.agc.offset > 0


# ------------------------------------------------------------- bridge


def test_stream_bridge_interleave_and_blocks():
    import ctypes
    br = StreamBridge()
    xi = (ctypes.c_short * 4)(1000, 2000, 3000, 4000)
    xq = (ctypes.c_short * 4)(-1000, -2000, -3000, -4000)
    br.push(xi, xq, 4)
    br.stop()
    blocks = list(br.blocks(lambda: False, min_samples=1))
    assert len(blocks) == 1
    blk = blocks[0]
    assert blk.dtype == np.complex64 and blk.shape == (4,)
    np.testing.assert_allclose(blk.imag * 32768.0,
                               [-1000, -2000, -3000, -4000], atol=1e-3)
    np.testing.assert_allclose(blk.real * 32768.0,
                               [1000, 2000, 3000, 4000], atol=1e-3)


def test_stream_bridge_final_flush_without_stop():
    import ctypes
    br = StreamBridge()
    xi = (ctypes.c_short * 2)(5, 6)
    xq = (ctypes.c_short * 2)(7, 8)
    br.push(xi, xq, 2)
    calls = iter([False, True, True, True])
    blocks = list(br.blocks(lambda: next(calls), min_samples=10 ** 6))
    assert len(blocks) == 1 and blocks[0].shape == (2,)


# ----------------------------------------------------------------- CLI


def test_cli_sdrplay_flags_parse_and_fail_cleanly(capsys, monkeypatch):
    from dumpvdl2_tpu.app import cli
    parser = cli.build_parser()
    args = parser.parse_args(
        ["--sdrplay3", "XX123", "--ifgr", "40", "--lna-state", "2",
         "--agc", "-35", "--biast", "1", "--notch-filter", "1",
         "--dab-notch-filter", "1", "--tuner", "2"])
    assert args.sdrplay3 == "XX123" and args.ifgr == 40
    assert args.lna_state == 2 and args.dab_notch_filter == 1

    # without the vendor library the runner reports and exits nonzero
    monkeypatch.setattr(sdrplay3, "load_sdrplay_api", lambda: None)
    rc = sdrplay3.run_sdrplay3(args, None, None)
    assert rc == 1
    assert "not found" in capsys.readouterr().err

    monkeypatch.setattr(sdrplay, "load_libmirsdr", lambda: None)
    args2 = parser.parse_args(["--sdrplay", "0", "--gr", "50"])
    assert sdrplay.run_sdrplay(args2, None, None) == 1
