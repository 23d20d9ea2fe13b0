"""Aux IO subsystems: file rotation, gs/ac enrichment DBs, StatsD wire."""
import socket
import sqlite3
import time

import pytest

from dumpvdl2_tpu.config import Config, reset_config


# ----------------------------------------------------------- file rotation

def test_file_rotation_suffixes(tmp_path):
    from dumpvdl2_tpu.io.outputs import FileOutput
    reset_config()
    Config.utc = True
    out = FileOutput({"path": str(tmp_path / "log.json"),
                      "rotate": "hourly"}, "json")
    now = time.mktime((2026, 8, 20, 14, 5, 0, 0, 0, 0)) - time.timezone
    p = out._suffixed_path(now)
    assert p.endswith("log_20260820_14.json")
    out.rotate = "daily"
    assert out._suffixed_path(now).endswith("log_20260820.json")
    reset_config()


def test_file_rotation_rolls_file(tmp_path, monkeypatch):
    from dumpvdl2_tpu.io import outputs as outputs_mod
    reset_config()
    Config.utc = True
    out = outputs_mod.FileOutput({"path": str(tmp_path / "r.txt"),
                                  "rotate": "hourly"}, "text")
    t0 = 3600.0 * 1000
    monkeypatch.setattr(outputs_mod.time, "time", lambda: t0)
    out.init()
    out.produce(None, b"first")
    monkeypatch.setattr(outputs_mod.time, "time", lambda: t0 + 3600)
    out.produce(None, b"second")
    out.handle_shutdown()
    files = sorted(f.name for f in tmp_path.iterdir())
    assert len(files) == 2, files
    reset_config()


def test_file_rotation_rejected_on_stdout():
    from dumpvdl2_tpu.io.outputs import FileOutput, OutputError
    with pytest.raises(OutputError):
        FileOutput({"path": "-", "rotate": "hourly"}, "text")


# ----------------------------------------------------------------- gs_data

def test_gs_data_import_and_lookup(tmp_path):
    from dumpvdl2_tpu.io.gs_data import gs_data_import, gs_lookup
    f = tmp_path / "gs.txt"
    f.write_text(
        "# comment line\n"
        "2EB2D6 [EGLL Heathrow VDL] [London, UK]\n"
        "10A7C5\n"
        "garbage that does not parse !!!\n")
    n = gs_data_import(str(f))
    assert n == 2
    e = gs_lookup(0x2EB2D6)
    assert e["airport_code"] == "EGLL"
    assert e["location"] == "London, UK"
    assert gs_lookup(0x10A7C5) is not None
    assert gs_lookup(0x123456) is None


# ----------------------------------------------------------------- ac_data

def test_ac_data_lookup_and_cache(tmp_path):
    from dumpvdl2_tpu.io import ac_data
    from dumpvdl2_tpu.app.stats import stats
    db = tmp_path / "bs.sqb"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE Aircraft (ModeS TEXT, Registration TEXT,"
                 " ICAOTypeCode TEXT, OperatorFlagCode TEXT,"
                 " Manufacturer TEXT, Type TEXT, RegisteredOwners TEXT)")
    conn.execute("INSERT INTO Aircraft VALUES ('A12345', 'N123AB', 'B738',"
                 " 'SWA', 'Boeing', '737-8H4', 'Southwest Airlines')")
    conn.commit()
    conn.close()
    assert ac_data.ac_data_init(str(db))
    stats.reset()
    ac_data._cache.clear()
    e = ac_data.ac_lookup(0xA12345)
    assert e["registration"] == "N123AB"
    assert e["registeredowners"] == "Southwest Airlines"
    # second lookup is a cache hit
    assert ac_data.ac_lookup(0xA12345) == e
    assert stats.counters["ac_data.cache.hits"] == 1
    assert stats.counters["ac_data.cache.misses"] == 1
    # negative cache
    assert ac_data.ac_lookup(0x000001) is None
    assert ac_data.ac_lookup(0x000001) is None
    assert stats.counters["ac_data.cache.misses"] == 2


# ------------------------------------------------------------------ statsd

def test_statsd_wire_format():
    from dumpvdl2_tpu.io.statsd_client import StatsdClient
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(10)
    port = rx.getsockname()[1]
    cl = StatsdClient(f"127.0.0.1:{port}", station_id="XX-TEST1")
    cl.increment("decoder.msg.good")
    cl.gauge("ac_data.cache.entries", 42)
    cl.timing("decoder.msg.processing_time", 1.25)
    lines = [rx.recv(1024).decode() for _ in range(3)]
    rx.close()
    assert lines[0] == "dumpvdl2_tpu.XX-TEST1.decoder.msg.good:1|c"
    assert lines[1] == "dumpvdl2_tpu.XX-TEST1.ac_data.cache.entries:42|g"
    assert lines[2] == \
        "dumpvdl2_tpu.XX-TEST1.decoder.msg.processing_time:1.250|ms"
