"""End-to-end CLI tests: the reference CI criterion and output matrix."""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=600, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-m", "dumpvdl2_tpu", "--platform", "cpu"] + args,
        capture_output=True, timeout=timeout, env=env, cwd=REPO)


@pytest.mark.golden
@pytest.mark.parametrize("l2", ["0", "1"])
def test_cli_reference_ci_criterion(reference_wav, l2):
    """The upstream CI test verbatim (build.yml:15-17,62-66).

    Runs with both L2 decoders: the scalar host path and the batched
    device path (DUMPVDL2_TPU_L2=1 forces it on the CPU backend).
    """
    r = run_cli(["--iq-file", str(reference_wav),
                 "--sample-format", "S16_LE", "--extended-header"],
                extra_env={"DUMPVDL2_TPU_L2": l2})
    assert r.returncode == 0, r.stderr.decode()
    text = r.stdout.decode()
    pat = re.compile("20 2d 52 41 20 42 52 20 4f 56 43 30 30 35 0a"
                     "|20 53 4c 50 31 33 35 0a")
    matches = [line for line in text.splitlines() if pat.search(line)]
    assert len(matches) == 2


@pytest.mark.golden
def test_cli_json_and_binary_roundtrip(reference_wav, tmp_path):
    jsonf = tmp_path / "out.json"
    binf = tmp_path / "out.bin"
    r = run_cli(["--iq-file", str(reference_wav),
                 "--sample-format", "S16_LE",
                 "--output", f"decoded:json:file:path={jsonf}",
                 "--output", f"raw:binary:file:path={binf}"])
    assert r.returncode == 0, r.stderr.decode()
    import json
    lines = jsonf.read_text().splitlines()
    assert len(lines) == 2
    doc = json.loads(lines[0])
    assert doc["vdl2"]["freq"] == 136975000
    assert doc["vdl2"]["avlc"]["frame_type"] == "I"

    # replay: binary archive through the raw-frames input
    r2 = run_cli(["--raw-frames-file", str(binf), "--extended-header"])
    assert r2.returncode == 0, r2.stderr.decode()
    assert b"54 41 46 20" in r2.stdout   # "TAF " hexdump present


def test_cli_bad_output_spec():
    r = run_cli(["--iq-file", "/dev/null", "--output", "bogus"])
    assert r.returncode == 1
    assert b"invalid output spec" in r.stderr


def test_cli_no_input():
    r = run_cli([])
    assert r.returncode == 1
    assert b"no input specified" in r.stderr


def test_spec_help_listings():
    """--output/--msg-filter/--debug accept "help" like the reference
    (dumpvdl2.c:254,631)."""
    r = run_cli(["--msg-filter", "help"])
    assert r.returncode == 0
    assert b"acars_data" in r.stdout and b"cpdlc" in r.stdout
    r = run_cli(["--debug", "help"])
    assert r.returncode == 0
    assert b"burst_detail" in r.stdout
    r = run_cli(["--output", "help"])
    assert r.returncode == 0
    assert b"pp_acars" in r.stdout and b"zmq" in r.stdout
