"""Operator tooling parity: extras/vdl2grep + deployment files.

Reference analogs: extras/vdl2grep (message-level log grepper),
etc/dumpvdl2.service + etc/dumpvdl2 (systemd deployment),
extras/multitail-dumpvdl2.conf, doc/FILTERING_EXAMPLES.md.
"""
import gzip
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VDL2GREP = os.path.join(REPO, "extras", "vdl2grep")

LOG = """\
[2026-08-21 06:00:00 UTC] [136.975] [-20.0/-40.0 dBFS] [20.0 dB] [0.1 ppm]
A12345 (Aircraft, Airborne) -> 2098B5 (Ground station): Command
AVLC type: I sseq: 0 rseq: 0 poll: 0
ACARS (reassembly: skipped):
 Reg: .N123AB Flight: AA1234
 Label: H1
 METAR KDCA 081353Z

[2026-08-21 06:00:01 UTC] [136.875] [-25.0/-40.0 dBFS] [15.0 dB] [0.2 ppm]
2098B5 (Ground station, On ground) -> A12345 (Aircraft): Response
AVLC type: S (Receive Ready) rseq: 1
 Some uplink text TAF KROC

[2026-08-21 06:00:02 UTC] [136.975] [-22.0/-40.0 dBFS] [18.0 dB] [0.0 ppm]
A99999 (Aircraft, Airborne) -> 2098B5 (Ground station): Command
AVLC type: I sseq: 1 rseq: 0 poll: 0
 Another downlink metar inside
"""


def _run(args, stdin_text=None, files=()):
    return subprocess.run(
        [sys.executable, VDL2GREP] + args + list(files),
        input=stdin_text, capture_output=True, text=True, timeout=60)


def test_vdl2grep_basic_match_prints_whole_message():
    r = _run(["METAR"], stdin_text=LOG)
    assert r.returncode == 0
    assert "Reg: .N123AB" in r.stdout            # whole block printed
    assert r.stdout.count("[2026-08-21") == 1    # only the matching one


def test_vdl2grep_case_insensitive_and_direction_filters():
    r = _run(["-i", "metar"], stdin_text=LOG)
    assert r.stdout.count("[2026-08-21") == 2
    r = _run(["-i", "-d", "metar"], stdin_text=LOG)      # downlinks only
    assert r.stdout.count("[2026-08-21") == 2
    r = _run(["-i", "-u", "metar"], stdin_text=LOG)      # uplinks only
    assert r.stdout.count("[2026-08-21") == 0
    r = _run(["-u", "TAF"], stdin_text=LOG)
    assert r.stdout.count("[2026-08-21") == 1
    assert "Receive Ready" in r.stdout


def test_vdl2grep_invert_and_exclusive_flags():
    r = _run(["-v", "METAR"], stdin_text=LOG)
    assert "METAR" not in r.stdout
    assert r.stdout.count("[2026-08-21") == 2
    r = _run(["-d", "-u", "x"], stdin_text="")
    assert r.returncode == 2                     # argparse error


def test_vdl2grep_reads_gzip(tmp_path):
    gz = tmp_path / "log.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write(LOG)
    r = _run(["METAR"], files=[str(gz)])
    assert r.stdout.count("[2026-08-21") == 1


def test_deployment_files_exist_and_are_consistent():
    unit = open(os.path.join(REPO, "etc", "dumpvdl2-tpu.service")).read()
    assert "EnvironmentFile=/etc/default/dumpvdl2-tpu" in unit
    assert "dumpvdl2_tpu" in unit
    env = open(os.path.join(REPO, "etc", "dumpvdl2-tpu")).read()
    assert "DUMPVDL2_TPU_OPTIONS" in env
    assert os.path.exists(os.path.join(
        REPO, "extras", "multitail-dumpvdl2-tpu.conf"))
    doc = open(os.path.join(REPO, "doc", "FILTERING_EXAMPLES.md")).read()
    assert "--msg-filter" in doc
    # every filter token the doc mentions must exist in the CLI
    from dumpvdl2_tpu.config import MSG_FILTERSPEC
    import re
    for tok in re.findall(r"-msg-filter ([a-z0-9_,\-]+)", doc):
        for word in tok.split(","):
            word = word.lstrip("-")
            if word in ("help", "all", "none") or not word:
                continue
            assert word in MSG_FILTERSPEC, word


def test_vdl2grep_drops_unknown_direction_like_reference():
    """GS -> 'All stations' broadcasts (and any message whose header
    classifies to neither air->gnd nor gnd->air) are dropped
    unconditionally — pinning the REFERENCE's exact behavior
    (extras/vdl2grep print_if_matches: '$dir == DIR_UNKNOWN and
    return'), which its regex produces for 'All stations' too."""
    log = ("[2026-08-21 06:00:00 UTC] [136.975] [-20.0/-40.0 dBFS]"
           " [20.0 dB] [0.1 ppm]\n"
           "2098B5 (Ground station, On ground) -> FFFFFF (All stations)"
           ": Unnumbered frame\n"
           "XID: GSIF broadcast payload\n\n")
    r = _run(["GSIF"], stdin_text=log)
    assert r.returncode == 0
    assert r.stdout == ""
