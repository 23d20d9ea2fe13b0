"""Network outputs end-to-end: UDP datagrams and ZMQ PUB frames."""
import socket
import sys
import time

import pytest

from test_cli import run_cli


def _make_raw_frames_file(tmp_path, copies=3):
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_proto import make_avlc, make_acars_block
    from dumpvdl2_tpu.core.metadata import MsgMetadata
    from dumpvdl2_tpu.io.rawframes import frame_record
    frame = make_avlc(0xA12345, 0x104050, 0x00,
                      b"\xff\xff\x01" + make_acars_block())
    path = tmp_path / "frames.bin"
    path.write_bytes(frame_record(MsgMetadata(freq=136975000), frame)
                     * copies)
    return path


@pytest.mark.golden
def test_udp_output_delivers_datagrams(tmp_path):
    frames = _make_raw_frames_file(tmp_path)
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(30)
    port = rx.getsockname()[1]
    r = run_cli(["--raw-frames-file", str(frames),
                 "--output", f"decoded:json:udp:address=127.0.0.1,"
                             f"port={port}"])
    assert r.returncode == 0, r.stderr.decode()
    msgs = []
    try:
        for _ in range(3):
            msgs.append(rx.recv(65536))
    except socket.timeout:
        pass
    rx.close()
    assert len(msgs) == 3
    import json
    doc = json.loads(msgs[0])
    assert doc["vdl2"]["avlc"]["frame_type"] == "I"


@pytest.mark.golden
def test_zmq_output_pub(tmp_path):
    zmq = pytest.importorskip("zmq")
    import os
    import subprocess
    from test_cli import REPO
    # hundreds of frames so sending outlasts the PUB/SUB handshake
    frames = _make_raw_frames_file(tmp_path, copies=400)
    port = 18743
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.setsockopt(zmq.SUBSCRIBE, b"")
    sub.setsockopt(zmq.RCVTIMEO, 500)
    sub.bind(f"tcp://127.0.0.1:{port}")     # we bind; CLI connects
    time.sleep(0.2)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "dumpvdl2_tpu", "--platform", "cpu",
         "--raw-frames-file", str(frames),
         "--output", f"decoded:text:zmq:mode=client,"
                     f"endpoint=tcp://127.0.0.1:{port}"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO)
    # libzmq processes socket commands (incl. sending the subscription
    # upstream) only when the app thread touches the socket — poll
    # WHILE the publisher runs, like any real consumer would.
    got = []
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            got.append(sub.recv())
        except zmq.error.Again:
            if proc.poll() is not None:
                break
    _, err = proc.communicate(timeout=30)
    sub.close(0)
    assert proc.returncode == 0, err.decode()
    assert got, "no ZMQ messages received"
    assert b"AVLC type: I" in got[0]
