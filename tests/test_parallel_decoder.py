"""Parallel host protocol stack (--decode-workers).

Pins the three properties the parallel decoder documents
(dumpvdl2_tpu/app/parallel_decoder.py): reassembly-affinity sharding,
deterministic in-order emission (byte parity with the single-process
decoder), and metrics funnel parity.
"""
import os
import subprocess
import sys

import pytest

from test_cli import REPO, run_cli

from dumpvdl2_tpu.app.parallel_decoder import shard_key
from dumpvdl2_tpu.proto.reasm import ReasmStatus, SeqReasmTable


def _avlc_hdr(src_addr, dst_addr, src_type, dst_type):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_golden_corpus as gen
    return (gen.enc_dlc_addr(dst_addr, dst_type, 0, False)
            + gen.enc_dlc_addr(src_addr, src_type, 0, True) + b"\x00")


class TestShardKey:
    def test_aircraft_address_is_the_key_both_directions(self):
        down = _avlc_hdr(0xA12345, 0x104050, 1, 4)   # aircraft -> GS
        up = _avlc_hdr(0x104050, 0xA12345, 4, 1)     # GS -> aircraft
        assert shard_key(down) == shard_key(up) == 0xA12345

    def test_handoff_keeps_affinity(self):
        """Same aircraft via two ground stations -> same shard."""
        gs1 = _avlc_hdr(0xA12345, 0x104050, 1, 4)
        gs2 = _avlc_hdr(0xA12345, 0x200001, 1, 4)
        assert shard_key(gs1) == shard_key(gs2)

    def test_ground_ground_uses_symmetric_pair(self):
        a = _avlc_hdr(0x104050, 0x200001, 4, 4)
        b = _avlc_hdr(0x200001, 0x104050, 4, 4)
        assert shard_key(a) == shard_key(b)
        assert shard_key(a) != shard_key(
            _avlc_hdr(0x104050, 0x200002, 4, 4))

    def test_short_frame(self):
        assert shard_key(b"\x01\x02") == 0


class TestPerKeyExpiry:
    """Reassembly decisions depend only on a conversation's own times
    (the property affinity sharding relies on)."""

    def test_stale_entry_restarts_fresh(self):
        t = SeqReasmTable()
        assert t.add_fragment("k", b"a", seq_num=0, is_final=False,
                              rx_time=0.0, timeout=3.0,
                              seq_num_wrap=8) is ReasmStatus.IN_PROGRESS
        # next fragment arrives past the timeout: the stale sequence is
        # dropped and this fragment starts a new one, regardless of
        # whether any table-wide sweep ran in between
        assert t.add_fragment("k", b"b", seq_num=0, is_final=False,
                              rx_time=10.0, timeout=3.0,
                              seq_num_wrap=8) is ReasmStatus.IN_PROGRESS

    def test_unrelated_traffic_cannot_change_outcome(self):
        """With or without an interleaved other-key fragment (which
        runs the table-wide sweep), key k's outcome is identical."""
        for interleave in (False, True):
            t = SeqReasmTable()
            t.add_fragment("k", b"a", seq_num=0, is_final=False,
                           rx_time=0.0, timeout=3.0, seq_num_wrap=8)
            if interleave:
                t.add_fragment("other", b"x", seq_num=0, is_final=False,
                               rx_time=5.0, timeout=3.0, seq_num_wrap=8)
            st = t.add_fragment("k", b"b", seq_num=1, is_final=True,
                                rx_time=10.0, timeout=3.0, seq_num_wrap=8)
            assert st is ReasmStatus.SKIPPED  # fresh lone-final either way


@pytest.fixture(scope="module")
def fleet_archive(tmp_path_factory):
    path = tmp_path_factory.mktemp("bench") / "fleet.frames"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "gen_bench_archive.py"),
         str(path), "6", "3"],
        capture_output=True, timeout=300, cwd=REPO)
    assert r.returncode == 0, r.stderr.decode()
    return path


@pytest.mark.golden
def test_worker_output_byte_parity(fleet_archive, tmp_path):
    """text AND json outputs of --decode-workers 3 equal the
    single-process decoder's, byte for byte, on multi-aircraft traffic
    with reassembly in every conversation."""
    outs = {}
    for workers in (0, 3):
        txt = tmp_path / f"w{workers}.txt"
        js = tmp_path / f"w{workers}.json"
        args = ["--raw-frames-file", str(fleet_archive), "--utc",
                "--extended-header",
                "--output", f"decoded:text:file:path={txt}",
                "--output", f"decoded:json:file:path={js}"]
        if workers:
            args += ["--decode-workers", str(workers)]
        r = run_cli(args)
        assert r.returncode == 0, r.stderr.decode()
        assert b"lost" not in r.stderr
        outs[workers] = (txt.read_bytes(), js.read_bytes())
    assert outs[0][0] == outs[3][0], "text outputs differ"
    # timestamps inside json come from frame metadata (deterministic)
    assert outs[0][1] == outs[3][1], "json outputs differ"
    assert outs[0][0].count(b"\n\n") > 100     # sanity: real volume


@pytest.mark.golden
def test_enrichment_loads_in_workers(fleet_archive, tmp_path):
    """--gs-file enrichment is applied inside workers and output stays
    byte-identical to the single-process decoder."""
    gs = tmp_path / "gs.txt"
    gs.write_text("".join(
        f"{0x104050 + i:06X} [TST{i} Test Field VDL] [Testville {i}]\n"
        for i in range(7)))
    outs = {}
    for workers in (0, 2):
        out = tmp_path / f"gs{workers}.txt"
        args = ["--raw-frames-file", str(fleet_archive), "--utc",
                "--gs-file", str(gs), "--addrinfo", "verbose",
                "--output", f"decoded:text:file:path={out}"]
        if workers:
            args += ["--decode-workers", str(workers)]
        r = run_cli(args)
        assert r.returncode == 0, r.stderr.decode()
        outs[workers] = out.read_bytes()
    assert outs[0] == outs[2]
    assert b"Test Field" in outs[2]      # enrichment reached the output


@pytest.mark.golden
def test_iq_file_path_through_workers(tmp_path):
    """The live-pipeline path (process_all of DecodedFrames) also
    yields byte-identical output under --decode-workers."""
    wav = "/root/reference/test/vdl2_model_16b_1050kHz.wav"
    if not os.path.exists(wav):
        pytest.skip("bundled reference capture not available")
    outs = {}
    for workers in (0, 2):
        out = tmp_path / f"iq{workers}.txt"
        args = ["--iq-file", wav, "--sample-format", "S16_LE",
                "--extended-header", "--utc",
                "--output", f"decoded:text:file:path={out}"]
        if workers:
            args += ["--decode-workers", str(workers)]
        r = run_cli(args)
        assert r.returncode == 0, r.stderr.decode()
        # normalize the wall-clock burst timestamps (live decode stamps
        # frames with time.time(), so two runs differ only there)
        import re
        outs[workers] = re.sub(
            rb"\[\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} \w+\]", b"[TS]",
            out.read_bytes())
    assert outs[0] == outs[2]
    assert outs[0].count(b"\n\n") >= 2


def test_stats_funnel_merged_from_workers(tmp_path):
    """Worker-side counters reach the parent's global sink."""
    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.app.stats import stats
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.outputs import setup_output

    stats.reset()
    Config.output_queue_hwm = 0
    fmtr_list = []
    setup_output(f"decoded:text:file:path={tmp_path/'o.txt'}", fmtr_list)
    dec = ParallelFrameDecoder(fmtr_list, 2)
    dec.start_outputs()
    corpus = os.path.join(REPO, "tests", "fixtures",
                          "proto_corpus.frames")
    with open(corpus, "rb") as fh:
        for body in rawframes.read_raw_bodies(fh):
            dec.process_record(body)
    dec.shutdown()
    key = "channels.136975000.avlc.frames.processed"
    assert stats.counters.get(key) == 28
    assert stats.timings.get("decoder.msg.processing_time")


def test_corrupt_record_does_not_kill_worker(tmp_path):
    """A malformed raw-frames record is reported and skipped — the
    worker stays alive, every other frame still decodes, and the parent
    loses no in-flight frames (parallel_decoder.py worker fencing)."""
    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.app.stats import stats
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.outputs import setup_output

    stats.reset()
    Config.output_queue_hwm = 0
    out = tmp_path / "o.txt"
    fmtr_list = []
    setup_output(f"decoded:text:file:path={out}", fmtr_list)
    dec = ParallelFrameDecoder(fmtr_list, 2)
    dec.start_outputs()
    corpus = os.path.join(REPO, "tests", "fixtures",
                          "proto_corpus.frames")
    with open(corpus, "rb") as fh:
        bodies = list(rawframes.read_raw_bodies(fh))
    # interleave garbage that breaks both frame_data_peek (parent) and
    # decode_raw_frame (worker): truncated varints / bogus wire types
    for i, body in enumerate(bodies):
        dec.process_record(body)
        if i % 5 == 0:
            dec.process_record(b"\xff\xff\xff\xff\xff\xff")
    dec.shutdown()
    key = "channels.136975000.avlc.frames.processed"
    assert stats.counters.get(key) == 28     # every good frame decoded
    assert out.read_bytes().count(b"\n\n") >= 28


def test_raw_record_metadata_reaches_outputs(tmp_path):
    """Worker-decoded metadata for raw archive records is shipped back
    to the parent so output.push sees the same metadata as the
    single-process decoder (not None)."""
    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.outputs import setup_output

    Config.output_queue_hwm = 0
    fmtr_list = []
    setup_output(f"decoded:text:file:path={tmp_path/'o.txt'}", fmtr_list)
    seen = []
    output = fmtr_list[0].outputs[0]
    orig_push = output.push

    def spy_push(metadata, msg, shutdown=False):
        if not shutdown and msg is not None:
            seen.append(metadata)
        return orig_push(metadata, msg, shutdown=shutdown)

    output.push = spy_push
    dec = ParallelFrameDecoder(fmtr_list, 2)
    dec.start_outputs()
    corpus = os.path.join(REPO, "tests", "fixtures",
                          "proto_corpus.frames")
    with open(corpus, "rb") as fh:
        for body in rawframes.read_raw_bodies(fh):
            dec.process_record(body)
    dec.shutdown()
    assert seen and all(m is not None for m in seen)
    assert all(m.freq == 136975000 for m in seen)


def test_negative_decode_workers_rejected():
    """--decode-workers -4 must be an argparse error, not a silent
    fall-back to in-process decode."""
    r = run_cli(["--decode-workers", "-4", "--iq-file", "/dev/null"])
    assert r.returncode == 2
    assert b"must be >= 0" in r.stderr


def test_flush_wait_is_a_steady_state_barrier(tmp_path):
    """flush_wait() returns only after every queued frame was decoded
    and emitted in order (the benchmark barrier), without shutdown."""
    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.outputs import setup_output

    Config.output_queue_hwm = 0
    out = tmp_path / "o.txt"
    fmtr_list = []
    setup_output(f"decoded:text:file:path={out}", fmtr_list)
    dec = ParallelFrameDecoder(fmtr_list, 2)
    dec.start_outputs()
    corpus = os.path.join(REPO, "tests", "fixtures",
                          "proto_corpus.frames")
    with open(corpus, "rb") as fh:
        bodies = list(rawframes.read_raw_bodies(fh))
    for rounds in range(2):            # decoder survives reuse
        for body in bodies:
            dec.process_record(body)
        dec.flush_wait()
        assert dec._emit_seq == dec._seq == (rounds + 1) * len(bodies)
    dec.shutdown()
    assert out.read_bytes().count(b"\n\n") >= 2 * 28
