"""Decode-worker count sweep on the raw_replay workload (VERDICT r4 #7).

Runs the fleet-archive replay through ParallelFrameDecoder at
N = 0 (single-process, no decoder), 1, 2, 3, 4 workers and prints one
JSON line with the frames/s curve.  On the 2-core bench host the
interesting question is the SHAPE: overlap gain at N<=2, and whether
IPC overhead makes the curve regress (vs flatten) past the core count.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def main():
    import gen_bench_archive as gba
    from dumpvdl2_tpu.app.parallel_decoder import ParallelFrameDecoder
    from dumpvdl2_tpu.config import Config
    from dumpvdl2_tpu.io import rawframes
    from dumpvdl2_tpu.io.formatters import formatter_get
    from dumpvdl2_tpu.io.outputs import setup_output
    from dumpvdl2_tpu.proto.avlc import avlc_parse
    from dumpvdl2_tpu.proto.reasm import ReasmContexts

    with tempfile.NamedTemporaryFile(suffix=".frames") as tf:
        n = gba.write_archive(tf.name, 64, 48)
        with open(tf.name, "rb") as fh:
            bodies = list(rawframes.read_raw_bodies(fh))
    assert len(bodies) == n

    def timed(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    curve = {}

    fd = formatter_get("text")

    def run_single():
        reasm = ReasmContexts()
        for b in bodies:
            d = rawframes.decode_raw_frame(b)
            root, _mt = avlc_parse(bytes(d.frame), d.metadata, reasm)
            if root is not None:
                fd.format_decoded_msg(d.metadata, root)

    curve["0"] = round(n / timed(run_single), 1)

    Config.output_queue_hwm = 0
    for workers in (1, 2, 3, 4):
        with tempfile.TemporaryDirectory() as td:
            fmtr_list = []
            setup_output(f"decoded:text:file:path={td}/o.txt", fmtr_list)
            dec = ParallelFrameDecoder(fmtr_list, workers)
            dec.start_outputs()

            def run_workers():
                for b in bodies:
                    dec.process_record(b)
                dec.flush_wait()

            curve[str(workers)] = round(n / timed(run_workers), 1)
            dec.shutdown()

    print(json.dumps({"metric": "raw_replay_worker_sweep",
                      "frames": n, "fps_by_workers": curve,
                      "host_cores": os.cpu_count()}))


if __name__ == "__main__":
    main()
