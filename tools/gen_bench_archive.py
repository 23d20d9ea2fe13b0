"""Generate a bulk raw-frames archive for host-stack benchmarks.

Synthesizes realistic fleet traffic: N aircraft, each with its own DLC
address / registration / flight id, every one running the full
protocol-breadth conversation from gen_golden_corpus.build_corpus.
Frames are interleaved round-robin across aircraft with strictly
monotonic timestamps — the workload the --decode-workers parallel
decoder shards by aircraft affinity.

    python tools/gen_bench_archive.py OUT.frames [n_aircraft] [reps]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from dumpvdl2_tpu.core.metadata import MsgMetadata            # noqa: E402
from dumpvdl2_tpu.io.rawframes import frame_record            # noqa: E402

import gen_golden_corpus as gen                               # noqa: E402

FREQ = 136975000
T0 = 1755600000.0


def fleet_frames(n_aircraft: int) -> list[list[bytes]]:
    """Per-aircraft frame sequences with distinct identities."""
    out = []
    for i in range(n_aircraft):
        out.append(gen.build_corpus(
            gs_addr=0x104050 + (i % 7),        # a few ground stations
            ac_addr=0xA10000 + i,
            reg=f".N{10000 + i}",
            flight=f"AB{1000 + i % 9000}"))
    return out


def write_archive(path: str, n_aircraft: int, reps: int,
                  dt: float = 0.01) -> int:
    """Round-robin interleave every aircraft's conversation ``reps``
    times; returns the number of frames written."""
    fleet = fleet_frames(n_aircraft)
    n = 0
    t = T0
    with open(path, "wb") as fh:
        for rep in range(reps):
            depth = max(len(f) for f in fleet)
            for j in range(depth):
                for ac, frames in enumerate(fleet):
                    if j >= len(frames):
                        continue
                    md = MsgMetadata(
                        station_id="BENCH-1", freq=FREQ,
                        frame_pwr_dbfs=-20.0 - (ac % 5),
                        nf_pwr_dbfs=-42.5, ppm_error=-0.25,
                        burst_timestamp=t, datalen_octets=len(frames[j]),
                        synd_weight=0, num_fec_corrections=0, idx=0)
                    fh.write(frame_record(md, frames[j]))
                    t += dt
                    n += 1
    return n


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    path = sys.argv[1]
    n_aircraft = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n = write_archive(path, n_aircraft, reps)
    print(f"wrote {n} frames ({n_aircraft} aircraft x {reps} reps) "
          f"to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
