"""Microbenchmark for the guest-memory first-touch pathology
(BASELINE.md r10 'Measured platform constraint'): on this boxed VM the
hypervisor backs guest pages lazily, and the fault path CONVOYS under
concurrent first-touch — warm pages write at ~39 GB/s aggregate while
32 processes first-touching simultaneously collapse to single-digit
MB/s each. Spark stages allocating fresh buffers across 32 tasks are
exactly that pattern, which is what the recurring "host slow windows"
were.

Usage: python tools/measure_membacking.py [--mb 128] [--procs 32]
Prints one JSON line with serial/concurrent first-touch and steady
warm-write throughputs. NOTE: the run itself backs procs*mb of guest
memory (and suffers the convoy if one is active) — budget ~1-3 min.
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _touch(mb: int):
    import numpy as np
    t0 = time.perf_counter()
    a = np.empty(mb * 131072, dtype=np.int64)
    a[:] = 7                               # first-touch write of every page
    t1 = time.perf_counter()
    a[:] = 8                               # warm re-write of the same pages
    t2 = time.perf_counter()
    del a
    return (t1 - t0, t2 - t1)


def _worker(mb: int):
    return _touch(mb)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=128)
    ap.add_argument("--procs", type=int, default=32)
    args = ap.parse_args()

    first_s, warm_s = _touch(args.mb)
    out = {
        "chunk_mb": args.mb, "procs": args.procs,
        "serial_first_touch_mb_s": round(args.mb / first_s, 1),
        "serial_warm_write_mb_s": round(args.mb / warm_s, 1),
    }
    with mp.Pool(args.procs) as pool:
        res = pool.map(_worker, [args.mb] * args.procs)
    ft = sorted(r[0] for r in res)
    wm = sorted(r[1] for r in res)
    p50f, p50w = ft[len(ft) // 2], wm[len(wm) // 2]
    out["concurrent_first_touch_mb_s_per_proc"] = round(args.mb / p50f, 1)
    out["concurrent_first_touch_mb_s_aggregate"] = round(
        args.mb * args.procs / max(ft), 1)
    out["concurrent_warm_write_mb_s_per_proc"] = round(args.mb / p50w, 1)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
