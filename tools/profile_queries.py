"""Warm per-query stage profiler (guide §1: measure first).

Usage:
  python tools/profile_queries.py q1 q2 ...     # default 3 timed runs
  SPARK_GRAFT_PROFILE_RUNS=5 python tools/profile_queries.py dd_minhash

For each named headline/declared query: one untimed warm-up call, then N
timed calls; per run the wall-clock plus the stage-metric delta from the
status REST API (bench._stages_since) — executor run/cpu, shuffle bytes,
and the 3 hottest stages by task wall — so a slow entry names WHICH
stage is hot and whether it is compute, python-boundary wait, or
scheduling overhead (run ≫ cpu with tiny cpu). One JSON line per run on
stdout; a summary line per query at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage_rows(spark, watermark) -> list[dict]:
    """Per-stage rows (id, tasks, run/cpu sec, wall span, callsite) for
    stages newer than the watermark — names which stage holds the wall,
    which waits (run >> cpu), and which computes."""
    try:
        import datetime
        import urllib.request
        base = spark.sparkContext.uiWebUrl
        if not base:
            return []
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages", timeout=5) as r:
            stages = json.load(r)

        def ts(s):
            if not s:
                return None
            return datetime.datetime.strptime(
                s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        rows = []
        for s in stages:
            if s["stageId"] <= (watermark if watermark is not None else -1):
                continue
            t0, t1 = ts(s.get("firstTaskLaunchedTime")), \
                ts(s.get("completionTime"))
            rows.append({
                "id": s["stageId"],
                "tasks": s.get("numTasks"),
                "run": round((s.get("executorRunTime") or 0) / 1e3, 2),
                "cpu": round((s.get("executorCpuTime") or 0) / 1e9, 2),
                "span": (round(t1 - t0, 2)
                         if t0 is not None and t1 is not None else None),
                "name": (s.get("name") or "")[:60],
                "desc": (s.get("description") or "")[:60],
            })
        return sorted(rows, key=lambda r: r["id"])
    except Exception:                             # noqa: BLE001
        return []


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_queries.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ["SPARK_GRAFT_UI"] = "1"
    from vectordb_testbricks_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    spark = get_spark("profile")
    registry = entrymod.queries()
    summary = {}
    for name in names:
        fn = getattr(entrymod, name, None) or registry.get(name)
        if fn is None:
            print(f"# {name}: NOT FOUND", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"profile warmup: {name}")
        fn(spark, sf_dir).count()                 # warm-up, untimed
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"profile {name} run {i}")
            wm = bench._max_stage_id(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            walls.append(wall)
            m = bench._stages_since(spark, wm) if wm is not None else {}
            m["stages"] = _stage_rows(spark, wm)
            print(json.dumps({"q": name, "run": i,
                              "wall_sec": round(wall, 3), **m}),
                  flush=True)
        walls.sort()
        summary[name] = round(walls[len(walls) // 2], 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"kind": "profile_summary", "median_wall": summary,
                      "runs": runs}), flush=True)


if __name__ == "__main__":
    main()
