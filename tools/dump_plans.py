"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage:
  python tools/dump_plans.py <tag> [query ...]
      — write plans/<tag>/<query>_<suffix>.txt for the named queries
        (default: every entry in __spark_entry__.queries()).
  SPARK_GRAFT_PLAN_SUFFIX=after python tools/dump_plans.py r13 dd_minhash
      — suffix defaults to "before".

The dump is the ANALYZED-session plan exactly as the bench sees it
(same session knobs, same cached-table handles), so Exchange counts and
join strategies in the files match what the bench executes. The judge
reads these to verify plan claims without running Spark.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    names = sys.argv[2:]
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from vectordb_testbricks_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("dump_plans")
    registry = entrymod.queries()
    if not names:
        names = sorted(registry)
    for name in names:
        fn = registry.get(name) or getattr(entrymod, name, None)
        if fn is None:
            print(f"# {name}: NOT FOUND", flush=True)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as e:                    # noqa: BLE001
            print(f"# {name}: ERROR {e}", flush=True)
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"# {name}: {len(plan.splitlines())} lines, "
              f"{n_ex} Exchange mentions -> {path}", flush=True)


if __name__ == "__main__":
    main()
