"""Time individual __spark_entry__ queries with the noop sink (guide
§1.4) and optionally dump .explain("formatted") — the measurement
harness for the optimization rounds.

Usage:
  python tools/qtime.py q1 q2 ...            # min-of-N noop timings
  SPARK_GRAFT_QTIME_RUNS=3 python tools/qtime.py q1
  SPARK_GRAFT_QTIME_PLAN=plans/r16 python tools/qtime.py q1   # also write
      <dir>/<query>.txt with the formatted plan (no timing run needed:
      set SPARK_GRAFT_QTIME_RUNS=0 to only dump plans)

Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], 16g driver,
UI off) so numbers are comparable; per-run cache/persist isolation is
identical. NOT the artifact of record — bench.py stays that.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from m3d_engine_spark.session import build_session


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: qtime.py query [query...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_QTIME_RUNS", "2"))
    plan_dir = os.environ.get("SPARK_GRAFT_QTIME_PLAN", "")
    spark = build_session(
        app_name="m3d-qtime",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    registry = entry_mod.queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    for name in names:
        fn = registry[name]
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        best = -1.0
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best < 0 else min(best, dt)
            spark.catalog.clearCache()
            try:
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist()
            except Exception:
                pass
        if runs:
            print(f"{name}\t{best:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
