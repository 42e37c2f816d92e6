"""Benchmark harness: run every __spark_entry__ query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line with per-query
wall-clock seconds.

Each query is forced with the noop datasource write — full execution of
the plan on the executors with no driver-side collect, so the number
measures the distributed work, not result serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from m3d_engine_spark.session import build_session


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = build_session(
        app_name="m3d-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    # Warm the JVM/codegen path once so the first measured query isn't
    # charged for session bring-up.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
        except Exception as e:  # keep the bench line parseable on failure
            print(f"bench error in {name}: {type(e).__name__}: {e}", file=sys.stderr)
            dt = -1.0
        timings[name] = round(dt, 3)
        if dt > 0:
            total += dt
        # Isolate queries: drop any relations the query persisted so a
        # later measurement doesn't pay (or profit from) earlier state.
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({
        "metric": "total_query_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
