"""Benchmark harness (driver contract).

Runs the headline queries (Query.bench=True in the catalog) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], one warm-up + 3 timed runs per query (median),
and prints exactly ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full plan execution into the JVM-side ``noop`` datasource sink:
every result row is materialized on executors but never crosses into
Python or the driver (a ``foreach`` action would serialize each row to a
Python worker and time that overhead instead of the engine).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from customer_activity_lakehouse_spark.plans import QUERIES  # noqa: E402
from customer_activity_lakehouse_spark.session import get_spark  # noqa: E402

RUNS = 3


def _sf_label(sf_dir: str) -> float | str:
    name = Path(sf_dir).name
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return name


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakehouse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, q in QUERIES.items() if q.bench]
    timings: dict[str, float] = {}
    for name in names:
        q = QUERIES[name]
        samples: list[float] = []
        for i in range(RUNS + 1):  # first run is warm-up (JIT, file listing)
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i > 0:
                samples.append(dt)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_median_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_label(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
