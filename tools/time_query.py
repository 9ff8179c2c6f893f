"""Time individual catalog queries into the noop sink (guide §1.4).

Usage: python tools/time_query.py name [name ...] [--runs N]
One warm-up pass then N timed passes per query (interleaved), median
reported. Mirrors bench.py methodology for micro-iteration on one query.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from customer_activity_lakehouse_spark.plans import QUERIES  # noqa: E402
from customer_activity_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    samples: dict[str, list[float]] = {n: [] for n in names}
    for i in range(runs + 1):
        for name in names:
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            if i > 0:
                samples[name].append(dt)
            spark.sparkContext.setJobDescription(None)
    for name in names:
        s = samples[name]
        print(
            f"{name:40s} median={statistics.median(s):7.3f}  "
            f"min={min(s):7.3f}  all={[round(x, 3) for x in s]}"
        )


if __name__ == "__main__":
    main()
