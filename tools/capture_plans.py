"""Capture .explain('formatted') for benched catalog queries.

Usage: python tools/capture_plans.py <out_dir> [name ...]
Writes <out_dir>/<query>_<suffix>.txt for every bench=True entry (or the
names given). Suffix from $PLAN_SUFFIX (default 'before').
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from customer_activity_lakehouse_spark.plans import QUERIES  # noqa: E402
from customer_activity_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = Path(sys.argv[1])
    out.mkdir(parents=True, exist_ok=True)
    names = sys.argv[2:] or [n for n, q in QUERIES.items() if q.bench]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
