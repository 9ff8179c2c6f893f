"""JSON-lines source/sink — the interchange format document pipelines
actually exchange (one JSON object per line, newline-delimited; what
HuggingFace/CommonCrawl-derived corpora ship as).

Beyond-reference extension: the reference moves only CSV and parquet
(data_processing.py, flows.py); a training-data engine also has to ingest
and emit JSONL. Spark-first notes:

- ALWAYS pass an explicit schema: ``spark.read.json`` without one runs a
  full inference scan first — at 100 TB that doubles the read. The
  PERMISSIVE mode + ``columnNameOfCorruptRecord`` pattern mirrors the CSV
  module's coerce-style tolerance: malformed lines become one non-null
  ``_corrupt`` cell instead of killing the job, and the caller decides
  (count them, quarantine them, or drop them).
- JSONL is splittable line-by-line (unlike multiline JSON arrays), so a
  100 TB directory parallelizes exactly like text; compression should be
  per-file zstd/gzip — a single giant gzip member is ONE split.
- the sink is for interchange; columnar zones stay parquet/ORC
  (sources/parquet.py) — JSONL carries no column pruning or stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-first JSONL scan; malformed lines land in ``_corrupt``."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def jsonl_quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): corrupt rows carry the raw line for triage;
    clean rows drop the bookkeeping column. The parsed frame is CACHED
    first — Spark refuses plans whose referenced columns reduce to only
    the internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN:
    column pruning would re-parse and lose the flag), and caching the
    parsed rows is the engine's documented workaround. The cache is also
    what you want operationally: both halves of the split read it once."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None, n_files: int | None = None
) -> None:
    """JSONL sink; ``n_files`` caps output files via coalesce (no shuffle
    — the same file-count control as the curated parquet sink)."""
    out = df.coalesce(n_files) if n_files else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
