"""JSONL source/sink: schema-first reads, corrupt-line quarantine,
round-trip fidelity, compression."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import types as T

from customer_activity_lakehouse_spark.sources.jsonl import (
    jsonl_quarantine_split,
    read_jsonl,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}\n'
        "this line is not json\n"
        '{"doc_id": 3, "text": null, "lang": "de"}\n'
    )
    df = read_jsonl(spark, str(src), SCHEMA)
    clean, bad = jsonl_quarantine_split(df)
    rows = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    assert rows == {1: ("hello world", "en"), 2: ("bonjour", "fr"), 3: (None, "de")}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "not json" in bad_rows[0]._corrupt
    # clean frame has no bookkeeping column
    assert "_corrupt" not in clean.columns

    out = tmp_path / "out"
    write_jsonl(clean, str(out), n_files=1)
    files = [p for p in Path(out).glob("*.json")]
    assert len(files) == 1
    back = read_jsonl(spark, str(out), SCHEMA)
    assert {r.doc_id for r in back.collect()} == {1, 2, 3}


def test_jsonl_compressed_roundtrip(spark, tmp_path):
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('t', id) AS text", "'en' AS lang"
    )
    out = tmp_path / "gz"
    write_jsonl(df, str(out), compression="gzip", n_files=2)
    assert any(p.name.endswith(".json.gz") for p in Path(out).iterdir())
    back = read_jsonl(spark, str(out), SCHEMA)
    clean, bad = jsonl_quarantine_split(back)
    assert clean.count() == 100 and bad.count() == 0
