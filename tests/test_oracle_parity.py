"""The correctness gate, run locally: every catalog query vs its DuckDB
oracle at sf0.01 (same comparison the driver performs)."""

from __future__ import annotations

import pytest

from customer_activity_lakehouse_spark.plans import QUERIES

from .oracle_harness import compare, duckdb_conn, exact_float_diffs

ORACLED = [n for n, q in QUERIES.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def oracle(sf_correctness):
    con = duckdb_conn(sf_correctness)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_correctness, oracle, name):
    q = QUERIES[name]
    spark_pdf = q.fn(spark, sf_correctness).toPandas()
    oracle_pdf = oracle.execute(q.oracle).fetchdf()
    assert len(spark_pdf) > 0 or len(oracle_pdf) == 0, f"{name}: spark returned 0 rows"
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
    # Exactness check: the driver hashes values, so floats must be
    # bit-identical post-rounding, not merely within tolerance.
    n_inexact = exact_float_diffs(spark_pdf, oracle_pdf)
    assert n_inexact == 0, f"{name}: {n_inexact} float cells not bit-identical (hash would differ)"
