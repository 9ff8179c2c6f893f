"""Scalar column expressions (reference operators F1-F8).

All JVM-side built-ins — no Python UDFs — so every derivation stays inside
whole-stage codegen and Catalyst can push/fold around them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"
DATE_FORMAT = "yyyy-MM-dd"


def parse_ts(col: Column | str, fmt: str = TS_FORMAT) -> Column:
    """F1 — string→timestamp, null on parse failure.

    Matches ``dd.to_datetime(s, errors='coerce')`` (data_processing.py:168,
    282-284, 326-329).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_to_timestamp, not to_timestamp: Spark 4 enables ANSI mode by
    # default, under which to_timestamp THROWS on malformed input. The
    # reference's errors='coerce' semantics are null-on-failure regardless
    # of session ANSI setting.
    return F.try_to_timestamp(c, F.lit(fmt))


def derive_date_str(ts: Column | str) -> Column:
    """F2 — timestamp→'yyyy-MM-dd' STRING.

    Matches ``.dt.strftime('%Y-%m-%d').astype(str)``
    (data_processing.py:175-180, 329-332). Kept as a string — it is the hive
    partition value, and directory names must match the reference layout.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, DATE_FORMAT)


def capitalize_first(col: Column | str) -> Column:
    """F8 — Python ``str.capitalize()`` semantics: FIRST char upper, REST lower.

    'hOme Goods' → 'Home goods'. This is NOT ``initcap`` (which would give
    'Home Goods'); reference data_processing.py:387-391 uses str.capitalize.
    Empty string and NULL pass through unchanged.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(c.substr(F.lit(2), F.length(c))))
