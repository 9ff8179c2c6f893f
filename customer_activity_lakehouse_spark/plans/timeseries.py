"""Time-series operators over the events stream table: as-of join, banded
range join, gap-fill with LOCF, and a hypertable-style multi-resolution
rollup.

The reference delegates interactive querying to external engines
(ReadMe.md:85-94) and has no time-series surface at all; these are
north-star extensions in the family the brief names explicitly (as-of
join, range join, hypertable rollup), built from Spark primitives that
survive 100 TB:

- the as-of join is the union-and-window form — ONE hash shuffle on the
  equi key, no per-row probing, no driver participation;
- the range join is banded: fixed-width time buckets turn an inequality
  join into an equi join with a post-filter, so Catalyst never falls back
  to BroadcastNestedLoop/cartesian;
- gap-fill generates its spine from the data's own bounds (calendar-sized,
  corpus-independent) and fills with an ignore-nulls window partitioned by
  series key;
- the multi-resolution rollup is one pass via ROLLUP grouping sets —
  partial aggregation does the heavy lifting map-side.

Timestamps: registry.events_table normalizes `ts` to microsecond
TimestampType whatever the fixture generation's physical type (nanos rounds
1-3, micros round 4+); DuckDB reads the same file at the same precision, so
every comparison below is exact on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core import money_sum, sql_money_sum
from .registry import Query, table

# Incident definition for the range join: rare high-value error events.
# value > 200 keeps incidents sparse at every fixture sf (2 at sf0.001,
# 40 at sf0.01, 357 at sf0.1) while the 10-minute follow window still
# catches ordinary events around them.
INCIDENT_VALUE_MIN = 200.0
RANGE_WINDOW_US = 600_000_000  # 10 minutes, in microseconds

# Gap-fill series: hourly observations of high-value errors — sparse by
# construction (~0.3/hour at sf0.01), so the fixtures actually exercise
# the carry-forward path instead of a dense no-op.
GAPFILL_VALUE_MIN = 100.0


def q_events_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase event picks up the most recent prior (or
    simultaneous) click by the same user — the classic "state at event
    time" lookup (last quote before a trade, last config before a request).

    Spark has no ASOF JOIN operator; the scale-correct form is
    union-and-window: tag both streams, union them, and run
    ``last(value, ignorenulls=True)`` over a window partitioned by the
    equi key and ordered by (ts, kind) with clicks sorted before purchases
    at equal timestamps (matching the oracle's ``>=`` bound). That is ONE
    hash exchange on user_id + one sort — the same cost as any per-key
    window — with no range-probe join, no broadcast of either side, and
    per-user state that never leaves the executor. Clicks are first
    deduped to one row per (user_id, ts) so ties cannot make the pick
    nondeterministic.

    The DuckDB oracle is a literal ``ASOF LEFT JOIN`` — the engines reach
    the same rows by different physical strategies, which is the point.
    """
    ev = table(spark, sf, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("t_us"),
            F.lit(0).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "click_value",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.lit(1).alias("kind"),
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_value", ignorenulls=True).over(w).alias("last_click_value"),
        F.last(F.when(F.col("kind") == 0, F.col("t_us")), ignorenulls=True)
        .over(w)
        .alias("last_click_us"),
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "purchase_value",
            "last_click_value",
            ((F.col("t_us") - F.col("last_click_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("wait_sec"),
        )
    )


ORACLE_EVENTS_ASOF_JOIN = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.value AS purchase_value,
       c.click_value AS last_click_value,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS wait_sec
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Banded range join: for each incident (rare high-value error event),
    count and sum ALL events in the 10 minutes that follow — a pure
    interval join with NO equi key, the shape Catalyst would otherwise
    execute as a broadcast-nested-loop filter scan.

    The band trick makes it an equi join: bucket every event's timestamp
    into fixed windows the same width as the range (bucket = t DIV 10min);
    an interval ``(t, t+10min]`` can only overlap buckets b and b+1, so
    each incident is exploded to exactly those two bucket keys and joined
    on bucket equality, with the exact range predicate as a post-filter.
    Cost at scale: the big side shuffles once on a uniformly distributed
    bucket key (time-ordered data means no skew beyond real hot windows),
    the incident side is rare-by-definition, and no pair outside adjacent
    buckets is ever materialized. Incidents with a quiet window are kept
    via a final left join; the per-incident rollup is usually small, but
    incident count is DATA-DEPENDENT, so the hint is left to AQE — which
    broadcasts it when its measured size allows — rather than forced with
    ``F.broadcast`` (ADVICE r3: an asserted-small broadcast is an OOM on
    skewed real data)."""
    ev_full = table(spark, sf, "events")
    ev = ev_full.select(F.unix_micros("ts").alias("t_us"), "value", "event_id")
    inc = ev_full.filter(
        (F.col("event_type") == "error") & (F.col("value") > INCIDENT_VALUE_MIN)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.unix_micros("ts").alias("i_us"),
        F.col("value").alias("incident_value"),
    )
    b = F.lit(RANGE_WINDOW_US)
    inc_banded = inc.withColumn(
        "bucket",
        F.explode(F.array((F.col("i_us") / b).cast("long"), (F.col("i_us") / b).cast("long") + 1)),
    )
    ev_banded = ev.withColumn("bucket", (F.col("t_us") / b).cast("long"))
    hits = (
        ev_banded.join(inc_banded, "bucket")
        .filter((F.col("t_us") > F.col("i_us")) & (F.col("t_us") <= F.col("i_us") + b))
        .groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            money_sum("value").alias("follow_value"),
        )
    )
    return inc.drop("i_us").join(hits, "incident_id", "left").select(
        "incident_id",
        "incident_value",
        F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
        F.coalesce("follow_value", F.lit(0.0)).alias("follow_value"),
    )


ORACLE_EVENTS_RANGE_JOIN = f"""
WITH inc AS (
  SELECT event_id AS incident_id, ts AS i_ts, value AS incident_value
  FROM events WHERE event_type = 'error' AND value > {INCIDENT_VALUE_MIN})
SELECT i.incident_id, i.incident_value,
       count(e.event_id) AS n_follow,
       coalesce({sql_money_sum("e.value")}, 0.0) AS follow_value
FROM inc i LEFT JOIN events e
  ON e.ts > i.i_ts AND e.ts <= i.i_ts + INTERVAL 10 MINUTE
GROUP BY i.incident_id, i.incident_value
"""


def q_events_gapfill_locf(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward — the
    TimescaleDB ``time_bucket_gapfill + locf`` shape. Observations are
    hourly stats of high-value events per event_type (sparse on purpose);
    the spine is every (event_type, hour) cell between the table's own
    first and last hour; missing cells get n_obs=0 and the last observed
    hourly value carried forward (null before the first observation).

    Scale: the spine is calendar-sized — hours-in-range × #series — and is
    built by exploding a ``sequence`` from a single min/max aggregate row
    cross-joined with the distinct series keys; it does not grow with the
    corpus, so both inputs to the final join are post-aggregation frames.
    The LOCF window partitions by series key and the raw table is touched
    exactly twice (bounds scan + observation scan), each a partial agg."""
    ev = table(spark, sf, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine_hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    series = ev.select("event_type").distinct()
    grid = series.crossJoin(F.broadcast(spine_hours))
    # Carry the exact 2dp decimal SUM, not an average: sums of 2dp money
    # survive the decimal->double cast exactly, while avg = sum/n lands on
    # half-point doubles (e.g. 132.825) that Spark and DuckDB round apart.
    obs = (
        ev.filter(F.col("value") > GAPFILL_VALUE_MIN)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            money_sum("value").alias("hour_value"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["event_type", "hour"], "left")
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.last("hour_value", ignorenulls=True).over(w).alias("value_filled"),
        )
    )


ORACLE_EVENTS_GAPFILL_LOCF = f"""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds),
series AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT event_type, hour FROM series CROSS JOIN spine),
obs AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n_obs,
         {sql_money_sum("value")} AS hour_value
  FROM events WHERE value > {GAPFILL_VALUE_MIN}
  GROUP BY event_type, date_trunc('hour', ts))
SELECT g.event_type, strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(o.n_obs, 0)::BIGINT AS n_obs,
       last_value(o.hour_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM grid g LEFT JOIN obs o USING (event_type, hour)
"""


def q_events_multires_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style multi-resolution continuous aggregate: hourly and
    daily rollups (plus grand total) of the events stream in ONE pass via
    ROLLUP grouping sets — the batch twin of maintaining hour/day
    materialized rollup tables. Partial aggregation combines map-side, so
    the shuffle carries one partial row per (day, hour) cell per task, not
    events; resolution is labeled from the grouping-set nullness, which is
    unambiguous because real day/hour values are never null."""
    ev = table(spark, sf, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    hour = F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
    rolled = (
        ev.select(day.alias("day"), hour.alias("hour"), "value")
        .rollup("day", "hour")
        .agg(F.count(F.lit(1)).alias("n_events"), money_sum("value").alias("total_value"))
    )
    level = (
        F.when(F.col("hour").isNotNull(), F.lit("hour"))
        .when(F.col("day").isNotNull(), F.lit("day"))
        .otherwise(F.lit("total"))
    )
    return rolled.select(
        level.alias("resolution"), "day", "hour", "n_events", "total_value"
    )


ORACLE_EVENTS_MULTIRES_ROLLUP = f"""
SELECT CASE WHEN hour IS NOT NULL THEN 'hour'
            WHEN day IS NOT NULL THEN 'day'
            ELSE 'total' END AS resolution,
       day, hour, count(*) AS n_events, {sql_money_sum("value")} AS total_value
FROM (SELECT strftime(ts, '%Y-%m-%d') AS day,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             value
      FROM events)
GROUP BY ROLLUP (day, hour)
"""


# Rolling-baseline anomaly detection: trailing-bucket lookback and the
# |z| alert threshold. 12 trailing minute-buckets ≈ the "last quarter hour"
# baseline a rate-alerting pipeline keeps per series.
ANOMALY_LOOKBACK = 12
ANOMALY_Z = 2.5


def q_events_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming-rate anomaly detection, batch form: per-minute event
    counts per event_type, a rolling mean/std over the trailing
    ``ANOMALY_LOOKBACK`` OBSERVED buckets (ROWS frame — gaps don't widen
    the baseline), and an alert row for every bucket whose count deviates
    ≥ ``ANOMALY_Z`` sample standard deviations from its own history. The
    hypertable "rate spike" monitor, expressed as one partial-agg groupBy
    plus one per-series window — shuffles carry one row per (type, minute)
    bucket, never events.

    Exactness: the window aggregates are INTEGER sums (count and count²),
    so mean/variance inputs are exact on both engines; z is then a fixed
    sequence of IEEE double ops — (n - s/L) / sqrt((L·q - s²)/(L·(L-1))) —
    which is bit-identical in Spark and DuckDB for identical integer
    inputs (no engine-ordering-dependent float accumulation anywhere).
    Only full-history buckets score (window count == lookback) and
    zero-variance windows are excluded before the division."""
    ev = table(spark, sf, "events")
    minute = F.date_format(F.date_trunc("minute", "ts"), "yyyy-MM-dd HH:mm:ss")
    buckets = (
        ev.select(F.col("event_type"), minute.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-ANOMALY_LOOKBACK, -1)
    )
    scored = buckets.select(
        "event_type",
        "bucket",
        "n_events",
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("q"),
        F.count("n_events").over(w).alias("m"),
    )
    lb = ANOMALY_LOOKBACK
    v = F.lit(lb) * F.col("q") - F.col("s") * F.col("s")  # = L(L-1)·var, exact long
    z = (F.col("n_events").cast("double") - F.col("s").cast("double") / float(lb)) / F.sqrt(
        v.cast("double") / float(lb * (lb - 1))
    )
    return (
        scored.filter((F.col("m") == lb) & (v > 0))
        .select("event_type", "bucket", "n_events", F.round(z, 4).alias("zscore"))
        .filter(F.abs(F.col("zscore")) >= ANOMALY_Z)
    )


ORACLE_EVENTS_ANOMALY_ZSCORE = f"""
WITH buckets AS (
  SELECT event_type,
         strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT event_type, bucket, n_events,
         sum(n_events) OVER w AS s,
         sum(n_events * n_events) OVER w AS q,
         count(n_events) OVER w AS m
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN {ANOMALY_LOOKBACK} PRECEDING AND 1 PRECEDING))
SELECT event_type, bucket, n_events, zscore FROM (
  SELECT event_type, bucket, n_events,
         round((n_events::DOUBLE - s::DOUBLE / {ANOMALY_LOOKBACK}.0)
               / sqrt(({ANOMALY_LOOKBACK} * q - s * s)::DOUBLE
                      / {ANOMALY_LOOKBACK * (ANOMALY_LOOKBACK - 1)}.0), 4) AS zscore
  FROM scored
  WHERE m = {ANOMALY_LOOKBACK} AND {ANOMALY_LOOKBACK} * q - s * s > 0)
WHERE abs(zscore) >= {ANOMALY_Z}
"""


def q_revenue_rolling_7d(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 7-day revenue: per-day order totals with a RANGE-framed
    rolling sum over the preceding 6 days + current — the moving-average
    primitive behind every ops dashboard. The frame is driven by integer
    epoch-day arithmetic (rangeBetween on datediff days), so frame
    membership is engine-exact; sums are decimal until the output cast.

    Scale note: the window runs on the DAY-LEVEL aggregate, whose row
    count is bounded by the calendar (~2.4k rows for the 7-year fixture),
    not the data — the raw orders reduce map-side into per-day partial
    aggs first. A single unpartitioned window over a calendar-bounded
    frame is the correct plan at any corpus size; the gate pins that the
    window's input is the day aggregate, not raw orders."""
    orders = table(spark, sf, "orders")
    per_day = (
        orders.select(
            F.col("o_orderdate").alias("day"),
            F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias("dayno"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("day", "dayno")
        .agg(F.sum("p").alias("rev"))
    )
    w = Window.orderBy("dayno").rangeBetween(-6, 0)
    return per_day.select(
        "day",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.sum("rev").over(w).cast("double"), 2).alias("rolling_7d"),
    )


ORACLE_REVENUE_ROLLING_7D = """
WITH per_day AS (
  SELECT o_orderdate AS day,
         date_diff('day', DATE '1992-01-01', o_orderdate) AS dayno,
         sum(o_totalprice::DECIMAL(18,2)) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT day,
       round(rev::DOUBLE, 2) AS revenue,
       round(sum(rev) OVER (ORDER BY dayno RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::DOUBLE,
             2) AS rolling_7d
FROM per_day
"""


ACF_MAX_LAG = 14


def q_revenue_acf(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags
    1..14 — the diagnostic every forecasting pipeline runs first (weekly
    seasonality shows as a lag-7/14 spike; a slow decay says trend).
    Uses the standard full-series-mean estimator
    r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)².

    Numeric determinism (the ANOVA second-moment doctrine): daily values
    are exact integer cents; multiplying the estimator through by n²
    clears the rational mean, so both numerator
    n²·Σx_t·x_{t+k} − n·S·(A_k+B_k) + (n−k)·S² and denominator n²·Q − n·S²
    are EXACT DECIMAL(38,0)/HUGEINT expressions (S=Σx, Q=Σx², A_k/B_k the
    overlap partial sums); r_k is ONE double division, rounded 6dp —
    no catastrophic cancellation in doubles anywhere.  Widths: n≈2.4e3
    days, x up to ~1.5e12 cents/day at 100 TB → n²·Σxy ≈ 3e34 < 10³⁸.

    Scale shape: orders collapse map-side to the |dates|-row daily frame;
    the lag structure is ONE window pass (14 lead() columns over the
    bounded frame) exploded to a 14·|dates| stack that partial-aggregates
    to 14 rows.  No self-join, no fact-table sort."""
    orders = table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    ).cast("long")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("v")
    )
    w_t = Window.orderBy("d")
    dec = "decimal(38,0)"
    vd = F.col("v").cast("decimal(18,0)")
    led = daily.select(
        "v",
        *[
            F.lead("v", k).over(w_t).alias(f"y{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    lagged = led.select(
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("k"), F.col(f"y{k}").alias("y"))
                    for k in range(1, ACF_MAX_LAG + 1)
                ]
            )
        ).alias("lag"),
    ).select("v", F.col("lag.k").alias("k"), F.col("lag.y").alias("y"))
    per_k = (
        lagged.filter(F.col("y").isNotNull())
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum((vd * F.col("y").cast("decimal(18,0)")).cast(dec)).alias("sxy"),
            F.sum(vd).cast(dec).alias("a_sum"),
            F.sum(F.col("y").cast("decimal(18,0)")).cast(dec).alias("b_sum"),
        )
    )
    glob = daily.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(vd).cast(dec).alias("s"),
        F.sum((vd * vd).cast(dec)).alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    num = (
        (n * n).cast(dec) * F.col("sxy")
        - (n * s).cast(dec) * (F.col("a_sum") + F.col("b_sum")).cast(dec)
        + (n - F.col("k")).cast(dec) * (s * s).cast(dec)
    ).cast(dec)
    den = ((n * n).cast(dec) * q - (n * (s * s).cast(dec)).cast(dec)).cast(dec)
    return (
        per_k.crossJoin(F.broadcast(glob))
        .select(
            F.col("k").cast("int").alias("lag"),
            F.col("n_pairs").cast("long"),
            F.round(num.cast("double") / den.cast("double"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


ORACLE_REVENUE_ACF = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         sum((o_totalprice::DECIMAL(18,2) * 100)::DECIMAL(18,0)::BIGINT)::BIGINT AS v
  FROM orders GROUP BY 1
),
idx AS (
  SELECT v, row_number() OVER (ORDER BY d) AS t FROM daily
),
lagged AS (
  SELECT b.t - a.t AS k, a.v AS v, b.v AS y
  FROM idx a JOIN idx b ON b.t > a.t AND b.t <= a.t + {ACF_MAX_LAG}
),
per_k AS (
  SELECT k, count(*)::BIGINT AS n_pairs,
         sum(v::HUGEINT * y::HUGEINT)::HUGEINT AS sxy,
         sum(v)::HUGEINT AS a_sum, sum(y)::HUGEINT AS b_sum
  FROM lagged GROUP BY k
),
totals AS (
  SELECT count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s,
         sum(v::HUGEINT * v::HUGEINT)::HUGEINT AS q
  FROM daily
)
SELECT k::INT AS lag, n_pairs,
       round((n * n * sxy - n * s * (a_sum + b_sum) + (n - k) * s * s)::DOUBLE
             / (n * n * q - n * s * s)::DOUBLE, 6) AS acf
FROM per_k, totals
ORDER BY lag
"""


def q_revenue_seasonal_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Classical (moving-average) seasonal decomposition of MONTHLY
    revenue — the additive-model seasonal profile: trend = centered
    12-month MA (half-weight endpoints, the textbook even-period form),
    detrended = observed − trend, seasonal index = per-calendar-month
    mean of the detrended series.  A lag-7/14 ACF spike says "weekly";
    this says WHICH months run hot or cold and by how many dollars.

    Numeric determinism: monthly revenue is exact integer cents; the
    centered MA is carried ×24 — trend24_t = v_{t−6} + 2·Σ_{t−5..t+5} +
    v_{t+6}, an exact BIGINT window expression — and the detrended value
    ×24 is an exact subtraction; each month's seasonal index is ONE
    double division sum/(n·2400) at the end, rounded 4dp.  Months
    without a full ±6 window (the first/last 6) are excluded exactly as
    the textbook estimator prescribes — via the lag/lead NULLs, in both
    engines.

    Scale shape: the fact table collapses map-side to the |months|-row
    frame (~84 rows for the 7-year fixture); every window runs on that
    calendar-bounded frame — same tiny-frame exemption as rolling_7d."""
    orders = table(spark, sf, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "decimal(18,0)"
    ).cast("long")
    monthly = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(cents).alias("v")
    )
    w_m = Window.orderBy("m")
    w_band = w_m.rowsBetween(-5, 5)
    trend24 = (
        F.lag("v", 6).over(w_m)
        + 2 * F.sum("v").over(w_band)
        + F.lead("v", 6).over(w_m)
    )
    scored = monthly.select(
        F.month("m").alias("month"),
        "v",
        (24 * F.col("v") - trend24).alias("detr24"),
    ).filter(F.col("detr24").isNotNull())
    return (
        scored.groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("detr24").alias("s24"),
        )
        .select(
            "month",
            F.col("n_obs").cast("long"),
            F.round(
                F.col("s24").cast("double") / (F.col("n_obs") * 2400).cast("double"),
                4,
            ).alias("seasonal_dollars"),
        )
        .orderBy("month")
    )


ORACLE_REVENUE_SEASONAL_PROFILE = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         sum((o_totalprice::DECIMAL(18,2) * 100)::DECIMAL(18,0)::BIGINT)::BIGINT AS v
  FROM orders GROUP BY 1
),
scored AS (
  SELECT month(m)::INT AS month,
         24 * v - (lag(v, 6) OVER (ORDER BY m)
                   + 2 * sum(v) OVER (ORDER BY m
                                      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
                   + lead(v, 6) OVER (ORDER BY m)) AS detr24
  FROM monthly
)
SELECT month, count(*)::BIGINT AS n_obs,
       round(sum(detr24)::DOUBLE / (count(*) * 2400)::DOUBLE, 4)
         AS seasonal_dollars
FROM scored WHERE detr24 IS NOT NULL
GROUP BY month ORDER BY month
"""


QUERIES: dict[str, Query] = {
    "revenue_seasonal_profile": Query(
        q_revenue_seasonal_profile,
        ORACLE_REVENUE_SEASONAL_PROFILE,
        ("timeseries", "stats", "seasonality"),
    ),
    "revenue_acf": Query(
        q_revenue_acf, ORACLE_REVENUE_ACF, ("timeseries", "stats", "trend")
    ),
    "revenue_rolling_7d": Query(
        q_revenue_rolling_7d, ORACLE_REVENUE_ROLLING_7D, ("timeseries", "window", "rolling")
    ),
    "events_asof_join": Query(
        q_events_asof_join, ORACLE_EVENTS_ASOF_JOIN, ("events", "asof-join"), bench=True
    ),
    "events_range_join": Query(
        q_events_range_join, ORACLE_EVENTS_RANGE_JOIN, ("events", "range-join"), bench=True
    ),
    "events_gapfill_locf": Query(
        q_events_gapfill_locf, ORACLE_EVENTS_GAPFILL_LOCF, ("events", "gapfill")
    ),
    "events_multires_rollup": Query(
        q_events_multires_rollup, ORACLE_EVENTS_MULTIRES_ROLLUP, ("events", "rollup")
    ),
    "events_anomaly_zscore": Query(
        q_events_anomaly_zscore,
        ORACLE_EVENTS_ANOMALY_ZSCORE,
        ("events", "window", "anomaly"),
        bench=True,
    ),
}
