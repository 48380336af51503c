"""Event-analytics operators over ``events`` — the query surface the
reference feeds (it ships events to Mixpanel precisely so these questions
can be asked). The engine answers them natively (SURVEY.md §2.6: the
reference has no query layer; ours is Spark's own).

All are classic one-or-two-shuffle shapes:
  * sessionize — gap-based sessionization via window lag + running sum
    (one shuffle on user_id, then narrow).
  * funnel — ordered multi-step conversion via CHAINED window minimums
    over one user_id exchange (no per-step joins, no lineage recompute).
  * retention — first-seen cohort attached as a window minimum (no
    self-join), then the cohort x offset distinct-count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tomixpanel_spark.operators.base import QuerySpec, table

SESSION_GAP_S = 1800


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap from the
    previous event exceeds 30 min. session_num is the running count of
    session starts per user — the stateful operator the reference fakes
    with 'session begins/ends' rows (M2), done relationally."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_seconds(F.col("ts")) - F.unix_seconds(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(is_new).over(run).cast("bigint").alias("session_num"),
    )


_SESSIONIZE_SQL = f"""
SELECT event_id, user_id,
  CAST(SUM(CASE WHEN gap_s IS NULL OR gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END)
       OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
FROM (
  SELECT event_id, user_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
  FROM events)
"""


def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel view -> click -> purchase: users counted at
    each stage, each later step strictly after the user's previous-step
    time.

    Shape: ONE exchange. The per-user step times chain as window minimums
    over the same ``partitionBy(user_id)`` spec — Catalyst stacks the
    three Window operators on a single shuffle (each step's condition
    references the previous step's window value, so they chain as
    projections, not re-partitions). The per-user reduce then rides the
    same partitioning (no second exchange) and the 3-row stage unpivot is
    a 1-row aggregate stack. The old form (per-step groupBy + join back)
    evaluated step k's lineage 4-k times and shuffled 6x at any scale."""
    ev = table(spark, sf_dir, "events")
    # only step rows can set a step time, and a user with no step rows
    # contributes nothing to any count() — so non-step events are dead
    # weight in the exchange. Filtering BEFORE the window shuffle cuts
    # the shuffled bytes to the step types' share of the corpus (the
    # win that matters at 100 TB; result-identical by the null-count
    # argument above).
    ev = ev.filter(F.col("event_type").isin("view", "click", "purchase"))
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e1 = ev.select("user_id", "event_type", "ts", t1.alias("t1"))
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    e2 = e1.select("user_id", "event_type", "ts", "t1", t2.alias("t2"))
    t3 = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
    ).over(w)
    e3 = e2.select("user_id", "t1", "t2", t3.alias("t3"))
    per_user = e3.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"), F.first("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return counts.select(
        F.stack(
            F.lit(3),
            F.lit("1_view"), F.col("n1"),
            F.lit("2_click"), F.col("n2"),
            F.lit("3_purchase"), F.col("n3"),
        ).alias("stage", "n_users")
    )


_FUNNEL_SQL = """
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
UNION ALL SELECT '2_click', COUNT(*) FROM s2
UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
"""


def retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen date; for each day
    offset 0..7, distinct returning users.

    The first-seen date attaches as a window minimum over user_id instead
    of a self-join back to a per-user aggregate — one scan of events and
    one user_id exchange (the join form scanned events twice and shuffled
    both join sides), then the cohort x offset distinct-count exchange."""
    ev = table(spark, sf_dir, "events")
    cohort = F.min(F.to_date("ts")).over(Window.partitionBy("user_id"))
    j = ev.select(
        "user_id",
        cohort.cast("string").alias("cohort_date"),
        F.datediff(F.to_date("ts"), cohort).cast("bigint").alias("day_offset"),
    )
    return (
        j.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_date", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_RETENTION_SQL = """
WITH first AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1)
SELECT CAST(cohort AS VARCHAR) AS cohort_date,
       date_diff('day', cohort, CAST(ts AS DATE)) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN first ON e.user_id = first.user_id
WHERE date_diff('day', cohort, CAST(ts AS DATE)) <= 7
GROUP BY 1, 2
"""




def value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type (p50/p95).

    Uses Spark's exact ``percentile`` (sort-based), not approx sketches —
    deterministic and oracle-comparable; emitted at 1e-6 integer scale to
    absorb interpolation-arithmetic ULPs across engines. At 100 TB swap in
    ``approx_percentile`` (fixed-size GK sketch, mergeable map-side) when
    the exactness/cost trade flips.
    """
    ev = table(spark, sf_dir, "events")
    def pe6(p):
        return F.round(F.expr(f"percentile(value, {p})") * 1_000_000).cast("bigint")
    return ev.groupBy("event_type").agg(
        pe6(0.5).alias("p50_e6"), pe6(0.95).alias("p95_e6")
    )


_VALUE_QUANTILES_SQL = """
SELECT event_type,
  CAST(round(quantile_cont(value, 0.5) * 1000000) AS BIGINT) AS p50_e6,
  CAST(round(quantile_cont(value, 0.95) * 1000000) AS BIGINT) AS p95_e6
FROM events GROUP BY event_type
"""


HIST_BINS = 128
HIST_QS = (50, 90, 99)


def histogram_sketch(
    df: DataFrame, value_col: str = "value", bins: int = HIST_BINS
) -> DataFrame:
    """Fixed-bin integer histogram over ``floor(value*100)`` cents:
    (bin, cnt) + the (lo, hi, n) bounds on every row. The MERGEABLE
    quantile accumulator — bin counts are plain sums, so partials from
    partitions/batches/workers combine cellwise to exactly the histogram
    of the union (the CMS contract applied to quantiles), and the
    shuffle carries at most ``bins`` rows per partition no matter the
    input size. Integer cents + integer bin math keep it bit-identical
    across engines (float binning would ULP-flip boundary values).
    NULL values are skipped (the percentile convention)."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    v = df.filter(F.col(value_col).isNotNull()).select(cents.alias("c"))
    b = v.agg(
        F.min("c").alias("lo"), F.max("c").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        v.crossJoin(F.broadcast(b))
        .select(
            F.expr(f"(c - lo) * {bins} div (hi - lo + 1)").alias("bin"),
            "lo", "hi", "n",
        )
        .groupBy("bin", "lo", "hi", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from the mergeable fixed-bin histogram —
    the BOUNDED-STATE scale path beside the exact sort-based
    ``value_quantiles``: at 100 TB an exact percentile sorts (or
    GK-sketches) the full value column, while this plan's shuffle
    carries <= HIST_BINS rows per partition and the estimate is each
    quantile's bin lower bound (error <= one bin width, integer-exact
    and engine-identical — no float interpolation to ULP-drift).
    rank(q) = ceil(q*n/100) over the cumulative bin counts; empty input
    yields zero rows."""
    ev = table(spark, sf_dir, "events")
    hist = histogram_sketch(ev)
    cum = hist.select(
        "bin", "lo", "hi", "n",
        F.sum("cnt").over(Window.orderBy("bin")).alias("cum"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q")
    )
    # per-q target rank, then the FIRST bin whose cumulative count
    # reaches it; both sides of the join are tiny (<= bins x qs rows)
    return (
        cum.join(qs)
        .filter(F.col("cum") >= F.expr("(q * n + 99) div 100"))
        .groupBy("q")
        .agg(
            F.min(
                F.expr(f"lo + bin * (hi - lo + 1) div {HIST_BINS}")
            ).alias("est_cents")
        )
        .select(F.col("q").cast("bigint").alias("q"), "est_cents")
    )


_HIST_QUANTILES_SQL = f"""
WITH v AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL),
b AS (SELECT MIN(c) AS lo, MAX(c) AS hi, COUNT(*) AS n FROM v),
bins AS (
  SELECT (c - lo) * {HIST_BINS} // (hi - lo + 1) AS bin, COUNT(*) AS cnt
  FROM v, b GROUP BY 1),
cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM bins),
qs AS (SELECT UNNEST([{", ".join(str(q) for q in HIST_QS)}]) AS q)
SELECT CAST(q AS BIGINT) AS q,
       CAST(MIN(lo + bin * (hi - lo + 1) // {HIST_BINS}) AS BIGINT)
         AS est_cents
FROM qs, b, cum
WHERE cum >= (q * n + 99) // 100
GROUP BY q
"""


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations the reference lacks entirely (SURVEY §2.6): users who
    clicked EXCEPT users who purchased, INTERSECT with error-reporters.

    Implemented as ONE flag-aggregate over the stream (per-user bool flags
    per type, then a filter): the literal distinct/exceptAll/intersect
    pipeline is 5 exchanges over the same rows, this is 1 — at 100 TB
    that's one pass over events instead of three scans plus set-op
    shuffles. The oracle intentionally keeps the literal EXCEPT ALL /
    INTERSECT form, so the correctness gate proves the rewrite equals the
    real set-op evaluation (Spark's native exceptAll/intersect remain
    available on the free SQL surface for ad-hoc use)."""
    # cutoff keeps the result non-degenerate (without it, every synthetic
    # user eventually does every event type and the difference is empty)
    ev = table(spark, sf_dir, "events").filter(F.col("ts") < "2024-01-02")

    def did(t):
        return F.max((F.col("event_type") == t).cast("int"))

    return (
        ev.groupBy("user_id")
        .agg(did("click").alias("c"), did("purchase").alias("p"), did("error").alias("e"))
        .filter((F.col("c") == 1) & (F.col("p") == 0) & (F.col("e") == 1))
        .select("user_id")
    )


_SET_OPS_SQL = """
SELECT user_id FROM (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-02'
  EXCEPT ALL
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-02')
INTERSECT
SELECT DISTINCT user_id FROM events
WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-02'
"""



def event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event->next-event transition counts per user stream (path
    analysis): window lead over (user, time) then a pair rollup."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_event"),
        F.lead("event_type").over(w).alias("to_event"),
    ).filter(F.col("to_event").isNotNull())
    return pairs.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("n")
    )


_EVENT_SEQUENCES_SQL = """
SELECT from_event, to_event, COUNT(*) AS n FROM (
  SELECT event_type AS from_event,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_event
  FROM events)
WHERE to_event IS NOT NULL
GROUP BY from_event, to_event
"""


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the TimescaleDB continuous-aggregate
    capability): hourly AND daily grains from ONE raw scan.

    Physical shape: GROUPING SETS ((day, hour, type), (day, type)) — the
    expand node doubles rows BEFORE the partial aggregate, so the single
    shuffle carries only hourly+daily cells, and the raw table is read
    once. (The naive hourly-then-daily lineage union LOOKS like it rolls
    daily from hourly partials, but Spark resolves each union branch
    independently — exchange reuse does not fire across the differing
    aggregates — so it executes TWO full raw scans; verified on the
    physical plan.) Sums stay DECIMAL so hourly cells and daily cells
    agree exactly with re-aggregation (the persisted-artifact variant —
    materialize hourly with ``derived()``/``sinks.lake`` and fold daily
    from it incrementally — relies on that same re-aggregability; counts
    and DECIMAL sums are mergeable, averages derive at read time,
    quantiles would need mergeable sketches). Cast to double only at the
    output edge."""
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day_b"),
        F.date_trunc("hour", F.col("ts")).alias("hour_b"),
        "event_type",
        "value",
    )
    agg = ev.groupingSets(
        [["day_b", "hour_b", "event_type"], ["day_b", "event_type"]],
        "day_b",
        "hour_b",
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(24,6)")).alias("sum_dec"),
        F.grouping("hour_b").alias("__is_day"),
    )
    return agg.select(
        F.when(F.col("__is_day") == 1, F.lit("day")).otherwise(F.lit("hour")).alias("grain"),
        F.coalesce(F.col("hour_b"), F.col("day_b")).cast("string").alias("bucket_start"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_dec").cast("double").alias("sum_value"),
    )


_HYPERTABLE_ROLLUP_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(24,6))) AS sum_dec
  FROM events GROUP BY 1, 2),
daily AS (
  SELECT date_trunc('day', bucket) AS bucket, event_type,
         SUM(n) AS n, SUM(sum_dec) AS sum_dec
  FROM hourly GROUP BY 1, 2)
SELECT 'hour' AS grain, CAST(bucket AS VARCHAR) AS bucket_start, event_type,
       CAST(n AS BIGINT) AS n, CAST(sum_dec AS DOUBLE) AS sum_value
FROM hourly
UNION ALL
SELECT 'day', CAST(CAST(bucket AS TIMESTAMP) AS VARCHAR), event_type,
       CAST(n AS BIGINT), CAST(sum_dec AS DOUBLE)
FROM daily
"""


KMV_K = 64
_KMV_SCALE = float(1 << 48)  # hashes are 12 md5 hex digits -> [0, 2^48)


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch: per event_type,
    estimate |distinct user_id| from the k smallest values of a uniform
    hash of the ids. Mergeable (union of min-sets, re-take k smallest),
    fixed size O(k) per group no matter the cardinality — the
    approximate-distinct shape a 100 TB pipeline uses where an exact
    distinct would shuffle every id.

    Estimator: exact count when fewer than k distinct hashes exist, else
    (k-1) / normalized kth-minimum (Bar-Yossef et al. 2002). The hash is
    md5-derived, so DuckDB reproduces the ESTIMATE (including its error)
    bit-for-bit — the sketch itself is oracle-checked, not just its
    neighborhood.

    Scale shape: distinct (group, hash) hash-agg with map-side partials,
    then a group-keyed window to keep the k minima (shuffle carries
    distinct hashes only), then a tiny per-group aggregate. A production
    variant would pre-prune map-side with an approximate kth-min
    threshold; the plan here is the same two-exchange shape."""
    ev = table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    h = ev.select("event_type", hv.alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    mins = h.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= KMV_K)
    s = mins.groupBy("event_type").agg(
        F.max("hv").alias("hk"), F.count(F.lit(1)).alias("m")
    )
    est = F.when(F.col("m") < KMV_K, F.col("m").cast("double")).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("hk").cast("double") / F.lit(_KMV_SCALE))
    )
    return s.select("event_type", est.alias("est_distinct"))


_KMV_DISTINCT_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS hv
  FROM events),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk
  FROM h),
s AS (
  SELECT event_type, max(hv) AS hk, COUNT(*) AS m
  FROM r WHERE rk <= {KMV_K} GROUP BY 1)
SELECT event_type,
  CASE WHEN m < {KMV_K} THEN CAST(m AS DOUBLE)
       ELSE {float(KMV_K - 1)} / (CAST(hk AS DOUBLE) / {_KMV_SCALE})
  END AS est_distinct
FROM s
"""


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the DAU/WAU family).

    Spark windows cannot COUNT(DISTINCT) over a range frame, and a
    per-day self-join over the trailing range re-scans the activity
    table 7x. The scale-correct shape is CONTRIBUTION EXPLODE: dedup to
    (user, active_day) once, explode each row onto the <=7 window-days
    it contributes to, then one hash aggregate of count-distinct users
    per window-day. Cost: one dedup shuffle + a 7x narrow row multiply +
    one agg shuffle — each linear in activity, independent of window
    length relative to the join form. Trailing windows that extend past
    the last observed day are emitted too (both engines agree on the
    full set)."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("bucket_day"),
    )
    return contrib.groupBy("bucket_day").agg(
        F.count_distinct("user_id").alias("active_7d")
    )


_ROLLING_ACTIVE_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
contrib AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d AS TIMESTAMP),
                                              CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                                              INTERVAL 1 DAY)) AS DATE) AS bucket_day
  FROM ud)
SELECT bucket_day, COUNT(DISTINCT user_id) AS active_7d
FROM contrib GROUP BY 1
"""


REGISTRY = {
    "sessionize": QuerySpec(sessionize, _SESSIONIZE_SQL, "analytics"),
    "rolling_active_users": QuerySpec(
        rolling_active_users, _ROLLING_ACTIVE_SQL, "analytics: sliding distinct"
    ),
    "kmv_distinct": QuerySpec(
        kmv_distinct, _KMV_DISTINCT_SQL, "custom operator: KMV distinct sketch"
    ),
    "hypertable_rollup": QuerySpec(
        hypertable_rollup, _HYPERTABLE_ROLLUP_SQL, "custom operator: continuous-aggregate rollup"
    ),
    "funnel": QuerySpec(funnel, _FUNNEL_SQL, "analytics"),
    "retention": QuerySpec(retention, _RETENTION_SQL, "analytics"),
    "value_quantiles": QuerySpec(value_quantiles, _VALUE_QUANTILES_SQL, "analytics"),
    "hist_quantiles": QuerySpec(
        hist_quantiles, _HIST_QUANTILES_SQL,
        "analytics: mergeable fixed-bin quantile sketch (scale path)",
    ),
    "set_ops": QuerySpec(set_ops, _SET_OPS_SQL, "free surface"),
    "event_sequences": QuerySpec(event_sequences, _EVENT_SEQUENCES_SQL, "analytics"),
}
