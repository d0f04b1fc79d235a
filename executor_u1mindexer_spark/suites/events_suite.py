"""Events suite: windowing / sessionization / as-of / JSON ops (SURVEY.md §2.B
"Streaming-only" row — batch-computable equivalents over the `events` table;
streaming/ holds the Structured Streaming variants of the same builders).

Oracle notes:
- tumbling/sliding window starts are epoch-aligned in both engines
  (Spark F.window aligns to 1970-01-01 UTC; DuckDB time_bucket's default
  origin 2000-01-03 00:00 UTC sits on every whole-hour/30-min boundary);
- session semantics: a new session starts when ts - prev_ts >= gap (Spark
  merges while the next event is strictly inside [ts, ts+gap)); oracle is
  the classic gaps-and-islands rewrite;
- the as-of oracle uses DuckDB's native ASOF LEFT JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.operators import events as E

GAP = "30 minutes"


def _dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,6)")


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return E.tumbling_window(
        ev,
        "1 hour",
        keys=("event_type",),
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        ],
    )


def events_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the classic TSDB/market-data resample: per
    (hour, event_type) bar, the first and last tick's value (open/close),
    the extremes (high/low), tick count, and the decimal-summed volume
    proxy. open/close pick by a (ts, event_id) composite via
    min_by/max_by (one aggregate pass, no window), so duplicate
    timestamps stay deterministic; the composite rides as a
    zero-padded lexicographic string because this DuckDB's
    arg_min/arg_max accepts only scalar keys (no struct ordering). Same
    single-shuffle grouped-agg shape as events_tumbling_hourly."""
    ev = tables.load(spark, sf_dir, "events")
    # fixed-width render (microsecond precision, zero-padded) — NTZ
    # timestamps have no unix_micros in Spark, and a plain string cast
    # trims trailing zeros, so both engines format explicitly
    ordk = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return E.tumbling_window(
        ev,
        "1 hour",
        keys=("event_type",),
        aggs=[
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        ],
    )


def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return E.sliding_window(ev, "1 hour", "30 minutes", aggs=[F.count(F.lit(1)).alias("n_events")])


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return E.sessionize(
        ev,
        GAP,
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        ],
    )


def events_asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    out = E.asof_join_last_before(purchases, views, on="user_id", asof_col="last_view_ts")
    return out.select("event_id", "user_id", "ts", "last_view_ts")


CAP_GAP_S = 43_200   # 12 h inactivity gap
CAP_DUR_S = 86_400   # 24 h absolute session ceiling


def events_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap + max-duration sessionization (r11,
    operators/events.sessionize_capped): the GA/Snowplow session rule —
    12 h idle OR a 24 h absolute ceiling — whose split recurrence no
    window frame can express (session_start depends on the previous
    split). Spark runs the per-user Arrow fold; the oracle replays the
    identical recurrence as a DuckDB RECURSIVE CTE walking rn -> rn+1.
    Non-vacuous: the cap adds 49/483/~4.8k extra splits at the three
    SFs over the gap-only rule."""
    ev = tables.load(spark, sf_dir, "events")
    return E.sessionize_capped(ev, CAP_GAP_S, CAP_DUR_S).orderBy(
        "user_id", "session_start_s"
    )


def events_asof_nearest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward + nearest as-of directions (r11,
    operators/events.asof_join_nearest): for each purchase, the last
    view at-or-before, the first view at-or-after, and the nearer of
    the two (ties backward) — one shuffle, two window frames; the
    oracle is DuckDB's native ASOF JOIN run in both directions."""
    ev = tables.load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    out = E.asof_join_nearest(purchases, views, on="user_id")
    return out.select(
        "event_id", "user_id", "ts", "before_ts", "after_ts", "nearest_ts"
    ).orderBy("event_id")


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        E.json_get_int("props", "$.k").alias("k"),
    ).filter(F.col("k") > 50)


def events_pivot_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: events per day x event_type (explicit value list keeps the
    plan single-pass and the schema deterministic)."""
    ev = tables.load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=types)
        .orderBy("day")
    )


def events_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after their
    first view, then purchased strictly after that first qualifying click
    (operators/events.funnel_stages)."""
    ev = tables.load(spark, sf_dir, "events")
    f = E.funnel_stages(ev, ["view", "click", "purchase"])
    return f.agg(
        F.count("stage_1_ts").alias("n_viewed"),
        F.count("stage_2_ts").alias("n_clicked_after_view"),
        F.count("stage_3_ts").alias("n_purchased_after_click"),
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted by
    how many days after their cohort day they were active. Two shuffles on
    user_id (first-seen agg + distinct active days), then the broadcastable
    per-user cohort map joins back — the standard product-analytics rollup."""
    ev = tables.load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        active.join(first, on="user_id")
        .groupBy(
            "cohort_day",
            F.datediff(
                F.col("active_day").cast("date"), F.col("cohort_day").cast("date")
            ).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly spine per event_type with forward-filled sums
    (operators/events.gapfill_hourly) — the TSDB gapfill/locf op."""
    ev = tables.load(spark, sf_dir, "events")
    return E.gapfill_hourly(ev).orderBy("hour", "event_type")


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event chains
    (r07, operators/events.markov_transitions): (from_type, to_type)
    counts + micro-scaled floor-division probabilities — bit-exact, one
    partitioned lag window + one grouped count; the |types|^2 matrix's
    row totals broadcast back."""
    ev = tables.load(spark, sf_dir, "events")
    return E.markov_transitions(ev)


def events_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-overlapping-intervals coverage (r10,
    operators/events.interval_union_coverage): each event opens an
    integer-seconds interval [epoch(ts), epoch(ts) + max(1,
    round(value))) and per user the overlapping/adjacent intervals
    union into islands — time-on-site/SLA-coverage semantics the
    fixed-gap sessionize cannot express (an early long interval must
    swallow later short ones; the island rule is a running max of ends,
    not a gap threshold). Pure BIGINT, total-ordered windows, so the
    oracle replays the identical running-max/island chain."""
    ev = tables.load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("ivs"),
        (
            F.unix_timestamp("ts").cast("long")
            + F.greatest(F.lit(1), F.round(F.col("value")).cast("long"))
        ).alias("ive"),
    )
    return E.interval_union_coverage(iv, "user_id", "ivs", "ive", "event_id")


def events_interval_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downtime-gap report (r11, operators/events.interval_gap_report):
    the SLA complement of events_interval_union — one row per gap
    between consecutive coverage islands per user, over the SAME
    event-opened intervals. Pure BIGINT; the oracle replays the island
    chain plus one lag over island starts."""
    ev = tables.load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("ivs"),
        (
            F.unix_timestamp("ts").cast("long")
            + F.greatest(F.lit(1), F.round(F.col("value")).cast("long"))
        ).alias("ive"),
    )
    return E.interval_gap_report(iv, "user_id", "ivs", "ive", "event_id")


QUERIES = {
    "events_interval_union": events_interval_union,
    "events_interval_gaps": events_interval_gaps,
    "events_tumbling_hourly": events_tumbling_hourly,
    "events_markov_transitions": events_markov_transitions,
    "events_resample_ohlc": events_resample_ohlc,
    "events_gapfill_hourly": events_gapfill_hourly,
    "events_sliding_1h_30m": events_sliding_1h_30m,
    "events_sessionize": events_sessionize,
    "events_asof_purchase_last_view": events_asof_purchase_last_view,
    "events_asof_nearest_view": events_asof_nearest_view,
    "events_sessionize_capped": events_sessionize_capped,
    "events_json_extract": events_json_extract,
    "events_pivot_daily_types": events_pivot_daily_types,
    "events_funnel_view_click_purchase": events_funnel_view_click_purchase,
    "events_retention_cohorts": events_retention_cohorts,
}

# identical running-max / island-sum window chain; the (__s, __e, id)
# total order makes every intermediate a pure function of the data —
# shared by the coverage row and its gap-report complement exactly as
# operators/events._interval_islands is shared by the two operators
_INTERVAL_ISLANDS_CTE = """
WITH iv AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ivs,
         CAST(floor(epoch(ts)) AS BIGINT)
           + greatest(1, CAST(round(value) AS BIGINT)) AS ive
  FROM events
  -- mirror the operator's input policy (ADVICE r10): both sides drop
  -- NULL-bound rows; the end > start check is vacuous here (ive is
  -- constructed >= ivs+1) but states the same contract
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
), hardened AS (
  SELECT * FROM iv WHERE ive > ivs
), flagged AS (
  SELECT user_id, ivs, ive,
         CASE WHEN ivs > coalesce(
           max(ive) OVER (PARTITION BY user_id ORDER BY ivs, ive, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           -4611686018427387904) THEN 1 ELSE 0 END AS newf,
         event_id
  FROM hardened
), islanded AS (
  SELECT user_id, ivs, ive,
         sum(newf) OVER (PARTITION BY user_id ORDER BY ivs, ive, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
), islands AS (
  SELECT user_id, island, min(ivs) AS i_s, max(ive) AS i_e,
         count(*) AS n
  FROM islanded GROUP BY user_id, island
)
"""

ORACLES = {
    "events_interval_union": _INTERVAL_ISLANDS_CTE + """
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(i_e - i_s) AS BIGINT) AS covered_units,
       CAST(max(i_e) - min(i_s) AS BIGINT) AS span_units
FROM islands GROUP BY user_id ORDER BY user_id
""",
    "events_interval_gaps": _INTERVAL_ISLANDS_CTE + """
SELECT user_id,
       CAST(gap_start AS BIGINT) AS gap_start,
       CAST(gap_end AS BIGINT) AS gap_end,
       CAST(gap_end - gap_start AS BIGINT) AS gap_units
FROM (
  SELECT user_id,
         lag(i_e) OVER (PARTITION BY user_id ORDER BY i_s) AS gap_start,
         i_s AS gap_end
  FROM islands
) g
WHERE gap_start IS NOT NULL
ORDER BY user_id, gap_start
""",
    "events_markov_transitions": E.oracle_markov_sql(),
    # dense spine via generate_series over the corpus min/max hour; DuckDB's
    # last_value IGNORE NULLS is the same forward-fill as Spark's
    # F.last(ignorenulls=True) over ROWS UNBOUNDED PRECEDING
    "events_gapfill_hourly": """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), keys AS (
  SELECT DISTINCT event_type FROM events
), dense AS (
  SELECT s.h, k.event_type FROM spine s CROSS JOIN keys k
)
SELECT f.h AS hour, f.event_type AS event_type,
       last_value(hr.v IGNORE NULLS) OVER (
         PARTITION BY f.event_type ORDER BY f.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
       coalesce(hr.n_events, 0) AS n_events,
       hr.v IS NULL AS is_gap
FROM dense f LEFT JOIN hourly hr ON hr.h = f.h AND hr.event_type = f.event_type
ORDER BY hour, event_type
""",
    "events_tumbling_hourly": """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
    "events_resample_ohlc": """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       arg_min(value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '-'
                      || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS "open",
       max(value) AS high,
       min(value) AS low,
       arg_max(value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '-'
                      || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS "close",
       count(*) AS n_ticks,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2, 3
""",
    "events_sliding_1h_30m": """
WITH starts AS (
  SELECT e.*, s.window_start
  FROM events e, LATERAL (
    SELECT unnest([time_bucket(INTERVAL '30 minutes', e.ts),
                   time_bucket(INTERVAL '30 minutes', e.ts) - INTERVAL '30 minutes']) AS window_start
  ) s
  WHERE e.ts >= s.window_start AND e.ts < s.window_start + INTERVAL '1 hour'
)
SELECT window_start, window_start + INTERVAL '1 hour' AS window_end, count(*) AS n_events
FROM starts GROUP BY 1, 2
""",
    "events_sessionize": """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
""",
    "events_asof_purchase_last_view": """
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
     views AS (SELECT * FROM events WHERE event_type = 'view')
SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
FROM purchases p ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    # the same split recurrence, replayed row-by-row: walk joins rn -> rn+1
    # per user, carrying sess_start forward; floor(epoch()) matches Spark's
    # ns//1e9 integer-seconds floor
    "events_sessionize_capped": f"""
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), walk AS (
  SELECT user_id, rn, t, t AS sess_start FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.t,
         CASE WHEN e.t - w.t >= {CAP_GAP_S} OR e.t - w.sess_start > {CAP_DUR_S}
              THEN e.t ELSE w.sess_start END
  FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn + 1
)
SELECT user_id, sess_start AS session_start_s,
       CAST(max(t) AS BIGINT) AS session_end_s,
       CAST(count(*) AS BIGINT) AS n_events
FROM walk GROUP BY user_id, sess_start
ORDER BY user_id, session_start_s
""",
    # both directions via DuckDB's native ASOF JOIN (backward v.ts<=p.ts,
    # forward v.ts>=p.ts), nearest = closer absolute gap, ties backward —
    # a deliberately different formulation from Spark's union+two-frame
    # windows
    "events_asof_nearest_view": """
WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
     views AS (SELECT * FROM events WHERE event_type = 'view'),
     back AS (
       SELECT p.event_id, p.user_id, p.ts, v.ts AS before_ts
       FROM purchases p ASOF LEFT JOIN views v
         ON p.user_id = v.user_id AND v.ts <= p.ts
     ),
     fwd AS (
       SELECT p.event_id, v.ts AS after_ts
       FROM purchases p ASOF LEFT JOIN views v
         ON p.user_id = v.user_id AND v.ts >= p.ts
     )
SELECT b.event_id, b.user_id, b.ts, b.before_ts, f.after_ts,
       CASE WHEN b.before_ts IS NULL THEN f.after_ts
            WHEN f.after_ts IS NULL THEN b.before_ts
            WHEN epoch_us(b.ts) - epoch_us(b.before_ts)
                 <= epoch_us(f.after_ts) - epoch_us(b.ts) THEN b.before_ts
            ELSE f.after_ts END AS nearest_ts
FROM back b JOIN fwd f USING (event_id)
ORDER BY event_id
""",
    "events_json_extract": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
""",
    "events_pivot_daily_types": """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY 1 ORDER BY 1
""",
    "events_funnel_view_click_purchase": """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_after_click
""",
    "events_retention_cohorts": """
WITH first AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS active_day
  FROM events
)
SELECT cohort_day,
       datediff('day', CAST(cohort_day AS DATE), CAST(active_day AS DATE)) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN first USING (user_id)
GROUP BY cohort_day, day_offset
""",
}


def events_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact exponentially-decayed trending leaderboard (r12,
    operators/events.decayed_counts / decayed_leaderboard): per
    event_type, the top-3 users by the sum of per-event weights
    2^(event_day − oldest_day) — a per-day half-life decay kept in
    BIGINT (power-of-two weights are associative under any partial-sum
    order; float decay factors are not), ties to the lower user id. The
    in-plan 1-row day anchor is broadcast, the score is one grouped sum,
    the leaderboard one key-partitioned window. The oracle replays the
    identical integer weighting, so a wrong anchor, exponent direction,
    or tie rule diverges."""
    ev = tables.load(spark, sf_dir, "events")
    return E.decayed_leaderboard(ev, "event_type", "user_id", top_n=3)


_DECAYED_SQL = """
WITH d AS (
  SELECT event_type, user_id, date_trunc('day', ts) AS day FROM events
),
a AS (SELECT min(day) AS day0 FROM d),
s AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(1 AS BIGINT) << date_diff('day', day0, day)) AS BIGINT)
           AS decayed_score
  FROM d CROSS JOIN a GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY decayed_score DESC, user_id
  ) AS rank FROM s
)
SELECT event_type, CAST(rank AS INT) AS rank, user_id, decayed_score
FROM r WHERE rank <= 3
ORDER BY event_type, rank
"""

QUERIES["events_decayed_leaderboard"] = events_decayed_leaderboard
ORACLES["events_decayed_leaderboard"] = _DECAYED_SQL


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift monitor (r12, operators/events.cusum_drift):
    per event_type, daily counts against the key's floor-mean baseline,
    S_i = max(0, S_{i-1} + (x_i - ref)) computed via the prefix-sum /
    running-min closed form — two window functions, pure Catalyst, all
    BIGINT. Days flagged when 2*S > ref. The oracle replays the same
    closed form, so a wrong deviation, window frame, or floor rule
    diverges on some of the keys x days rows."""
    ev = tables.load(spark, sf_dir, "events")
    return E.cusum_drift(ev)


_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
ref AS (
  SELECT event_type, CAST(sum(x) // count(*) AS BIGINT) AS ref
  FROM daily GROUP BY 1
),
d AS (
  SELECT daily.*, ref, x - ref AS dev FROM daily JOIN ref USING (event_type)
),
p AS (
  SELECT *, sum(dev) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS pref FROM d
),
s AS (
  SELECT *, pref - least(CAST(0 AS BIGINT), min(pref) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )) AS cusum FROM p
)
SELECT event_type, day, x, ref, CAST(cusum AS BIGINT) AS cusum,
       (cusum * 2 > ref) AS flagged
FROM s ORDER BY event_type, day
"""

QUERIES["events_cusum_drift"] = events_cusum_drift
ORACLES["events_cusum_drift"] = _CUSUM_SQL


def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend (r12, operators/events.ols_trend_by_group):
    closed-form OLS of value (centi-units) against time (epoch minutes),
    slope reported in units/day with the fitted value at each group's
    first minute — the classic 'is this metric drifting' analytic beside
    the CUSUM and rolling-zscore rows. All sufficient statistics are
    exact wide integers (order-independent under partial aggregation —
    a float sum-of-products would be fold-order-dependent); only the
    final slope/intercept resolve to 9-digit-rounded doubles (the
    HUGEINT->DOUBLE double-rounding note in the operator docstring)."""
    ev = tables.load(spark, sf_dir, "events")
    return E.ols_trend_by_group(ev, "event_type", "ts", "value")


QUERIES["events_ols_trend"] = events_ols_trend
ORACLES["events_ols_trend"] = E.oracle_ols_trend_sql(
    "events", "event_type", "ts", "value"
)


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier audit per event_type (r12,
    operators/events.mad_outliers_by_group): |x - median| > 3*MAD on
    centi-unit integers with the whole decision rule in EXACT integer
    arithmetic (2x-scaled medians — interpolated medians of integers
    are integer-or-half, so 2*median is exact in both engines; no float
    touches the verdict). The robust-statistics member of the anomaly
    family beside rolling-zscore (moment-based) and CUSUM (sequential):
    a mean/stddev rule moves with the outliers it hunts, the median/MAD
    rule does not."""
    ev = tables.load(spark, sf_dir, "events")
    return E.mad_outliers_by_group(ev, "event_type", "value")


QUERIES["events_mad_outliers"] = events_mad_outliers
ORACLES["events_mad_outliers"] = E.oracle_mad_outliers_sql(
    "events", "event_type", "value"
)


def events_ab_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split A/B conversion analysis (r12,
    operators/events.ab_conversion_lift): users split into two arms by
    the deterministic md5 hash, conversion = purchase within 24 h
    strictly after the user's first view (microsecond-precision bound —
    the unbounded form converts 100% of the dense fixture's users and
    degenerates), relative lift of arm 1 over arm 0, and the EXACT 2x2
    chi-square through wide-integer lanes (every product exact; one
    9-digit-rounded division at the end) — the product-analytics
    classic over the funnel machinery, an honest null experiment on the
    fixture (the hash split is independent of behavior, so lift ~ 0 and
    chi2 small — both oracle-checked values, not vacuous assertions)."""
    ev = tables.load(spark, sf_dir, "events")
    return E.ab_conversion_lift(ev)


QUERIES["events_ab_conversion_lift"] = events_ab_conversion_lift
ORACLES["events_ab_conversion_lift"] = E.oracle_ab_conversion_sql("events")


def events_sessionize_capped_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capped-sessionize GroupState twin's driver-facing row (r14,
    VERDICT r13 #3 — streaming/stateful.streaming_sessionize_capped was
    pytest-only since r11): the events table split into three
    day-of-month terciles (1-10 / 11-20 / 21-31), drained as three
    SEQUENTIAL availableNow runs resuming from one checkpoint — run N
    writes file N and restarts the query, so the real applyInPandasWithState
    state store carries each user's open (start, prev, n) triple across
    micro-batch AND restart boundaries, and the stream's stated arrival
    contract (time-ordered per key across batches) holds BY CONSTRUCTION
    rather than by file-listing luck. Closed sessions collected per run
    (append mode emits a session the moment its successor arrives).

    Under the contract the drained closed sessions are exactly the
    batch operator's sessions minus each user's final still-open one
    (the stateful.py docstring claim, until now pinned only in pytest).
    stream_eq_batch computes that equality genuinely in-plan (empty
    symmetric difference vs events.sessionize_capped minus last-per-
    user); the oracle replays the identical split recurrence as the
    batch row's RECURSIVE CTE and drops each user's last session with
    QUALIFY. Scale: state per user is three BIGINTs; each drain run
    touches only that run's arrivals."""
    import glob as _glob
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from executor_u1mindexer_spark.streaming import stateful as ST

    ev = tables.load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    day = F.dayofmonth("ts")
    terciles = (day <= 10, (day > 10) & (day <= 20), day > 20)
    root = tempfile.mkdtemp(prefix="spark_graft_sess_backlog_")
    try:
        in_dir, out_dir = f"{root}/in", f"{root}/out"
        _os.makedirs(in_dir, exist_ok=True)
        for bid, cond in enumerate(terciles):
            stage = f"{root}/stage{bid}"
            ev.filter(cond).coalesce(1).write.parquet(stage)
            part = _glob.glob(f"{stage}/part-*.parquet")[0]
            shutil.move(part, f"{in_dir}/b{bid}.parquet")
            # durable file sink, NOT memory: the memory sink refuses to
            # recover from a checkpoint, and checkpoint recovery is the
            # point — the restart path is what carries state run-to-run
            q = (
                ST.streaming_sessionize_capped(
                    spark.readStream.schema(ev.schema).parquet(in_dir),
                    CAP_GAP_S,
                    CAP_DUR_S,
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", f"{root}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        closed = [
            (int(r.user_id), int(r.session_start_s), int(r.session_end_s), int(r.n_events))
            for r in spark.read.schema(ST.SESSION_OUT_SCHEMA)
            .parquet(out_dir)
            .collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    stream_df = spark.createDataFrame(
        sorted(closed),
        "user_id long, session_start_s long, session_end_s long, n_events long",
    )
    batch_minus_last = (
        E.sessionize_capped(ev, CAP_GAP_S, CAP_DUR_S)
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("session_start_s").desc())
            ),
        )
        .filter(F.col("__rk") > 1)
        .drop("__rk")
    )
    n_diff = (
        stream_df.subtract(batch_minus_last)
        .unionByName(batch_minus_last.subtract(stream_df))
        .agg(F.count(F.lit(1)).cast("long").alias("__nd"))
    )
    return (
        stream_df.crossJoin(F.broadcast(n_diff))
        .select(
            "user_id",
            "session_start_s",
            "session_end_s",
            "n_events",
            (F.col("__nd") == 0).alias("stream_eq_batch"),
        )
        .orderBy("user_id", "session_start_s")
    )


# the batch row's recursive-CTE replay, minus each user's final (still-
# open at drain) session; stream_eq_batch is computed genuinely on the
# Spark side — the oracle pins the contract that it must be TRUE
_SESS_BACKLOG_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), walk AS (
  SELECT user_id, rn, t, t AS sess_start FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.t,
         CASE WHEN e.t - w.t >= {CAP_GAP_S} OR e.t - w.sess_start > {CAP_DUR_S}
              THEN e.t ELSE w.sess_start END
  FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn + 1
), sess AS (
  SELECT user_id, sess_start AS session_start_s,
         CAST(max(t) AS BIGINT) AS session_end_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM walk GROUP BY user_id, sess_start
)
SELECT user_id, session_start_s, session_end_s, n_events,
       TRUE AS stream_eq_batch
FROM sess
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY session_start_s DESC) > 1
ORDER BY user_id, session_start_s
"""

QUERIES["events_sessionize_capped_backlog"] = events_sessionize_capped_backlog
ORACLES["events_sessionize_capped_backlog"] = _SESS_BACKLOG_SQL
