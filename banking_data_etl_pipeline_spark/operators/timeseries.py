"""Time-series & behavioral analytics over the events feed: gap-filled
resampling with forward fill, funnel analysis, cohort retention.

Parity rules: all calendar math is integer arithmetic on epoch
micros/seconds (``unix_micros(ts) DIV ...``) — never engine date
functions, whose timezone/week conventions differ; all value sums go
through DECIMAL. Windows partition by user/cohort keys, so every
operator here parallelizes by key at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3_600 * 1_000_000
DAY_S = 86_400


def resample_ffill(events: DataFrame) -> DataFrame:
    """Per-user hourly resample with forward fill: aggregate to hourly
    means, generate the complete hour spine from each user's first to
    last hour (gap rows included), and carry the last observed value
    forward into gaps.

    Scale shape: the hourly pre-aggregation shrinks the feed first
    (map-side combine); the spine is a per-user ``sequence`` explode —
    map-only row generation sized by that user's time span, no
    driver-side calendar; the forward fill is one ``last(ignorenulls)``
    running window per user. One shuffle on user_id end-to-end (the
    window reuses the aggregation's partitioning)."""
    hourly = (
        events.withColumn("hour_epoch", F.expr(f"unix_micros(ts) DIV {HOUR_US}"))
        .groupBy("user_id", "hour_epoch")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour_epoch").alias("h0"), F.max("hour_epoch").alias("h1")
    )
    spine = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour_epoch")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour_epoch"], "left")
        .select(
            "user_id",
            "hour_epoch",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


def funnel(events: DataFrame, stages: tuple[str, ...] = ("view", "click", "purchase")) -> DataFrame:
    """Ordered funnel: per user, the earliest time each stage was
    reached STRICTLY AFTER the previous stage, plus the depth reached.

    Scale shape: one conditional aggregation per stage over the same
    user partitioning — stage k's threshold comes from a self-join-free
    chain of ``min(CASE WHEN ...)`` aggregates computed iteratively on
    the per-user event set; concretely each stage is a groupBy over the
    (already user-partitioned) events, then a user-key equi-join of the
    small per-user stage table back — joins on user_id reuse one
    partitioning, no skew (per-user rows are bounded)."""
    cur = events.filter(F.col("event_type") == stages[0]).groupBy("user_id").agg(
        F.expr("unix_micros(min(ts)) DIV 1000000").alias("t_stage1")
    )
    out = cur
    for i, stage in enumerate(stages[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == stage)
            .withColumn("t", F.expr("unix_micros(ts) DIV 1000000"))
            .join(out.select("user_id", F.col(f"t_stage{i-1}").alias("_prev")), "user_id")
            .filter(F.col("t") > F.col("_prev"))
            .groupBy("user_id")
            .agg(F.min("t").alias(f"t_stage{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    depth = F.lit(1)
    for i in range(2, len(stages) + 1):
        depth = F.when(F.col(f"t_stage{i}").isNotNull(), F.lit(i)).otherwise(depth)
    # depth is well-defined because t_stage{i} exists only if t_stage{i-1} did
    return out.select(
        "user_id",
        *[F.col(f"t_stage{i}") for i in range(1, len(stages) + 1)],
        depth.cast("int").alias("funnel_depth"),
    )


def cohort_retention(events: DataFrame, weeks: int = 8) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, and
    for each week offset since, how many of them were active.

    All-integer calendar math (epoch days / 7) — identical in any
    engine and timezone. Two shuffles: first-seen per user, then the
    (cohort_week, week_offset) distinct-user count."""
    # literal precomputed in Python: 86400 * 1000000 as an inline INT *
    # INT product overflows under ANSI mode
    day_us = DAY_S * 1_000_000
    days = events.select(
        "user_id", F.expr(f"unix_micros(ts) DIV {day_us}").alias("day")
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        days.join(first, "user_id")
        .select(
            "user_id",
            F.expr("first_day DIV 7").alias("cohort_week"),
            F.expr("(day - first_day) DIV 7").alias("week_offset"),
        )
        .filter(F.col("week_offset") < weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def half_life_decayed_totals(
    events: DataFrame,
    origin: str = "2024-03-01",
    half_life_days: int = 7,
) -> DataFrame:
    """Recency-weighted per-user value: each event contributes
    ``value / 2^k`` where ``k`` = whole half-lives between the event
    and ``origin`` — the standard exponential-decay feature for
    engagement/recency scoring, but with the decay quantized to whole
    half-lives so it is ENGINE-PORTABLE: 2^k is exactly representable
    and ``exp()``'s libm rounding differences never enter. Per-row
    contributions are truncated to 12 dp (tie-free) and summed through
    DECIMAL, same parity scheme as PageRank.

    Map-only until the final per-user aggregation — one shuffle, keyed
    on the uniform user id."""
    k = F.least(
        F.greatest(
            F.expr(f"datediff(DATE'{origin}', CAST(ts AS DATE)) div {half_life_days}"),
            F.lit(0),
        ),
        F.lit(50),
    )
    decayed = F.col("value") / F.pow(F.lit(2.0), k)
    c = F.floor(decayed * F.lit(1e12)).cast("double") / F.lit(1e12)
    return (
        events.select(F.col("user_id"), c.alias("c"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("c").cast("decimal(32,12)")).cast("double"), 6
            ).alias("decayed_value")
        )
    )


def ewma_anomaly(
    events: DataFrame,
    window: int = 16,
    min_hist: int = 4,
    top: int = 100,
) -> DataFrame:
    """Per-user EWMA anomaly scoring: predict each event's value from
    an exponentially-weighted (half-life) average of its previous
    ``window`` values, and surface the ``top`` largest absolute
    deviations — the batch twin of a streaming z-score monitor.

    Float parity (the reason for the shape): the decay is 1/2 so every
    weight is an EXACT power of two — ``v / CAST(shiftleft(1, j) AS
    DOUBLE)`` — and the weight sum is exact (16 distinct mantissa
    bits), sidestepping ``pow()``, whose last-ulp behaviour differs
    between JVM and C libm. Numerator folds strictly left-to-right
    over the newest-first frame list (the vectors.dot convention), so
    both engines produce bit-identical predictions.

    Scale shape: ONE window partitioned by user (parallel by key, no
    global exchange); the frame list is bounded at ``window`` elements
    so per-row state is O(window); the top-n is a TakeOrdered on the
    rounded deviation (deterministic event_id tie-break).

    Returns (event_id, user_id, value, pred, abs_dev), abs_dev desc,
    event_id asc, limit ``top``; pred/abs_dev 6-dp."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-window, -1)
    )
    rv = F.reverse(F.collect_list(F.col("value").cast("double")).over(w))
    # null values are excluded up front (Spark's collect_list silently
    # drops them while DuckDB's list() keeps them — filtering first
    # keeps the frame semantics identical in both engines)
    events = events.filter(F.col("value").isNotNull())
    staged = events.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("value"),
        rv.alias("_rv"),
    ).filter(F.size("_rv") >= min_hist)
    num = F.expr(
        "aggregate(zip_with(_rv, sequence(1, size(_rv)),"
        " (v, j) -> v / CAST(shiftleft(1, j) AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    den = F.expr(
        "aggregate(transform(sequence(1, size(_rv)),"
        " j -> 1.0D / CAST(shiftleft(1, j) AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    scored = staged.select(
        "event_id",
        "user_id",
        "value",
        F.round(num / den, 6).alias("pred"),
        F.round(F.abs(F.col("value") - num / den), 6).alias("abs_dev"),
    )
    return scored.orderBy(F.desc("abs_dev"), F.asc("event_id")).limit(top)


def mase_eval(events: DataFrame, season_hours: int = 24) -> DataFrame:
    """Seasonal-naive forecast error (MASE, Hyndman & Koehler 2006)
    per event type over the hourly value series — the standard
    scale-free answer to "is this feed's latest behaviour predictable
    from the same hour yesterday, or drifting": MASE < 1 means the
    seasonal-naive forecast beats the one-step-naive in-sample error,
    > 1 flags structure the daily cycle does not explain.

    Construction handles GAPS honestly: forecasts come from equi-joins
    on (type, hour − season) and (type, hour − 1h) against the hourly
    aggregate itself — not window ``lag``, which silently reads the
    previous EXISTING row and scores the wrong horizon when hours are
    missing. Only hours whose reference hour exists score in the
    respective mean.

    Scale shape: one groupBy to hourly totals (map-side combined),
    then two self-equi-joins and a per-type reduce — everything after
    the first aggregation is hours × types sized. Exactness: hourly
    totals and the |error| sums ride DECIMAL(18,6)/(38,6) (exact,
    order-free); the two means and their ratio are formed in ONE
    double expression both engines share; 6-dp rounding at the end.

    Returns (event_type, n_seasonal, n_naive, mae_seasonal,
    mae_naive1, mase); mase NULL when the naive-1 error is zero."""
    hourly = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("y")
        )
    )
    a = hourly.alias("a")

    def _err(offset_hours: int, tag: str) -> DataFrame:
        b = hourly.alias(f"b{tag}")
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col(f"b{tag}.event_type"))
                & (
                    F.col("a.h")
                    == F.col(f"b{tag}.h")
                    + F.expr(f"INTERVAL {offset_hours} HOURS")
                ),
            )
            .select(
                F.col("a.event_type").alias("event_type"),
                F.abs(
                    F.col("a.y") - F.col(f"b{tag}.y")
                ).alias("ae"),
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(f"n_{tag}"),
                F.sum(F.col("ae").cast("decimal(38,6)")).alias(
                    f"s_{tag}"
                ),
            )
        )
    seas = _err(season_hours, "seasonal")
    nai = _err(1, "naive")
    mae_s = F.col("s_seasonal").cast("double") / F.col(
        "n_seasonal"
    ).cast("double")
    mae_n = F.col("s_naive").cast("double") / F.col("n_naive").cast(
        "double"
    )
    return seas.join(nai, "event_type").select(
        "event_type",
        "n_seasonal",
        "n_naive",
        F.round(mae_s, 6).alias("mae_seasonal"),
        F.round(mae_n, 6).alias("mae_naive1"),
        F.when(
            F.col("s_naive") > 0, F.round(mae_s / mae_n, 6)
        ).alias("mase"),
    )


def mann_kendall(events: DataFrame) -> DataFrame:
    """Mann–Kendall trend test per event type over the daily
    event-count series — the standard nonparametric "is this feed
    growing, shrinking, or flat" monitor (no distributional
    assumptions, robust to outliers), with the tie-corrected variance
    of Kendall (1975).

    S = sum over day pairs i<j of sign(c_j − c_i);
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 over tied count
    groups; Z applies the standard ±1 continuity correction.

    Scale shape: the feed first collapses to (type, day) integer
    counts — map-side combined, so the pair stage is sized by
    types × days², which grows with CALENDAR TIME, not data volume
    (100 TB of the same 30 days is the same pair count). The pair
    stage is a per-type self-equi-join on the aggregate; everything
    is exact integer arithmetic until the single Z division.

    Returns (event_type, n_days, s_stat, var_s, z_stat) with z at
    6 dp (NULL when the variance is zero — a constant series)."""
    day_us = DAY_S * 1_000_000
    daily = (
        events.select(
            "event_type", F.expr(f"unix_micros(ts) DIV {day_us}").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nrow = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie_term")
        )
    )
    n = F.col("n_days")
    var_num = n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    var_s = var_num.cast("double") / F.lit(18.0)
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s)) \
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s)) \
        .otherwise(F.lit(0.0))
    return (
        nrow.join(ties, "event_type")
        .join(s, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            F.round(var_s, 6).alias("var_s"),
            F.when(var_num > 0, F.round(z, 6)).alias("z_stat"),
        )
    )


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM changepoint localization per event type over daily
    counts: the day t maximizing |Σ_{i≤t}(c_i − mean)| — the classic
    single-shift estimator (Page 1954 / Taylor's cumulative-sum
    bootstrap, point-estimate half).

    Exactness: the cumulative deviation is rescaled by n so it stays
    INTEGER — C_scaled(t) = n·cum(t) − t·total (equal to n·Σ(c_i−x̄),
    same argmax) — so the argmax and tie-break (earliest day) are
    exact in both engines; only the reported normalized magnitude
    |C|/(n·total) divides doubles, once.

    Scale shape: one map-side-combined groupBy to daily counts, one
    per-type window cumsum, one per-type argmax — the pair-free
    sibling of mann_kendall. Returns (event_type, n_days, total,
    change_day, cusum_abs, cusum_norm)."""
    day_us = DAY_S * 1_000_000
    daily = (
        events.select(
            "event_type", F.expr(f"unix_micros(ts) DIV {day_us}").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    staged = daily.select(
        "event_type",
        "day",
        F.sum("c").over(wcum).alias("cum"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("day")
        ).cast("bigint").alias("t"),
        F.sum("c").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_days"),
    ).select(
        "event_type",
        "day",
        "n_days",
        "total",
        (F.col("n_days") * F.col("cum") - F.col("t") * F.col("total"))
        .alias("c_scaled"),
    )
    pick = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.abs(F.col("c_scaled")).desc(), F.col("day").asc()
        )
    )
    return (
        staged.withColumn("rk", pick)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n_days",
            "total",
            F.col("day").alias("change_day"),
            F.abs(F.col("c_scaled")).cast("bigint").alias("cusum_abs"),
            F.round(
                F.abs(F.col("c_scaled")).cast("double")
                / (F.col("n_days") * F.col("total")).cast("double"),
                6,
            ).alias("cusum_norm"),
        )
    )


def survival_km(events: DataFrame, horizon_days: int = 7) -> DataFrame:
    """Kaplan–Meier 7-day signup→purchase conversion curve (product-
    limit estimator, Kaplan & Meier 1958): subjects are users with a
    signup event, the event is their first purchase STRICTLY AFTER
    that signup, and follow-up is administratively right-censored at
    min(``horizon_days``, end-of-data − signup) — the honest "what
    fraction has NOT yet converted by day t" curve under bounded
    observation.

    Conventions (documented because engines must agree exactly):
    durations are whole days (``DIV`` on epoch micros); an event
    counts as observed only when its duration is strictly inside the
    follow-up cap, else the subject is censored AT the cap; subjects
    censored at t remain at risk for deaths at t (censor-after-death,
    the textbook tie rule).

    Float parity: d_t and n_t are integers; each factor (1 − d/n) is
    one double division; the survival curve is a LEFT FOLD of the
    ordered factor prefix (Spark ``aggregate`` over a sorted array ==
    DuckDB ``list_reduce`` over ``list(... ORDER BY ...)``), so both
    engines run the identical IEEE multiply sequence — no exp/ln.

    Scale shape: per-user reductions (first signup, first qualifying
    purchase, both map-side combined on the user key), then the curve
    lives on ≤ horizon_days+1 rows — the fold is driver-free and the
    one single-row array is model-parameter-sized, never data-sized.

    Returns (t_day, n_risk, d_events, survival) at each observed
    event time."""
    day_us = DAY_S * 1_000_000
    t_us = F.expr("unix_micros(ts)")
    signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(t_us).alias("t0"))
    )
    # the three single-row reductions below (study end, subject
    # total, the one-row sorted factor array) enter as uncorrelated
    # scalar subqueries — no 1-row crossJoins/NLJs (r12 verdict item 7)
    study_end = events.agg(F.max(t_us).alias("t_end")).scalar()
    death = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", t_us.alias("tp"))
        .join(signup, "user_id")
        .filter(F.col("tp") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tp").alias("td"), F.min("t0").alias("t0"))
    )
    subjects = (
        signup.join(death.select("user_id", "td"), "user_id", "left")
        .withColumn("t_end", study_end)
        .select(
            "user_id",
            F.least(
                F.lit(horizon_days).cast("bigint"),
                F.expr(f"(t_end - t0) DIV {day_us}").cast("bigint"),
            ).alias("cap"),
            F.when(
                F.col("td").isNotNull(),
                F.expr(f"(td - t0) DIV {day_us}").cast("bigint"),
            ).alias("dur_raw"),
        )
        .select(
            "user_id",
            F.when(
                F.col("dur_raw").isNotNull()
                & (F.col("dur_raw") < F.col("cap")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("observed"),
            F.when(
                F.col("dur_raw").isNotNull()
                & (F.col("dur_raw") < F.col("cap")),
                F.col("dur_raw"),
            )
            .otherwise(F.col("cap"))
            .alias("dur"),
        )
    )
    n_subjects = subjects.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all")
    ).scalar()
    at_dur = subjects.groupBy("dur").agg(
        F.sum("observed").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leave"),
    )
    wprior = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    rows = (
        at_dur.withColumn("n_all", n_subjects)
        .select(
            "dur",
            "d",
            (F.col("n_all")
             - F.coalesce(F.sum("leave").over(wprior), F.lit(0)))
            .cast("bigint")
            .alias("n_risk"),
        )
        .filter(F.col("d") > 0)
    )
    factors = rows.select(
        "dur",
        "d",
        "n_risk",
        (
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ).alias("factor"),
    )
    curve = factors.groupBy().agg(
        F.sort_array(
            F.collect_list(F.struct("dur", "n_risk", "d", "factor"))
        ).alias("arr")
    )
    step = curve.select(
        F.posexplode("arr").alias("i", "row")
    ).select(
        F.col("row.dur").alias("t_day"),
        F.col("row.n_risk").alias("n_risk"),
        F.col("row.d").alias("d_events"),
        F.col("i").alias("i"),
        F.col("row.factor").alias("factor"),
    )
    surv = step.drop("factor").withColumn("arr", curve.scalar()).select(
        "t_day",
        "n_risk",
        "d_events",
        F.round(
            F.expr(
                "aggregate(slice(arr, 1, i + 1), CAST(1.0 AS DOUBLE),"
                " (acc, x) -> acc * x.factor)"
            ),
            6,
        ).alias("survival"),
    )
    return surv



# Integer-micro staging shared by acf_lags / seasonality_strength (and
# their DuckDB twins verbatim): the hourly DECIMAL(18,6) total is
# rescaled to an exact BIGINT of micro-units, so every downstream
# moment (sums, products of sums) is integer/DECIMAL(38,0) arithmetic —
# no decimal×decimal scale negotiation, which Spark (truncate to 6 dp
# under the precision cap) and DuckDB (keep 12 dp) resolve DIFFERENTLY.
# The 1e6 unit factor cancels in every reported ratio. Headroom note:
# products of sums live near 1e26-1e32 here; at corpus magnitudes that
# push Σ(yi)² past 1e38, drop the unit to 1e3 (same cancellation).
YI = "CAST(CAST(y AS DECIMAL(18,6)) * 1000000 AS BIGINT)"


def acf_lags(
    events: DataFrame, lags: tuple[int, ...] = (1, 24)
) -> DataFrame:
    """Sample autocorrelation of the hourly value series per event
    type at the given lags — lag 1 answers "is the feed sticky hour
    to hour", lag 24 "is the daily cycle real" (the numeric companion
    to mase_eval's forecast-error framing).

    GAP-HONEST like mase_eval: each lag's sample is the equi-join of
    the hourly aggregate with itself at h = h' + L — never window
    ``lag``, which pairs the wrong horizon across missing hours. The
    correlation is Pearson over the PAIRED sample (both means from
    the joined rows, the standard ACF-with-gaps estimator).

    Exactness: hourly totals become exact BIGINT micro-units (``YI``);
    the five moments (Σa, Σb, Σab, Σa², Σb²) are exact DECIMAL(38,0)
    integers in any aggregation order; r is formed from them in ONE
    shared double expression (the unit factor cancels), 6 dp. Scale
    shape: one map-side-combined groupBy to hours × types, then
    per-lag self-equi-joins on that aggregate — everything after the
    first reduction is calendar-sized.

    Returns (event_type, lag, n_pairs, acf); acf NULL when either
    side is constant (zero variance)."""
    hourly = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("y"))
        .select("event_type", "h", F.expr(YI).alias("yi"))
    )
    outs = []
    a = hourly.alias("a")
    for lag in lags:
        b = hourly.alias(f"b{lag}")
        paired = a.join(
            b,
            (F.col("a.event_type") == F.col(f"b{lag}.event_type"))
            & (
                F.col("a.h")
                == F.col(f"b{lag}.h") + F.expr(f"INTERVAL {lag} HOURS")
            ),
        ).select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.yi").alias("ai"),
            F.col(f"b{lag}.yi").alias("bi"),
        )
        m = paired.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("ai").cast("decimal(38,0)")).alias("sa"),
            F.sum(F.col("bi").cast("decimal(38,0)")).alias("sb"),
            F.sum(
                F.col("ai").cast("decimal(19,0)") * F.col("bi")
            ).alias("sab"),
            F.sum(
                F.col("ai").cast("decimal(19,0)") * F.col("ai")
            ).alias("saa"),
            F.sum(
                F.col("bi").cast("decimal(19,0)") * F.col("bi")
            ).alias("sbb"),
        )
        nd = F.col("n_pairs").cast("decimal(38,0)")
        num = nd * F.col("sab") - F.col("sa") * F.col("sb")
        da = nd * F.col("saa") - F.col("sa") * F.col("sa")
        db = nd * F.col("sbb") - F.col("sb") * F.col("sb")
        outs.append(
            m.select(
                "event_type",
                F.lit(lag).cast("int").alias("lag"),
                "n_pairs",
                F.when(
                    (da > 0) & (db > 0),
                    F.round(
                        num.cast("double")
                        / F.sqrt(da.cast("double") * db.cast("double")),
                        6,
                    ),
                ).alias("acf"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def seasonality_strength(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonality strength per event type: the one-way
    ANOVA R² of "hourly total = its hour-of-day mean + residual" —
    the STL-style "how much of this feed is explained by the daily
    cycle" number (≈0 no cycle, →1 pure cycle), from sufficient
    statistics only:

        strength = (n·Σ_h S_h²/n_h − S²) / (n·Σy² − S²)

    (both sides multiplied through by n, so the only non-integer step
    is the per-hour-of-day S_h²/n_h term).

    Exactness: hourly totals become exact BIGINT micro-units (``YI``);
    S_h, n_h, S, Σy² are exact DECIMAL(38,0) moments; each of the ≤24
    per-hod terms is one shared double expression routed through
    DECIMAL(38,6) before the cross-hod sum (order-free, the CHI2_SUM
    pattern); the final ratio is one double expression at 6 dp.

    Scale: one groupBy to (type, hour), one to (type, hour-of-day),
    one per-type reduce — calendar-sized after the first reduction.
    Returns (event_type, n_hours, strength); NULL for a constant
    series."""
    hourly = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("y"))
        .select(
            "event_type",
            F.expr(YI).alias("yi"),
            F.expr(f"(unix_micros(h) DIV {HOUR_US}) % 24").alias("hod"),
        )
    )
    by_hod = hourly.groupBy("event_type", "hod").agg(
        F.sum(F.col("yi").cast("decimal(38,0)")).alias("s_h"),
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
    )
    seas = by_hod.groupBy("event_type").agg(
        F.sum(
            (
                F.col("s_h").cast("double")
                * F.col("s_h").cast("double")
                / F.col("n_h").cast("double")
            ).cast("decimal(38,6)")
        ).alias("seas_sum")
    )
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum(F.col("yi").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("yi").cast("decimal(19,0)") * F.col("yi")
        ).alias("syy"),
    )
    n = F.col("n_hours").cast("double")
    grand = F.col("s").cast("double") * F.col("s").cast("double")
    ss_model = (
        n * F.col("seas_sum").cast("double") - grand
    )
    ss_total = n * F.col("syy").cast("double") - grand
    return tot.join(seas, "event_type").select(
        "event_type",
        "n_hours",
        F.when(ss_total > 0, F.round(ss_model / ss_total, 6)).alias(
            "strength"
        ),
    )


def theil_sen(events: DataFrame) -> DataFrame:
    """Theil–Sen slope per event type over the daily count series: the
    MEDIAN of all pairwise slopes (c_j − c_i)/(day_j − day_i) — the
    robust trend-magnitude companion to ``mann_kendall`` (MK answers
    "is there a trend", Sen answers "how steep", and the pair is the
    standard monotone-trend report; up to ~29% of days can be corrupt
    before the estimate moves).

    Exactness: each pairwise slope is ONE integer/integer double
    division (bit-identical cross-engine); the median is an ORDER
    STATISTIC, not a sum — rank lo = (n+1) DIV 2 and hi = n DIV 2 + 1
    over the deterministic order (slope, day_i, day_j), averaged
    (equal for odd n; a single two-value IEEE add for even n).

    Scale shape: identical to mann_kendall — the feed collapses to
    (type, day) integer counts first, so the pair stage is
    types × days², calendar-sized, not volume-sized.

    Returns (event_type, n_days, n_pairs, sen_slope) at 6 dp."""
    day_us = DAY_S * 1_000_000
    daily = (
        events.select(
            "event_type", F.expr(f"unix_micros(ts) DIV {day_us}").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("di"),
            F.col("b.day").alias("dj"),
            (
                (F.col("b.c") - F.col("a.c")).cast("double")
                / (F.col("b.day") - F.col("a.day")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("di").asc(), F.col("dj").asc()
    )
    wall = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_pairs"),
    )
    # integer rank bounds: lo = (n+1) DIV 2, hi = n DIV 2 + 1
    mid = ranked.filter(
        (F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        | (F.col("rn") == F.expr("n_pairs DIV 2 + 1"))
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    med = mid.groupBy("event_type", "n_pairs").agg(
        F.round(
            F.sum("slope") / F.count(F.lit(1)).cast("double"), 6
        ).alias("sen_slope")
    )
    return n_days.join(med, "event_type").select(
        "event_type", "n_days", "n_pairs", "sen_slope"
    )


def leadlag_ccf(
    events: DataFrame, lags: tuple[int, ...] = (0, 1, 2)
) -> DataFrame:
    """Lead-lag cross-correlation between EVENT-TYPE PAIRS on the
    hourly value series: for every ordered pair (a, b) and lag L,
    Pearson corr(a_t, b_{t−L}) — "does activity in b lead activity in
    a by L hours", the cross-series companion to ``acf_lags`` (its
    diagonal) and the standard first pass of causal-structure /
    leading-indicator mining over a metrics feed.

    Same machinery as acf_lags and shares its exactness contract:
    hourly totals rescale to exact BIGINT micro-units (``YI``), the
    five Pearson moments are exact DECIMAL(38,0)/HUGEINT integers, r
    is one shared double expression. GAP-HONEST equi-joins at
    h = h' + L; the pair stage is types² × calendar-sized, not
    volume-sized.

    Returns (type_a, type_b, lag, n_pairs, ccf); NULL ccf when either
    side is constant."""
    hourly = (
        events.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("y"))
        .select("event_type", "h", F.expr(YI).alias("yi"))
    )
    outs = []
    a = hourly.alias("a")
    for lag in lags:
        b = hourly.alias(f"b{lag}")
        paired = a.join(
            b,
            (F.col("a.event_type") != F.col(f"b{lag}.event_type"))
            & (
                F.col("a.h")
                == F.col(f"b{lag}.h") + F.expr(f"INTERVAL {lag} HOURS")
            ),
        ).select(
            F.col("a.event_type").alias("type_a"),
            F.col(f"b{lag}.event_type").alias("type_b"),
            F.col("a.yi").alias("ai"),
            F.col(f"b{lag}.yi").alias("bi"),
        )
        m = paired.groupBy("type_a", "type_b").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("ai").cast("decimal(38,0)")).alias("sa"),
            F.sum(F.col("bi").cast("decimal(38,0)")).alias("sb"),
            F.sum(
                F.col("ai").cast("decimal(19,0)") * F.col("bi")
            ).alias("sab"),
            F.sum(
                F.col("ai").cast("decimal(19,0)") * F.col("ai")
            ).alias("saa"),
            F.sum(
                F.col("bi").cast("decimal(19,0)") * F.col("bi")
            ).alias("sbb"),
        )
        nd = F.col("n_pairs").cast("decimal(38,0)")
        num = nd * F.col("sab") - F.col("sa") * F.col("sb")
        da = nd * F.col("saa") - F.col("sa") * F.col("sa")
        db = nd * F.col("sbb") - F.col("sb") * F.col("sb")
        outs.append(
            m.select(
                "type_a",
                "type_b",
                F.lit(lag).cast("int").alias("lag"),
                "n_pairs",
                F.when(
                    (da > 0) & (db > 0),
                    F.round(
                        num.cast("double")
                        / F.sqrt(
                            da.cast("double") * db.cast("double")
                        ),
                        6,
                    ),
                ).alias("ccf"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def kendall_tau(
    events: DataFrame, type_x: str = "purchase", type_y: str = "click"
) -> DataFrame:
    """Kendall's tau-b rank correlation between two event types' daily
    count series — the tie-robust companion to spearman_by_group
    (Kendall 1945 tau-b: ties corrected in BOTH margins), the standard
    "do these two feeds co-move" monitor.

    Over all day pairs i<j: concordant when (x_j−x_i)(y_j−y_i) > 0,
    discordant when < 0, and pairs tied in x (or y) shrink the
    respective margin; tau_b = (nc − nd) / √((n0 − tx)(n0 − ty)) with
    n0 = n(n−1)/2 (NULL when a margin is fully tied — the
    denominator vanishes and no correlation is defined; a bare
    division would ANSI-fail the whole job on a degenerate series,
    caught by the property suite). Everything is exact integer
    counting until the single terminal sqrt/division.

    Scale shape: identical to mann_kendall — the feed collapses to
    per-day integer counts first (map-side combined), so the pair
    self-join is sized by days², which grows with CALENDAR TIME, not
    data volume; the join is a broadcast of the daily aggregate.

    Returns one row (n_days, concordant, discordant, ties_x, ties_y,
    tau_b)."""
    day_us = DAY_S * 1_000_000
    daily = (
        events.filter(F.col("event_type").isin([type_x, type_y]))
        .select(
            F.expr(f"unix_micros(ts) DIV {day_us}").alias("day"),
            F.when(F.col("event_type") == type_x, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_x"),
        )
        .groupBy("day")
        .agg(
            F.sum("is_x").alias("x"),
            (F.count(F.lit(1)) - F.sum("is_x")).cast("bigint").alias("y"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    pairs = a.join(F.broadcast(b), F.col("a.day") < F.col("b.day")).select(
        (dx * dy > 0).cast("bigint").alias("conc"),
        (dx * dy < 0).cast("bigint").alias("disc"),
        (dx == 0).cast("bigint").alias("tx"),
        (dy == 0).cast("bigint").alias("ty"),
    )
    agg = pairs.agg(
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
        F.sum("tx").cast("bigint").alias("ties_x"),
        F.sum("ty").cast("bigint").alias("ties_y"),
        F.count(F.lit(1)).cast("bigint").alias("n0"),
    )
    # n_days enters as an uncorrelated scalar subquery (no 1-row
    # crossJoin/NLJ — r12 verdict item 7); the day-pair inequality
    # join above is the genuinely-irreducible NLJ here
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days")).scalar()
    return agg.select(
        nd.alias("n_days"),
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.nullif(
                F.sqrt(
                    (
                        (F.col("n0") - F.col("ties_x"))
                        * (F.col("n0") - F.col("ties_y"))
                    ).cast("double")
                ),
                F.lit(0.0),
            )
        ).alias("tau_b"),
    )


def holt_linear(events: DataFrame, horizon: int = 7) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing per event
    type over the daily count series, α = β = 1/2 — the level+trend
    upgrade of the single-EWMA monitor (Holt 1957), with the
    ``horizon``-day-ahead linear forecast l + h·b.

    Recursion (classic init l₂ = x₂, b₂ = x₂ − x₁, fold from x₃):
    l_t = 0.5·x_t + 0.5·(l + b); b_t = 0.5·(l_t − l) + 0.5·b. Halving
    is an exact mantissa shift, and the fold is a strict left-to-right
    ``F.aggregate`` over the day-sorted array, so the DuckDB twin's
    linear recursive CTE (same expressions, same order) produces
    bit-identical doubles — no pow(), whose last ulp differs between
    JVM and libm (the ewma_anomaly lesson).

    Scale shape: the feed collapses to (type, day) counts first
    (map-side combined); the per-type array is CALENDAR-sized, so the
    fold is O(days) per type — never data-volume-sized. Types with
    fewer than 2 days are dropped (no trend is defined).

    Returns (event_type, n_days, level, trend, forecast) — 6-dp,
    forecast = level + horizon·trend before rounding."""
    day_us = DAY_S * 1_000_000
    daily = (
        events.select(
            "event_type", F.expr(f"unix_micros(ts) DIV {day_us}").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "c"))), lambda s: s["c"]
        ).alias("xs")
    )
    xs = F.col("xs")
    n = F.size(xs)
    init = F.struct(
        xs[1].alias("l"), (xs[1] - xs[0]).alias("b")
    )

    def step(acc, x):
        l_new = F.lit(0.5) * x + F.lit(0.5) * (acc["l"] + acc["b"])
        return F.struct(
            l_new.alias("l"),
            (F.lit(0.5) * (l_new - acc["l"]) + F.lit(0.5) * acc["b"]).alias("b"),
        )

    fitted = series.filter(n >= 2).select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.aggregate(F.slice(xs, 3, n - 2), init, step).alias("st"),
    )
    h = F.lit(float(horizon))
    return fitted.select(
        "event_type",
        "n_days",
        (F.round(F.col("st.l"), 6) + F.lit(0.0)).alias("level"),
        (F.round(F.col("st.b"), 6) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("st.l") + h * F.col("st.b"), 6) + F.lit(0.0)).alias(
            "forecast"
        ),
    )
