"""Pure Column-expression builders for every derived field of the bank
pipeline (reference ops 9-16, SURVEY.md §2).

Each function takes input Columns and returns a Column — no DataFrame
coupling, no UDFs, everything constant-foldable by Catalyst and fully
expressible as ANSI SQL (the DuckDB-oracle twins live in
``__spark_entry__.oracle_sql``).

Reference quirks replicated deliberately (do NOT "fix"):
- RFM threshold maps end in an ``inf -> 1`` tail, so the *best*
  customers (balance > 50000, pdays > 180, previous > 10) score 1
  (reference ``batch_pipeline1.py:24-45,255-259``).
- ``contact_day_type`` applies ``day % 7 in (0, 6)`` to a day-of-*month*
  (``:191``) — not a real weekday computation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Threshold maps, reference batch_pipeline1.py:24-45. Each is a list of
# (upper_bound_inclusive, score); the final None bound is the inf tail.
RECENCY_MAP: list[tuple[float | None, int]] = [
    (-1, 1), (7, 5), (30, 4), (90, 3), (180, 2), (None, 1),
]
FREQUENCY_MAP: list[tuple[float | None, int]] = [
    (3, 2), (5, 3), (7, 4), (10, 5), (None, 1),
]
MONETARY_MAP: list[tuple[float | None, int]] = [
    (5000, 2), (10000, 3), (25000, 4), (50000, 5), (None, 1),
]


def age_group(age: Column) -> Column:
    """reference batch_pipeline1.py:176-180."""
    return (
        F.when(age < 30, "young")
        .when(age < 50, "middle_aged")
        .otherwise("senior")
    )


def wealth_segment(balance: Column) -> Column:
    """reference batch_pipeline1.py:183-188 (thresholds :22-23)."""
    return (
        F.when(balance > 50000, "high_net_worth")
        .when(balance > 10000, "mass_affluent")
        .otherwise("mass_market")
    )


def contact_day_type(day: Column) -> Column:
    """reference batch_pipeline1.py:191 — day-of-month modulo quirk."""
    return F.when((day % 7).isin(0, 6), "weekend").otherwise("weekday")


def has_loans(housing: Column, loan: Column) -> Column:
    """reference batch_pipeline1.py:194."""
    return (housing == "yes") | (loan == "yes")


def engagement_score(
    previous: Column, campaign: Column, duration: Column, y: Column
) -> Column:
    """Mean of four clamped factors, reference batch_pipeline1.py:196-203.

    All arithmetic in double, same association order as the reference so
    IEEE-754 results are bit-identical to the SQL oracle.
    """
    prev_f = F.least(previous, F.lit(10)) / F.lit(10.0)
    camp_f = F.least(campaign, F.lit(10)) / F.lit(10.0)
    dur_f = F.least(duration, F.lit(1000)) / F.lit(1000.0)
    y_f = F.when(y == "yes", F.lit(1.0)).otherwise(F.lit(0.0))
    return (prev_f + camp_f + dur_f + y_f) / F.lit(4.0)


def _threshold_score(value: Column, mapping: list[tuple[float | None, int]]) -> Column:
    """``_calculate_score`` (reference batch_pipeline1.py:255-259) as a
    CASE chain: thresholds ascending, first ``value <= bound`` wins,
    the None (inf) tail is the ``otherwise``.
    """
    expr: Column | None = None
    for bound, score in mapping:
        if bound is None:
            assert expr is not None
            return expr.otherwise(F.lit(score))
        cond = value <= F.lit(bound)
        expr = F.when(cond, F.lit(score)) if expr is None else expr.when(cond, F.lit(score))
    raise AssertionError("mapping must end with a None (inf) tail")


def recency_score(pdays: Column) -> Column:
    return _threshold_score(pdays, RECENCY_MAP)


def frequency_score(previous: Column) -> Column:
    return _threshold_score(previous, FREQUENCY_MAP)


def monetary_score(balance: Column) -> Column:
    return _threshold_score(balance, MONETARY_MAP)


def rfm_json(recency: Column, frequency: Column, monetary: Column) -> Column:
    """``rfm_scores`` JSON string, reference batch_pipeline1.py:232-237.

    ``to_json(struct(...))`` yields compact ``{"recency":R,...}`` with
    key order = struct field order, matching both the reference's
    ``json.dumps`` key order and DuckDB's ``to_json(struct_pack(...))``.
    """
    return F.to_json(
        F.struct(
            recency.alias("recency"),
            frequency.alias("frequency"),
            monetary.alias("monetary"),
        )
    )


def customer_segment(recency: Column, frequency: Column, monetary: Column) -> Column:
    """Tier from avg(r,f,m), reference batch_pipeline1.py:239-241,261-269."""
    avg = (recency + frequency + monetary) / F.lit(3.0)
    return (
        F.when(avg >= 4, "premium")
        .when(avg >= 3, "high_value")
        .when(avg >= 2, "medium_value")
        .otherwise("low_value")
    )
