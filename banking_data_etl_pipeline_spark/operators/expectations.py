"""Declarative data-quality checks (the Deequ/dbt-tests pattern):
constraints compile to aggregate EXPRESSIONS evaluated in ONE pass
over the table — at 100 TB you cannot afford a scan per rule, so every
row-level rule rides the same aggregation; only referential integrity
needs its own (anti-join) pass, keyed and co-partitionable.

Output contract: one row per rule, ``(rule, violations)`` — zero means
the expectation holds; a pipeline gate thresholds on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.sum(F.col(col).isNull().cast("long"))


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        F.sum(((c < lo) | (c > hi)).cast("long")),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    return (
        f"accepted_values({col})",
        F.sum((~F.col(col).isin(values)).cast("long")),
    )


def unique(col: str) -> tuple[str, Column]:
    """Violations = surplus rows beyond one per distinct value."""
    return f"unique({col})", F.count(F.col(col)) - F.count_distinct(F.col(col))


def run_checks(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    ref_integrity: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Evaluate all row-level ``rules`` in one aggregation pass, plus
    one anti-join per ``(child_col, parent_df, parent_col)`` entry
    counting orphaned child rows. Returns (rule, violations)."""
    agg_row = df.agg(
        *[expr.cast("long").alias(f"_r{i}") for i, (_n, expr) in enumerate(rules)]
    )
    out = agg_row.unpivot(
        ids=[],
        values=[f"_r{i}" for i in range(len(rules))],
        variableColumnName="_slot",
        valueColumnName="violations",
    )
    name_map = F.create_map(
        *[
            x
            for i, (n, _e) in enumerate(rules)
            for x in (F.lit(f"_r{i}"), F.lit(n))
        ]
    )
    checked = out.select(
        name_map[F.col("_slot")].alias("rule"), F.col("violations")
    )
    for child_col, parent, parent_col in ref_integrity:
        orphans = (
            df.select(F.col(child_col)).filter(F.col(child_col).isNotNull())
            .join(
                parent.select(F.col(parent_col).alias(child_col)),
                child_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(
                F.lit(f"ref_integrity({child_col}->{parent_col})").alias("rule"),
                "violations",
            )
        )
        checked = checked.unionByName(orphans)
    return checked
