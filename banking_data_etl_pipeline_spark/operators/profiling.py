"""Single-pass column profiling: per-column null count, distinct
count, and min/max — the ``PROFILE table`` feature every analytics
engine ships, used before writing quality rules (operators/
expectations.py consumes exactly these kinds of bounds).

Shape: ONE aggregation pass computes every per-column statistic, then
a map-only ``stack`` unpivots the single result row into one row per
column. Two notes that matter at 100 TB:

- Multiple EXACT ``count(DISTINCT c)`` aggregates make Catalyst plan
  an Expand (the input is replicated once per distinct aggregate into
  the shuffle). That is the honest cost of exact distincts and is fine
  for a handful of columns; for wide tables use
  ``profile_table(..., exact_distinct=False)`` — HLL sketches
  (``approx_count_distinct``) profile any number of columns in one
  un-expanded pass at ~2% error. The exact form is the oracle-checked
  one (a sketch estimate cannot hash-match another engine).
- min/max are computed on the NATIVE column (so numeric/temporal
  ordering applies) and only then canonicalized to a cross-engine
  string form: longs as digits, doubles through DECIMAL(18,4) (fixed
  scale — both engines print "123.4500"), timestamps as epoch
  microseconds (UTC session; DuckDB ``epoch_us`` computes the same
  integer). Min-of-canonical would be a lexicographic min — wrong.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(dtype: T.DataType, col: Column) -> Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("string")
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.round(col, 4).cast("decimal(18,4)").cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame, cols: list[str], exact_distinct: bool = True
) -> DataFrame:
    """One row per profiled column:
    ``(column_name, n_nulls, n_distinct, min_value, max_value)``."""
    n_distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        dtype = df.schema[c].dataType
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nulls"),
            n_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"),
            _canon(dtype, F.min(c)).alias(f"{c}__min"),
            _canon(dtype, F.max(c)).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )
