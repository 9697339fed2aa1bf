"""Generic table profiling: per-column null counts, exact distinct
counts, and portable min/max representations for ANY DataFrame — the
engine-API form of the `table_profile_orders` declared query (Deequ/
dbt-test shape).

Physical design (the part that matters at 100 TB, measured 5× at sf0.1):
the distinct counts and the min/max/null counts run in SEPARATE 1-row
aggregations cross-joined at the end. Folded together, Catalyst's
multi-distinct Expand rewrite carries the string-buffered MIN/MAX
aggregates, and a string-typed aggregation buffer disqualifies
HashAggregate — the whole k×-expanded row set falls back to
SortAggregate. Split, the Expand branch is all-HashAggregate (count
buffers only) and the min/max branch is a trivial keyless pass. Exact
distincts are the dial to swap for approx_count_distinct at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, TimestampNTZType, TimestampType


def _repr_cast(col, dtype) -> F.Column:
    """Aggregate-then-cast to an engine-portable string: doubles through
    DECIMAL(18,2) (raw float stringification is engine-dependent),
    timestamps through DATE, everything else a plain string cast. The
    cast runs on the aggregated RESULT — min/max themselves use the
    native type, because lexicographic string extremes would be wrong
    for numerics ('9999' > '60000')."""
    if isinstance(dtype, (DoubleType, FloatType)):
        return col.cast("decimal(18,2)").cast("string")
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return col.cast("date").cast("string")
    return col.cast("string")


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: (column_name, n_nulls, n_distinct,
    min_repr, max_repr)."""
    cols = cols or df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    mm_aggs, nd_aggs = [], []
    for c in cols:
        mm_aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            _repr_cast(F.min(c), dtypes[c]).alias(f"{c}__min"),
            _repr_cast(F.max(c), dtypes[c]).alias(f"{c}__max"),
        ]
        nd_aggs.append(F.countDistinct(c).alias(f"{c}__nd"))
    one = df.agg(*mm_aggs).crossJoin(df.agg(*nd_aggs))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_repr"),
                F.col(f"{c}__max").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select(
        "p.column_name", "p.n_nulls", "p.n_distinct", "p.min_repr", "p.max_repr"
    )
