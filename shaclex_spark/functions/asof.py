"""Distributed as-of join (point-in-time join).

Spark has no native ASOF JOIN (DuckDB/kdb/Pandas ``merge_asof`` do);
the naive encoding — an inequality theta-join ``l.key = r.key AND
l.ts >= r.ts`` plus a max-ts dedup — explodes to |matches| rows per
left row before the dedup and shows up as a BroadcastNestedLoop or a
range join at scale.

This implements the scalable classic instead: UNION the two inputs
with a side tag, ONE hash shuffle on the key, one per-key window sort
by (ts, tag), and a running ``last(..., ignorenulls)`` that carries
the most recent right-side row forward onto every later left row.
Cost: one shuffle + one sort per input row, independent of match
fan-out — the plan a 100-TB point-in-time feature join needs. Skewed
keys are ordinary window skew (AQE/salting applies); there is no
range-join blow-up by construction.

Semantics (matches DuckDB ``ASOF LEFT JOIN`` with ``l.ts >= r.ts``):
each left row is paired with the right row having the greatest
``right_ts <= left_ts`` for the same key; ties on equal ts match
(right sorts before left at the same instant). The right side is
deduplicated to one row per (key, ts) — greatest tiebreak column wins
— so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_cols: list[str], tiebreak: str | None = None,
              ) -> DataFrame:
    """All ``left`` columns + ``right_cols`` (NULL when no right row
    at or before the left timestamp exists for that key).

    right_cols must not collide with left column names; ``tiebreak``
    (default: first of right_cols) orders equal-(key, ts) right rows —
    the greatest value wins.
    """
    from pyspark.sql.types import StructField, StructType

    tiebreak = tiebreak or right_cols[0]
    # NULL join keys never match (DuckDB ASOF semantics): drop
    # NULL-key right rows so they can't pair with NULL-key left rows
    # inside the shared window partition; NULL-key/NULL-ts left rows
    # stay and simply carry no right row.
    # One row per (key, ts): greatest tiebreak — keeps the window's
    # carried value deterministic.
    r = (right
         .filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
         .withColumn("__rn", F.row_number().over(
             Window.partitionBy(key, right_ts)
             .orderBy(F.col(tiebreak).desc())))
         .filter(F.col("__rn") == 1).drop("__rn"))

    # the matched right row travels as ONE struct so the carried value
    # is row-atomic: a NULL in one field of the matched row stays NULL
    # instead of inheriting that field from an older right row (which
    # per-column last(ignorenulls) would do, fabricating a composite
    # row that never existed)
    r_struct_t = StructType(
        [StructField(c, r.schema[c].dataType, True) for c in right_cols])
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    r_tagged = r.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    # tag 0 (right) sorts before tag 1 (left) at equal ts → inclusive
    # (left_ts >= right_ts) semantics
    w = (Window.partitionBy("__k").orderBy("__ts", "__tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__c"))
    return (carried.filter(F.col("__tag") == 1)
            .select(*[F.col(c) for c in lcols],
                    *[F.col(f"__c.{c}").alias(c) for c in right_cols]))
