"""Sequence packing for LLM training batches.

Greedy bin packing of documents into fixed token-capacity training
sequences. Exact first-fit-decreasing is inherently sequential (each
placement depends on every earlier one), so at scale it is sharded:
documents are ranked by (token count DESC, id) and dealt round-robin
into G independent groups, and NEXT-FIT runs inside each group over
its descending-length stream. Round-robin keeps every group's length
distribution identical, so per-group waste matches the global
next-fit-decreasing bound (<= 2x optimal; in practice ~15% slack at
capacity >> median length), while groups pack fully in parallel.

Spark mapping — every step distributed, no single-partition window:

1. global rank = range-repartition on (len DESC, id) + in-partition
   sort + a per-partition running counter (mapInPandas, same stage as
   the sort — batches arrive in partition order) + a partition-offset
   map built from per-partition counts (one map-side-combined agg of
   P rows). Because the sort key is unique, rank is exactly the
   global sort position regardless of where range boundaries fall.
2. grp = rank % G, seq = rank // G — the round-robin deal.
3. per-group next-fit: groupBy(grp).applyInPandas — the sanctioned
   Arrow path for state Catalyst cannot express; each group's rows
   arrive sorted by seq and fold in O(rows).

At 100 TB: G and the rank partition count scale with the cluster;
the shuffles are one range exchange + one hash exchange on grp; the
only driver-side data is the P-row partition-count list.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _global_rank(df: DataFrame, len_col: str, id_col: str,
                 n_partitions: int | None = None) -> DataFrame:
    """Exact dense 0-based global rank by (len_col DESC, id_col ASC),
    fully distributed. Requires (len_col, id_col) unique per row
    (id uniqueness suffices)."""
    spark = df.sparkSession
    n_part = n_partitions or spark.sparkContext.defaultParallelism
    base = (df.repartitionByRange(n_part, F.col(len_col).desc(),
                                  F.col(id_col))
            .sortWithinPartitions(F.col(len_col).desc(), F.col(id_col)))

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in base.schema.fields)
    out_schema = f"{fields}, __pid int, __lrn long"

    def _number(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        n = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__pid"] = pid
            pdf["__lrn"] = range(n, n + len(pdf))
            n += len(pdf)
            yield pdf

    # lazy localCheckpoint (r6): the counts aggregate below is an
    # action, and without a materialization barrier the ENTIRE rank
    # pipeline (length scan + range exchange + sort + numbering) ran
    # twice — once for the counts, once for the downstream consumer
    # (measured 5.7s -> 3.1s for the full pack at 50k docs). The
    # checkpoint computes once and both consumers read the blocks.
    numbered = base.mapInPandas(_number, out_schema) \
        .localCheckpoint(eager=False)
    # partition offsets: P rows through a map-side-combined count agg;
    # the collect is P-sized (cluster-width), never data-sized
    counts = {r["__pid"]: r["cnt"] for r in
              numbered.groupBy("__pid").agg(F.count("*").alias("cnt"))
              .collect()}
    offsets, acc = {}, 0
    for pid in range(n_part):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])
    return numbered.withColumn(
        "__rank", off_map[F.col("__pid")] + F.col("__lrn")) \
        .drop("__pid", "__lrn"), acc


# applyInPandas materializes each group as ONE pandas frame; the
# payload is (id, len, grp, seq) rows, so 10^7 rows ≈ a few hundred MB
# per executor frame — the bound the auto-sizer enforces.
MAX_GROUP_ROWS = 10_000_000


def pack_sequences(docs: DataFrame, capacity: int, n_groups: int | None = None,
                   id_col: str = "doc_id", len_col: str = "n_tokens",
                   n_rank_partitions: int | None = None) -> DataFrame:
    """(id_col, grp, bin, offset): bin = packed-sequence index within
    the group, offset = token start position inside the bin. Documents
    longer than ``capacity`` are dropped (callers chunk those
    upstream). Deterministic: rank by (len DESC, id ASC), grp =
    rank % n_groups, next-fit in rank order within each group.

    ``n_groups=None`` (default) auto-sizes: max(8, ceil(rows /
    MAX_GROUP_ROWS)), so each applyInPandas group is bounded at
    ~10^7 (id, len) rows regardless of corpus size — a 10^10-doc
    corpus gets ≥1000 groups instead of 8 unbounded ones. Small
    corpora keep the historical 8 (deterministic oracles unchanged).
    """
    ranked, n_rows = _global_rank(
        docs.filter(F.col(len_col) <= capacity).select(id_col, len_col),
        len_col, id_col, n_rank_partitions)
    if n_groups is None:
        n_groups = max(8, -(-n_rows // MAX_GROUP_ROWS))
    grouped = ranked.select(
        id_col, len_col,
        (F.col("__rank") % n_groups).cast("int").alias("grp"),
        (F.col("__rank") / n_groups).cast("long").alias("seq"))

    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, grp int, bin long, offset long"
    cap = capacity

    def _next_fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        bins, offsets = [], []
        b, fill = 0, 0
        for n in pdf[len_col]:
            if fill + n > cap:
                b, fill = b + 1, 0
            bins.append(b)
            offsets.append(fill)
            fill += n
        return pd.DataFrame({id_col: pdf[id_col], "grp": pdf["grp"],
                             "bin": bins, "offset": offsets})

    return grouped.groupBy("grp").applyInPandas(_next_fit, out_schema)
