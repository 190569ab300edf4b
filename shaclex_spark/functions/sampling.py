"""Deterministic sampling operators for corpus curation.

Training-data pipelines re-balance a crawl by stratum (language,
source, quality band) with per-stratum keep rates. The sample must be
DETERMINISTIC (same doc kept on every run / every resume, independent
of partitioning) and SHUFFLE-FREE (a pure filter over the scan, so it
composes with predicate pushdown and survives 100 TB unchanged) —
which rules out `df.sample()` (partition-order dependent) and
`rand()` (nondeterministic on recompute).

The keep decision hashes the ROW KEY, not the partition: a doc is
kept iff the first 8 hex digits of md5(id) — a uniform 32-bit value —
fall under the stratum's rate. md5 is available and bit-identical in
every engine (Spark, DuckDB, Python hashlib), which keeps the oracle
trivially portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_unit(col: Column) -> Column:
    """Deterministic uniform [0,1) value from any column: the first 8
    hex digits of md5(string(col)) scaled by 2^-32. Pure expression,
    codegen'd, no UDF."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return h.cast("double") / F.lit(4294967296.0)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], id_col: str,
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff hash_unit(id) < rate[stratum]. Rows whose
    stratum is not in `rates` use `default_rate` (0.0 = drop).

    The rate table is tiny (one row per language/source) and folded
    into a single CASE expression — no join at all, so the plan is
    scan → filter and the rate predicate reaches the parquet reader's
    row-group pruning where the stratum column is dictionary-encoded.
    """
    u = hash_unit(F.col(id_col))
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))) \
                .otherwise(rate)
    return df.filter(u < rate)


def token_budget_sample(df: DataFrame, strata_col: str, budget: float,
                        id_col: str, tokens_col: str) -> DataFrame:
    """Down-sample each stratum to approximately `budget` tokens:
    keep rate = min(1, budget / stratum_total_tokens), decided by the
    same deterministic md5 gate as stratified_sample.

    This is the "mixture" step of a training run: a target token
    budget per language/source, computed FROM the data instead of a
    hand-tuned rate table. Two-phase plan: (1) one map-side-combined
    groupBy producing one row per stratum (tiny at any corpus scale —
    hundreds of strata, not rows), (2) broadcast that rate table back
    onto the scan and filter. The corpus itself is never shuffled; at
    100 TB the only wide exchange moves |strata| rows.
    """
    tot = df.groupBy(strata_col).agg(F.sum(tokens_col).alias("_tot"))
    rate = F.least(F.lit(1.0), F.lit(float(budget)) / F.col("_tot"))
    u = hash_unit(F.col(id_col))
    return (df.join(F.broadcast(tot), strata_col)
              .filter(u < rate)
              .drop("_tot"))
