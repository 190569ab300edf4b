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
