from __future__ import annotations

import pytest

from shaclex_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small parallelism for fast test startup; shuffle partitions tiny
    # because fixture data is tiny (at scale these come from config).
    s = get_spark("shaclex_spark_tests", parallelism=4, shuffle_partitions=4)
    yield s


def triples_df(spark, rows):
    """rows: (subj, pred, obj_kind, obj_value, obj_dt, obj_lang)"""
    from shaclex_spark.model import TRIPLES_SCHEMA

    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def focus_df(spark, rows):
    """rows: (node, shape)"""
    return spark.createDataFrame(
        [(n, s, "node") for n, s in rows],
        "node string, shape string, selector string",
    )
