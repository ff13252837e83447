"""Mimic the driver's correctness gate: run every queries() entry and its
oracle_sql() twin at sf0.01, compare row count, schema width, and exact
values (columns sorted by name, rows sorted) — a stricter local version of
the value-hash check."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        pytest.skip("rows-only query (no SQL oracle declared)")
    got = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    want = ddb.execute(oracles[name]).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), f"{name}: columns differ"
    g, w = normalize(got), normalize(want)
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            pd.testing.assert_series_equal(
                gc.astype(float), wc.astype(float), check_names=False, rtol=0, atol=0
            )
        else:
            assert gc.fillna(-1).tolist() == wc.fillna(-1).tolist(), f"{name}.{col}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) >= 2


def test_media_features_oracle_is_byte_based_on_non_ascii(spark):
    """The media_features oracle must agree with the Spark UTF-8 byte path
    on MULTIBYTE text, not just the ASCII fixture corpus — the r7 oracle
    iterated characters (ord over split(text,'')) and only agreed because
    the documents fixture is pure ASCII."""
    import duckdb

    from btrdb_server_spark.functions.multimodal import (
        media_features,
        media_from_documents,
    )

    rows = [
        (0, "héllo wörld"),          # 2-byte UTF-8 sequences
        (1, "日本語テキスト"),          # 3-byte sequences
        (2, "emoji 🎉 and ascii"),    # 4-byte sequence
        (3, ""),                      # empty payload
        (4, "plain ascii"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        media_features(media_from_documents(docs))
        .orderBy("media_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(entry_mod.oracle_sql()["media_features"]).df()
    g, w = normalize(got), normalize(want)
    assert len(g) == len(w) == 5
    for col in g.columns:
        gc, wc = g[col], w[col]
        if gc.dtype.kind == "f" or wc.dtype.kind == "f":
            pd.testing.assert_series_equal(
                gc.astype(float), wc.astype(float), check_names=False, rtol=0, atol=0
            )
        else:
            assert gc.fillna(-1).tolist() == wc.fillna(-1).tolist(), col
