"""Driver-contract emulation: run every queries() entry at sf0.01 and
compare against its oracle_sql() twin via DuckDB (row count + sorted
order-insensitive values), the same check CORRECTNESS_r{N}.json records."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from anytomd_spark.pipeline import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def spark():
    s = build_session(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [columns[i] for i in order]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "conv_id"
    failures = [r for r in rows if r.error is not None]
    assert not failures, failures[:3]


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


def _dtype_kind(dt) -> str:
    """Coarse dtype class for driver-hash compatibility: the driver's
    value hash is dtype-sensitive for object-boxed values (e.g. DuckDB
    HUGEINT -> object of Python ints vs Spark BIGINT -> int64), so flag
    any column whose pandas dtype kind diverges between the two engines."""
    k = dt.kind
    return "i" if k == "u" else k


@pytest.mark.parametrize("name", sorted(ORACLES), ids=sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    spark_rows = [tuple(r) for r in spark_pdf.itertuples(index=False)]
    spark_cols = list(spark_pdf.columns)

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    for col in spark_cols:
        if col in duck_pdf.columns and len(spark_pdf) and len(duck_pdf):
            sk = _dtype_kind(spark_pdf[col].dtype)
            dk = _dtype_kind(duck_pdf[col].dtype)
            assert sk == dk, (
                f"{name}.{col}: pandas dtype kind differs "
                f"(spark {spark_pdf[col].dtype} vs duckdb {duck_pdf[col].dtype})"
                " — the driver's value hash will mismatch; cast in the oracle"
            )

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_canon, cols = _canon(spark_rows, spark_cols)
    d_canon, _ = _canon(duck_rows, duck_cols)
    assert len(s_canon) == len(d_canon), (
        f"{name}: row count {len(s_canon)} vs {len(d_canon)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]} cols={cols}"


ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY, ids=ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    if name in ("text_fingerprints", "media_features", "sim_ann_lsh"):
        assert n > 0
