"""Local replica of the driver's correctness gate: every queries() entry run
via Spark must match its oracle_sql() DuckDB equivalent at sf0.01 —
row count, column names, and order-insensitive values (SURVEY.md §5.2 item 2).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

from .conftest import SF_DIR


def _normalize(rows, cols):
    """Order-insensitive canonical form: rows as tuples of repr-strings in
    sorted column order, then sorted."""
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.10g}")
            elif isinstance(v, bool):
                vals.append(str(bool(v)))
            elif v is None:
                vals.append("∅NULL∅")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _run_oracle(sql: str):
    con = duckdb.connect()
    for t in TABLES:  # the driver pre-registers all ten views
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [dict(zip(cols, r)) for r in cur.fetchall()]
    con.close()
    return cols, rows


# rows-only queries have no SQL oracle (driver records a weaker check);
# they get dedicated python-oracle tests elsewhere
QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    assert sql is not None, f"no oracle for {name}"

    sdf = qfn(spark, SF_DIR)
    s_cols = sorted(sdf.columns)
    s_rows = [r.asDict() for r in sdf.collect()]

    o_cols, o_rows = _run_oracle(sql)
    assert sorted(o_cols) == s_cols, (
        f"column mismatch: spark={s_cols} oracle={sorted(o_cols)}")
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    sn = _normalize(s_rows, s_cols)
    on = _normalize(o_rows, s_cols)
    if sn != on:
        diff_s = [r for r in sn if r not in set(on)][:5]
        diff_o = [r for r in on if r not in set(sn)][:5]
        pytest.fail(f"value mismatch for {name}:\n spark-only={diff_s}\n "
                    f"oracle-only={diff_o}")


# VERDICT r02 item 4 "Done" condition: the adaptive-bits ANN queries must
# stay green with bits DERIVED (not pinned) at sf0.1 as well — a different
# corpus size than sf0.01, so a different derived signature width.
SF_BIG = "/root/testdata/sf0.1"


def _run_oracle_at(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [dict(zip(cols, r)) for r in cur.fetchall()]
    con.close()
    return cols, rows


@pytest.mark.parametrize("name", ["ann_lsh_topk", "embedding_near_dups"])
def test_adaptive_bits_ann_matches_oracle_at_sf01(spark, name):
    sdf = entrymod.queries()[name](spark, SF_BIG)
    s_cols = sorted(sdf.columns)
    s_rows = [r.asDict() for r in sdf.collect()]
    o_cols, o_rows = _run_oracle_at(entrymod.oracle_sql()[name], SF_BIG)
    assert sorted(o_cols) == s_cols
    assert _normalize(s_rows, s_cols) == _normalize(o_rows, s_cols)


def test_adaptive_bits_change_with_corpus_and_stay_green(spark, tmp_path):
    """Adaptivity proof: amplify the sf0.01 embeddings 5× (2500 rows) so the
    derived signature width actually CHANGES (4 → 5 bits), then run the same
    driver query and oracle SQL over the amplified corpus — still equal."""
    from pyspark.sql import functions as F
    from sparkcheck.operators.similarity import ORACLE_MAX_BITS, auto_bits

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    amp = (emb.crossJoin(spark.range(5).select(F.col("id").alias("_i")))
              .select((F.col("vec_id") * 5 + F.col("_i")).alias("vec_id"),
                      "embedding"))
    out = str(tmp_path / "amp")
    amp.coalesce(1).write.parquet(f"{out}/embeddings.parquet")
    n = spark.read.parquet(f"{out}/embeddings.parquet").count()
    assert auto_bits(n, hi=ORACLE_MAX_BITS) == 5 != auto_bits(500, hi=16)

    name = "ann_lsh_topk"
    sdf = entrymod.queries()[name](spark, out)
    s_cols = sorted(sdf.columns)
    s_rows = [r.asDict() for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{out}/embeddings.parquet/*.parquet'")
    cur = con.execute(entrymod.oracle_sql()[name])
    o_cols = [d[0] for d in cur.description]
    o_rows = [dict(zip(o_cols, r)) for r in cur.fetchall()]
    con.close()
    assert sorted(o_cols) == s_cols
    assert _normalize(s_rows, s_cols) == _normalize(o_rows, s_cols)
