"""Relational-zoo broad parity (round 8): every oracled query over the
TPC-H-derived tables must match DuckDB on an adversarial corpus — NULL
dates/keys/strings, empty strings, zero/negative amounts, discount = 1.0
(zero-revenue groups), FK orphans on both sides of every relationship,
full-row duplicate parent AND child rows, and childless parents.

The probe behind this test caught two latent defect classes invisible on
the standard (PK-clean) fixtures:

* NULL customer/supplier keys became NULL node ids in the purchase
  graph and silently dropped out of the PageRank iteration's equi-joins,
  leaking rank mass (total_mass 0.94 ≠ 1.0) — fixed by excluding
  NULL-endpoint edges in the shared edge builder and its SQL twin;
* a duplicated ``documents_dim`` row (full-row duplicate order, the
  idempotency-bug shape) AMPLIFIED candidates ×4 through the type→date
  filter chain while the oracle's single-join shape only doubled them.
  Resolution: duplicate ``o_orderkey`` is OUT OF CONTRACT — the
  reference reads the dim from a JDBC primary key; our engine DETECTS
  violations via dq_expectations' ``unique:o_orderkey`` rule (pinned
  below) instead of masking them with an in-plan dedup that measured
  +60-90% on match_candidates at sf0.1.  The zoo therefore keeps
  duplicate LINEITEM rows (no query assumes that key; all aggregate
  before joining) but not duplicate orders.

The zoo corpus samples the sf0.001 fixture under referential closure
(30 customers → their orders → those lineitems → referenced parts and
suppliers) so queries exercise their real join paths, then appends the
mutations.
"""

from __future__ import annotations

import duckdb
import pytest

from puma_matcher_spark.oracle import compare_query
from puma_matcher_spark.queries import REGISTRY

TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def build_zoo(tmp: str, sf_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    con.execute("""
        CREATE TABLE z_customer AS SELECT * FROM src_customer ORDER BY c_custkey LIMIT 30;
        CREATE TABLE z_orders AS SELECT o.* FROM src_orders o
          JOIN z_customer c ON o.o_custkey = c.c_custkey;
        CREATE TABLE z_lineitem AS SELECT l.* FROM src_lineitem l
          JOIN z_orders o ON l.l_orderkey = o.o_orderkey;
        CREATE TABLE z_part AS SELECT p.* FROM src_part p
          WHERE p.p_partkey IN (SELECT l_partkey FROM z_lineitem);
        CREATE TABLE z_supplier AS SELECT s.* FROM src_supplier s
          WHERE s.s_suppkey IN (SELECT l_suppkey FROM z_lineitem);
        CREATE TABLE z_nation AS SELECT * FROM src_nation;
        CREATE TABLE z_region AS SELECT * FROM src_region;
    """)
    con.execute("""
        INSERT INTO z_customer VALUES
          (9001, NULL,            1, 100.0,  'BUILDING'),
          (9002, '',              2, NULL,   'MACHINERY'),
          (9003, 'zoo null seg',  3, -999.99, NULL),
          (9004, 'zoo childless', 4, 0.0,    'FURNITURE');
        INSERT INTO z_orders VALUES
          (990001, 9001, 'O', 0.0,     TIMESTAMP '1996-01-02 00:00:00', '1-URGENT'),
          (990002, 9002, 'F', -500.0,  NULL,                            '2-HIGH'),
          (990003, NULL, 'O', 1234.5,  TIMESTAMP '1997-03-04 00:00:00', NULL),
          (990004, 888888, 'P', 777.0, TIMESTAMP '1998-05-06 00:00:00', '3-MEDIUM'),
          (990005, 9003, 'O', 999.0,   TIMESTAMP '1995-07-08 00:00:00', '4-NOT SPECIFIED');
        INSERT INTO z_lineitem VALUES
          (990001, (SELECT MIN(p_partkey) FROM z_part),
                   (SELECT MIN(s_suppkey) FROM z_supplier),
           1, 0.0, 1000.0, 1.0, 0.05, 'N', 'O', TIMESTAMP '1996-02-01 00:00:00'),
          (990001, (SELECT MIN(p_partkey) FROM z_part),
                   (SELECT MIN(s_suppkey) FROM z_supplier),
           2, 5.0, -250.0, 0.0, 0.0, NULL, '', NULL),
          (990002, NULL, NULL, 1, 3.0, 300.0, 0.5, 0.08, 'R', 'F',
           TIMESTAMP '1994-09-10 00:00:00'),
          (777777, (SELECT MAX(p_partkey) FROM z_part),
                   (SELECT MAX(s_suppkey) FROM z_supplier),
           1, 7.0, 700.0, 0.1, 0.02, 'A', 'F',
           TIMESTAMP '1993-11-12 00:00:00');
        INSERT INTO z_lineitem SELECT * FROM z_lineitem
          WHERE l_orderkey = 990002 AND l_linenumber = 1;
        INSERT INTO z_part VALUES
          (980001, NULL, 'Brand#99', NULL, 0, NULL),
          (980002, '', '', 'zoo type only', -5, 0.0);
        INSERT INTO z_supplier VALUES
          (970001, NULL, NULL, -100.0),
          (970002, '', 1, 0.0);
        INSERT INTO z_nation VALUES (99, 'ZOOLAND', 77);
    """)
    for t in TABLES:
        con.execute(f"COPY z_{t} TO '{tmp}/{t}.parquet' (FORMAT PARQUET)")


@pytest.mark.slow
def test_relational_zoo_broad_parity(spark, sf_small, tmp_path):
    build_zoo(str(tmp_path), sf_small)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    failures, n_checked = [], 0
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            res = compare_query(
                spark, con, name, spec.spark_fn, spec.oracle, str(tmp_path)
            )
        except Exception as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Table with name" in msg:
                continue  # needs documents/embeddings/events — other zoos
            failures.append(f"{name}: EXC {type(e).__name__}: {msg[:200]}")
            continue
        n_checked += 1
        if not res.ok:
            failures.append(f"{name}: {res}")
    assert n_checked >= 65, f"zoo scope shrank: only {n_checked} checked"
    assert not failures, "relational-zoo divergence:\n" + "\n".join(failures)


def test_dq_gate_detects_duplicate_dim_keys(spark):
    """The documents_dim PK contract is DETECTED, not masked: a full-row
    duplicate order (the idempotency-bug shape) must flip the
    ``unique:o_orderkey`` expectation to failed with the right violation
    count — this is the production gate that guards every dim join from
    silent candidate amplification."""
    from pyspark.sql import functions as F

    from puma_matcher_spark.operators.quality import expectation_report

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, "1996-01-02", "1-URGENT"),
            (2, 11, "F", 200.0, "1997-01-02", "2-HIGH"),
            (2, 11, "F", 200.0, "1997-01-02", "2-HIGH"),  # re-appended row
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate STRING, o_orderpriority STRING",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "1996-02-01")],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, "
        "l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate STRING",
    )
    rows = {r["rule"]: r for r in expectation_report(orders, lineitem).collect()}
    assert rows["unique:o_orderkey"]["passed"] is False
    assert rows["unique:o_orderkey"]["violations"] == 1
