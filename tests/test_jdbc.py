"""JDBC source/sink plane (S1/S5/S6) against a REAL database: embedded
Derby, which ships inside Spark's jar directory — no network, same JVM.
This exercises the actual JDBC code paths (DriverManager, partitioned
scan bounds, append/overwrite writes), not mocks."""

import tempfile

from pyspark.sql import functions as F

from puma_matcher_spark.sources.jdbc import (
    partitioned_jdbc_read,
    scalar_int_query,
    write_jdbc,
)

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_roundtrip_partitioned_scan_and_scalar(spark):
    with tempfile.TemporaryDirectory() as root:
        url = f"jdbc:derby:{root}/db;create=true"
        # Spark's JDBC writer CREATEs tables with quoted (case-sensitive)
        # column names; unquoted identifiers in raw subqueries fold to
        # uppercase in Derby — use uppercase column names so both agree.
        df = spark.range(100).select(
            F.col("id").alias("ID"), (F.col("id") % 7).alias("GRP")
        )
        # S5: overwrite then append → 200 rows
        write_jdbc(df, url, "items", mode="overwrite", properties=DERBY_PROPS)
        write_jdbc(df, url, "items", mode="append", properties=DERBY_PROPS)

        # S6: driver-side scalar query
        n = scalar_int_query(
            spark, url, "select count(*) as c from items", DERBY_PROPS
        )
        assert n == 200

        # S1: pushdown subquery + partitioned scan with computed bounds
        out = partitioned_jdbc_read(
            spark,
            url,
            "select id, grp from items where grp < 5",
            partition_column="ID",
            num_partitions=4,
            properties=DERBY_PROPS,
        )
        assert out.rdd.getNumPartitions() == 4
        rows = out.collect()
        expected = [i for i in range(100) if i % 7 < 5] * 2
        assert sorted(r["ID"] for r in rows) == sorted(expected)
        assert all(r["GRP"] < 5 for r in rows)

        # unpartitioned path still repartitions to the requested width
        flat = partitioned_jdbc_read(
            spark,
            url,
            "select id from items",
            partition_column=None,
            num_partitions=3,
            properties=DERBY_PROPS,
        )
        assert flat.rdd.getNumPartitions() == 3
        assert flat.count() == 200


def test_jdbc_filter_pushdown_reaches_the_database(spark):
    """A .where() above the JDBC scan must land in the relation's
    PushedFilters — the filter executes IN the database, not in Spark
    (SqlDataSource.scala pushes predicates into the subquery the same
    way).  Asserted on the physical plan, not inferred."""
    with tempfile.TemporaryDirectory() as root:
        url = f"jdbc:derby:{root}/db;create=true"
        df = spark.range(50).select(
            F.col("id").alias("ID"), (F.col("id") % 5).alias("GRP")
        )
        write_jdbc(df, url, "t", mode="overwrite", properties=DERBY_PROPS)
        out = partitioned_jdbc_read(
            spark, url, "select id, grp from t",
            partition_column="ID", num_partitions=2, properties=DERBY_PROPS,
        ).where(F.col("GRP") < 2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "GRP" in plan.split("PushedFilters")[1][:120], plan
        assert out.count() == 20


def test_jdbc_type_fidelity_roundtrip(spark):
    """Timestamps, doubles, strings and NULLs must survive the JDBC
    write→read cycle bit-exactly (the reference reads/writes every table
    through JDBC; silent type coercion would corrupt the pipeline)."""
    from datetime import datetime

    with tempfile.TemporaryDirectory() as root:
        url = f"jdbc:derby:{root}/db;create=true"
        rows = [
            (1, 3.141592653589793, "exact", datetime(2024, 2, 29, 23, 59, 59)),
            (2, -0.0, None, None),
            (3, 1e308, "unicode émü", datetime(1970, 1, 1)),
        ]
        df = spark.createDataFrame(
            rows, "ID LONG, X DOUBLE, S STRING, TS TIMESTAMP"
        )
        write_jdbc(df, url, "fid", mode="overwrite", properties=DERBY_PROPS)
        back = {
            r["ID"]: r
            for r in partitioned_jdbc_read(
                spark, url, "select id, x, s, ts from fid",
                partition_column="ID", num_partitions=2,
                properties=DERBY_PROPS,
            ).collect()
        }
        for rid, x, s, ts in rows:
            assert back[rid]["X"] == x
            assert back[rid]["S"] == s
            assert back[rid]["TS"] == ts


def test_jdbc_pipeline_end_to_end_matches_parquet_path(spark, sf_small):
    """The reference's deployment shape (every source AND sink is JDBC —
    SqlDataSource.scala / DbManager.scala): documents load into the
    database, a partitioned JDBC scan feeds a real operator (exact
    dedup), and the result lands back via the JDBC sink — output must be
    IDENTICAL to the same operator over the parquet fixture path."""
    from puma_matcher_spark.llmdata.dedup import exact_duplicates
    from puma_matcher_spark.sources.testdata import load_tables

    docs = load_tables(spark, sf_small).llm_documents().select("doc_id", "text")
    expected = {
        (r["fingerprint"], r["doc_count"], r["keep_id"])
        for r in exact_duplicates(docs).collect()
    }
    with tempfile.TemporaryDirectory() as root:
        url = f"jdbc:derby:{root}/db;create=true"
        write_jdbc(
            docs.select(
                F.col("doc_id").alias("DOC_ID"), F.col("text").alias("TEXT")
            ),
            url, "documents", mode="overwrite", properties=DERBY_PROPS,
        )
        jdocs = partitioned_jdbc_read(
            spark, url, "select doc_id, text from documents",
            partition_column="DOC_ID", num_partitions=4,
            properties=DERBY_PROPS,
        ).select(F.col("DOC_ID").alias("doc_id"), F.col("TEXT").alias("text"))
        out = exact_duplicates(jdocs)
        write_jdbc(out, url, "dedup_out", mode="overwrite", properties=DERBY_PROPS)
        # Spark's JDBC writer CREATEs quoted (case-preserving) columns,
        # so the sink table keeps the frame's lowercase names
        got = {
            (r["fingerprint"], r["doc_count"], r["keep_id"])
            for r in spark.read.jdbc(
                url, "dedup_out", properties=DERBY_PROPS
            ).collect()
        }
    assert got == expected and len(got) > 0
