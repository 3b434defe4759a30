"""Cross-engine portability of the rounding and hashing layers — the
foundations of the oracle gate — on seeded random inputs."""

import random

import duckdb
from pyspark.sql import functions as F

from puma_matcher_spark.functions.ids import pair_id
from puma_matcher_spark.functions.rounding import pround, rewrite_rounds_sql
from puma_matcher_spark.llmdata.dedup import portable_hash60


def test_pround_matches_duckdb_on_random_doubles(spark):
    rng = random.Random(42)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(5000)]
    # adversarial: exact decimal boundaries at every scale
    vals += [i / 2e4 for i in range(-50, 50)]
    vals += [39.69875, -39.69875, 0.03125, 2.5e-5]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got_spark = [r["r"] for r in df.select(pround(F.col("x"), 4).alias("r")).collect()]
    sql = rewrite_rounds_sql("SELECT ROUND(x, 4) AS r FROM vals")
    con = duckdb.connect()
    con.execute("CREATE TABLE vals(x DOUBLE)")
    con.executemany("INSERT INTO vals VALUES (?)", [(v,) for v in vals])
    got_duck = [r[0] for r in con.sql(sql).fetchall()]
    assert got_spark == got_duck


def test_portable_hash60_matches_duckdb_on_random_strings(spark):
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefghij #-_") for _ in range(rng.randint(0, 30)))
        for _ in range(2000)
    ]
    df = spark.createDataFrame([(w,) for w in words], ["s"])
    got_spark = [
        r["h"] for r in df.select(portable_hash60(F.col("s")).alias("h")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE w(s VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    got_duck = [
        r[0]
        for r in con.sql(
            "SELECT ('0x' || substr(md5(s), 1, 15))::BIGINT FROM w"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_pair_id_is_order_insensitive_and_recoverable(spark):
    rng = random.Random(9)
    pairs = [(rng.randint(1, 999_999), rng.randint(1, 999_999)) for _ in range(500)]
    df = spark.createDataFrame(pairs, ["a", "b"])
    out = df.select(
        "a",
        "b",
        pair_id(F.col("a"), F.col("b")).alias("p_ab"),
        pair_id(F.col("b"), F.col("a")).alias("p_ba"),
    ).collect()
    for r in out:
        assert r["p_ab"] == r["p_ba"]
        lo, hi = min(r["a"], r["b"]), max(r["a"], r["b"])
        assert r["p_ab"] == lo * 1_000_000 + hi
        # recoverable
        assert (r["p_ab"] // 1_000_000, r["p_ab"] % 1_000_000) in {
            (lo, hi),
            (lo, hi % 1_000_000),
        }


def test_rewrite_rounds_handles_nested_and_multiple():
    sql = "SELECT ROUND(SUM(a + ROUND(b, 2)), 4) AS x, ROUND(c, 1) AS y"
    out = rewrite_rounds_sql(sql)
    assert "ROUND" not in out
    assert out.count("FLOOR") == 3


def test_money_units_matches_duckdb_on_random_prices(spark):
    """money_units (exact integer micro-unit floor) must agree with its
    SQL twin on random prices AND on adversarial cent/quarter-cent
    boundaries — the round-4 TPC-H shapes compare these longs for
    equality across engines."""
    from puma_matcher_spark.functions.rounding import money_units, money_units_sql

    rng = random.Random(99)
    vals = [rng.uniform(0, 1e5) for _ in range(5000)]
    vals += [i / 100.0 for i in range(0, 500)]       # exact cents
    vals += [i / 400.0 for i in range(0, 500)]       # quarter cents
    vals += [901.00005, 0.00005, 12345.99995]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got_spark = [
        r["u"] for r in df.select(money_units(F.col("x")).alias("u")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(x DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?)", [(v,) for v in vals])
    got_duck = [
        r[0] for r in con.sql(f"SELECT {money_units_sql('x')} FROM p").fetchall()
    ]
    assert got_spark == got_duck
