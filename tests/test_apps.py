"""End-to-end FullMatcherApp-shape integration over the fixture corpus."""

import tempfile

from pyspark.sql import functions as F

from puma_matcher_spark.apps import run_full_matcher


def test_full_matcher_publishes_to_jdbc(spark, sf_small):
    """The reference's actual deployment shape: the match pipeline's
    MATCH_CANDIDATE output is published over JDBC and read back with the
    partitioned scan — exercised against embedded Derby end-to-end."""
    from puma_matcher_spark.sources.jdbc import partitioned_jdbc_read, write_jdbc

    result = run_full_matcher(spark, sf_small, train_weights=False)
    out = result.candidates.select(
        F.col("pair_id").alias("PAIR_ID"),
        F.col("score_type").alias("SCORE_TYPE"),
        F.col("score").alias("SCORE"),
    )
    with tempfile.TemporaryDirectory() as root:
        url = f"jdbc:derby:{root}/db;create=true"
        props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        write_jdbc(out, url, "match_candidate", mode="overwrite", properties=props)
        back = partitioned_jdbc_read(
            spark,
            url,
            "select pair_id, score_type, score from match_candidate",
            partition_column="PAIR_ID",
            num_partitions=8,
            properties=props,
        )
        assert back.count() == out.count()
        sent = out.agg(F.sum("SCORE")).first()[0]
        got = back.agg(F.sum("SCORE")).first()[0]
        assert abs(sent - got) < 1e-6


def test_full_matcher_end_to_end(spark, sf_small):
    result = run_full_matcher(spark, sf_small)

    cand = result.candidates
    n = cand.count()
    assert n > 1000
    # canonical: one row per (pair, type), dv1 < dv2
    assert cand.where(
        F.col("document_version1_id") >= F.col("document_version2_id")
    ).count() == 0
    assert (
        cand.groupBy("pair_id", "score_type").count().where("count > 1").count() == 0
    )
    # multi-type filter semantics: person-only pairs are gone
    types_per_pair = cand.groupBy("pair_id").agg(
        F.collect_set("score_type").alias("ts")
    )
    person_only = types_per_pair.where(
        (F.size("ts") == 1) & F.array_contains("ts", "person")
    )
    assert person_only.count() == 0

    # stats cover every candidate document
    assert result.statistics.count() > 0
    stat_docs = {
        r["document_version_id"]
        for r in result.statistics.select("document_version_id").distinct().collect()
    }
    some_doc = cand.select(
        F.col("document_version1_id").alias("d")
    ).first()["d"]
    assert some_doc in stat_docs

    # weights: sum to 1 over the optimized types
    w = {r["score_type"]: r["weight"] for r in result.weights.collect()}
    assert abs(sum(w.values()) - 1.0) < 1e-9
    assert set(w) == {"person", "laboratory"}

    # totals exist for every surviving pair
    assert result.total_scores.count() == types_per_pair.count()


def test_curation_app_end_to_end(spark, sf_small, tmp_path):
    from puma_matcher_spark.apps import run_curation_app

    out = str(tmp_path / "clean_corpus")
    res = run_curation_app(spark, sf_small, out_root=out)
    c = res.stage_counts
    # monotone drops through the funnel
    assert c["input"] >= c["after_exact_dedup"] >= c["after_near_dedup"] >= c["after_quality"]
    assert c["after_quality"] > 0
    assert c["tokens_cut"] >= 0
    # the published corpus is partitioned by source and matches the frame
    import os

    assert any(d.startswith("source=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == res.clean.count() == c["after_quality"]
    assert set(back.columns) == {"doc_id", "lang", "source", "clean_text", "n_tokens_removed"}


def test_cli_list_and_oracle(capsys):
    from puma_matcher_spark.__main__ import main

    assert main(["list", "events_trend"]) == 0
    out = capsys.readouterr().out
    assert "events_trend" in out and "[oracle]" in out
    assert main(["oracle", "events_trend"]) == 0
    assert "regr_slope" in capsys.readouterr().out
    assert main(["oracle", "nope_not_real"]) == 2
    assert main(["oracle", "pagerank_top"]) == 1  # rows-only


def test_cli_run_and_explain(spark, sf_small, capsys):
    from puma_matcher_spark.__main__ import main

    assert main(["run", "events_trend", "--sf-dir", sf_small, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "rows total" in out and "event_type" in out
    assert main(["explain", "large_orders", "--sf-dir", sf_small]) == 0
    assert "Physical Plan" in capsys.readouterr().out
    assert main(["run", "nope", "--sf-dir", sf_small]) == 2
