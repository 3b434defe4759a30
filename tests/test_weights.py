"""Weight trainer: grid generation, rank-error evaluation, best-weight
selection on a hand-built candidate set."""

from pyspark.sql import functions as F

from puma_matcher_spark.operators import weights as wt


def test_weight_grid_sums_to_one(spark):
    grid = wt.weight_grid(spark, ["a", "b", "c"], step=0.25)
    sums = (
        grid.groupBy("weight_id").agg(F.round(F.sum("weight"), 9).alias("s")).collect()
    )
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)
    # C(4+2,2) = 15 vectors for 3 types at step .25
    assert grid.select("weight_id").distinct().count() == 15


def test_best_weights_picks_discriminating_type(spark):
    # type 'good' ranks the accepted proposal first; type 'bad' ranks it
    # last → optimal weights must put everything on 'good'.
    rows = []
    for pub in (100, 200, 300):
        for prop, good_score, bad_score in (
            (1, 10.0, 1.0),
            (2, 5.0, 9.0),
            (3, 1.0, 10.0),
        ):
            rows.append((prop, pub, "good", good_score))
            rows.append((prop, pub, "bad", bad_score))
    cand = spark.createDataFrame(
        rows,
        ["document_version1_id", "document_version2_id", "score_type", "score"],
    )
    training = spark.createDataFrame(
        [(1, 100, True), (1, 200, True), (1, 300, True)],
        ["proposal_id", "publication_id", "accepted"],
    )
    best = {
        r["score_type"]: r["weight"]
        for r in wt.best_weights(
            spark, cand, training, ["good", "bad"], step=0.5
        ).collect()
    }
    assert best["good"] == 1.0
    assert best["bad"] == 0.0


def test_evaluate_weights_error_counts_rank_misses(spark):
    cand = spark.createDataFrame(
        [(1, 100, "t", 1.0), (2, 100, "t", 2.0)],
        ["document_version1_id", "document_version2_id", "score_type", "score"],
    )
    grid = spark.createDataFrame([(0, "t", 1.0)], ["weight_id", "score_type", "weight"])
    training = spark.createDataFrame(
        [(1, 100, True)], ["proposal_id", "publication_id", "accepted"]
    )
    ctx = wt.contextual_scores(cand)
    out = wt.evaluate_weights(ctx, grid, training).collect()[0]
    # accepted proposal 1 ranks 2nd → error = 1, no top-1 hit, top-3 hit
    assert out["error"] == 1
    assert out["hits_1"] == 0
    assert out["hits_3"] == 1
