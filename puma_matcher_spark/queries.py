"""Query registry: every implemented operator exposed as a named query over
the driver testdata, each with a DuckDB oracle-SQL twin.

Conventions that keep the Spark↔DuckDB value-hash comparison exact:

* shared logical views (documents_dim / entities / ...) are defined ONCE as
  SQL fragments here and mirrored verbatim by ``sources.testdata.Tables``;
* every double-typed output column is ``round(x, 4)``;
* every count/sum of integers is cast to BIGINT on the DuckDB side (DuckDB
  sums integers into HUGEINT, Spark into LONG);
* windows/top-k order by a fully deterministic key (value, then id);
* hashes use md5-derived arithmetic that evaluates identically in both
  engines (see llmdata.dedup.portable_hash60).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from puma_matcher_spark.functions.ids import candidate_id, pair_id
from puma_matcher_spark.llmdata import dedup as dd
from puma_matcher_spark.llmdata import similarity as sim
from puma_matcher_spark.llmdata import textstats as ts
from puma_matcher_spark.operators import filters as flt
from puma_matcher_spark.operators import matcher as m
from puma_matcher_spark.operators import scorer as sc
from puma_matcher_spark.operators import scorelist as sl
from puma_matcher_spark.operators import stats as st
from puma_matcher_spark.sources.testdata import Tables, load_tables

# --------------------------------------------------------------------------
# Shared SQL view fragments (DuckDB oracle side). The Spark twins live in
# sources.testdata.Tables — keep both in sync.
# --------------------------------------------------------------------------

V_DOCS = """documents_dim AS (
  SELECT o_orderkey AS document_version_id,
         CASE WHEN o_custkey % 2 = 0 THEN 'PROPOSAL' ELSE 'PUBLICATION' END AS document_type,
         o_orderdate AS date,
         (o_orderstatus = 'F') AS obsolete
  FROM orders)"""

V_ENTITIES = """entities AS (
  SELECT l_orderkey AS document_version_id, l_partkey AS entity_id FROM lineitem)"""

V_ENTITIES2 = """entities2 AS (
  SELECT o_orderkey AS document_version_id, o_custkey AS entity_id FROM orders)"""


def _tf_chain(p: str, src: str) -> str:
    """CTE chain: tf → df → frequency guard → pair self-join → TF-IDF score.

    Mirrors operators.matcher (entity_tf / cap_entity_frequency /
    entity_pairs) + operators.scorer (with_idf / score_entity_pairs) with
    score_factor=3.
    """
    return f"""{p}tf AS (
  SELECT document_version_id, entity_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM {src} GROUP BY 1, 2),
{p}dfreq AS (
  SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS df FROM {p}tf GROUP BY 1),
{p}doccnt AS (
  SELECT CAST(COUNT(DISTINCT document_version_id) AS BIGINT) AS n FROM {src}),
{p}keep AS (
  SELECT entity_id FROM {p}dfreq
  WHERE df <= 2000 AND df < (SELECT n FROM {p}doccnt) / 20.0),
{p}ctf AS (SELECT t.* FROM {p}tf t JOIN {p}keep USING (entity_id)),
{p}pairs AS (
  SELECT a.entity_id,
         a.document_version_id AS document_version1_id,
         b.document_version_id AS document_version2_id,
         a.tf AS tf1, b.tf AS tf2
  FROM {p}ctf a JOIN {p}ctf b
    ON a.entity_id = b.entity_id
   AND a.document_version_id < b.document_version_id),
{p}agg AS (
  SELECT pr.document_version1_id, pr.document_version2_id,
         SUM((pr.tf1 + pr.tf2) * LOG10((SELECT n FROM {p}doccnt) / d.df)) AS raw_score,
         CAST(COUNT(*) AS BIGINT) AS common,
         CAST(SUM(pr.tf1 + pr.tf2) AS BIGINT) AS item_count
  FROM {p}pairs pr JOIN {p}dfreq d ON pr.entity_id = d.entity_id
  GROUP BY 1, 2),
{p}nc AS (
  SELECT document_version_id, CAST(COUNT(*) AS BIGINT) AS n FROM {p}tf GROUP BY 1),
{p}cand AS (
  SELECT s.document_version1_id, s.document_version2_id,
         s.raw_score * (1.0 + 3.0 * s.common * (0.5 / n1.n + 0.5 / n2.n)) AS score,
         s.common, s.item_count
  FROM {p}agg s
  JOIN {p}nc n1 ON s.document_version1_id = n1.document_version_id
  JOIN {p}nc n2 ON s.document_version2_id = n2.document_version_id)"""


# candidates from both entity families with score_type tags
def _all_cand_ctes() -> str:
    return (
        f"WITH {V_ENTITIES}, {V_ENTITIES2}, {_tf_chain('p_', 'entities')}, "
        f"{_tf_chain('l_', 'entities2')},\n"
        """all_cand AS (
  SELECT document_version1_id, document_version2_id, 'person' AS score_type,
         score, item_count FROM p_cand
  UNION ALL
  SELECT document_version1_id, document_version2_id, 'laboratory' AS score_type,
         score, item_count FROM l_cand)"""
    )


# --------------------------------------------------------------------------
# Spark-side shared builders
# --------------------------------------------------------------------------


def _entity_candidates(t: Tables, which: str = "person") -> DataFrame:
    """Spark twin of _tf_chain's {p}cand."""
    ents = t.entities() if which == "person" else t.entities_secondary_orders()
    tf = m.entity_tf(ents)
    doc_count = ents.select("document_version_id").distinct().count()
    capped = m.cap_entity_frequency(tf, 2000, doc_count)
    pairs = m.entity_pairs(capped)
    pairs_idf = sc.with_idf(pairs, tf, doc_count)
    return sc.score_entity_pairs(pairs_idf, tf, which, 1 if which == "person" else 10)


def _all_candidates(t: Tables) -> DataFrame:
    person = _entity_candidates(t, "person").select(
        "document_version1_id", "document_version2_id", "score_type", "score", "item_count"
    )
    lab = _entity_candidates(t, "laboratory").select(
        "document_version1_id", "document_version2_id", "score_type", "score", "item_count"
    )
    return person.unionByName(lab)


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------


@dataclass
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(spark_fn=fn, oracle=oracle)
        return fn

    return deco


# ---------------- core entity-matching spine ----------------


@register(
    "entity_tf",
    f"""WITH {V_ENTITIES}
SELECT document_version_id, entity_id, CAST(COUNT(*) AS BIGINT) AS tf
FROM entities GROUP BY 1, 2""",
)
def q_entity_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-(doc, entity) term frequency. Ref: EntitiesMatcherV2.scala:55-58."""
    return m.entity_tf(load_tables(spark, sf_dir).entities())


@register(
    "entity_pairs",
    f"""WITH {V_ENTITIES}, {_tf_chain('p_', 'entities')}
SELECT document_version1_id, document_version2_id, common, item_count FROM p_agg""",
)
def q_entity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/P9/P10 — frequency-guarded inverted-index self-join pair generation.
    Ref: EntitiesMatcherV2.scala:44-94."""
    t = load_tables(spark, sf_dir)
    ents = t.entities()
    tf = m.entity_tf(ents)
    doc_count = ents.select("document_version_id").distinct().count()
    capped = m.cap_entity_frequency(tf, 2000, doc_count)
    return m.entity_pairs(capped).groupBy(
        "document_version1_id", "document_version2_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("common"),
        F.sum(F.col("tf1") + F.col("tf2")).cast("long").alias("item_count"),
    )


@register(
    "entity_scores",
    f"""WITH {V_ENTITIES}, {_tf_chain('p_', 'entities')}
SELECT document_version1_id, document_version2_id,
       ROUND(score, 4) AS score, item_count FROM p_cand""",
)
def q_entity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 — TF-IDF pair scoring with team factor. Ref: EntitiesScorer.scala:39-67."""
    return _entity_candidates(load_tables(spark, sf_dir), "person").select(
        "document_version1_id",
        "document_version2_id",
        F.round("score", 4).alias("score"),
        "item_count",
    )


@register(
    "match_candidates",
    f"""WITH {V_DOCS}, {V_ENTITIES}, {_tf_chain('p_', 'entities')}
SELECT (c.document_version1_id * 1000000 + c.document_version2_id) * 100 + 1 AS id,
       c.document_version1_id, c.document_version2_id,
       'person' AS score_type, ROUND(c.score, 4) AS score, c.item_count,
       c.document_version1_id * 1000000 + c.document_version2_id AS pair_id
FROM p_cand c
JOIN documents_dim d1 ON c.document_version1_id = d1.document_version_id
JOIN documents_dim d2 ON c.document_version2_id = d2.document_version_id
WHERE (d1.document_type LIKE 'PROPOSAL%') <> (d2.document_type LIKE 'PROPOSAL%')
  AND (CASE WHEN d1.document_type LIKE 'PROPOSAL%'
            THEN YEAR(COALESCE(d1.date, TIMESTAMP '1900-01-01'))
            ELSE YEAR(COALESCE(d2.date, TIMESTAMP '1900-01-01')) END)
   <= (CASE WHEN d1.document_type LIKE 'PROPOSAL%'
            THEN YEAR(COALESCE(d2.date, TIMESTAMP '1900-01-01'))
            ELSE YEAR(COALESCE(d1.date, TIMESTAMP '1900-01-01')) END)
  AND NOT d1.obsolete AND NOT d2.obsolete""",
)
def q_match_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: matcher → scorer → TypeFilter (P2) → DateFilter (P3) →
    DocumentVersionIdFilter (P4) → MATCH_CANDIDATE rows.
    Ref: FullMatcherApp pipeline 1 (app/FullMatcherApp.scala:166-204)."""
    t = load_tables(spark, sf_dir)
    docs = t.documents_dim()
    cand = _entity_candidates(t, "person")
    cand = flt.type_filter(cand, docs)
    cand = flt.date_filter(cand, docs)
    valid = docs.where(~F.col("obsolete"))
    cand = flt.document_version_id_filter(cand, valid)
    return cand.select(
        "id",
        "document_version1_id",
        "document_version2_id",
        "score_type",
        F.round("score", 4).alias("score"),
        "item_count",
        "pair_id",
    )


@register(
    "multi_type_filter",
    _all_cand_ctes()
    + """,
typed AS (
  SELECT document_version1_id, document_version2_id, score_type,
         COUNT(DISTINCT score_type)
           OVER (PARTITION BY document_version1_id, document_version2_id) AS n_types
  FROM all_cand)
SELECT document_version1_id, document_version2_id, score_type
FROM typed WHERE n_types > 1 OR score_type = 'laboratory'""",
)
def q_multi_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — keep pairs matched by >1 score type or an allowed single type.
    Ref: MultipleTypeMatchFilter.scala:23-41."""
    cand = _all_candidates(load_tables(spark, sf_dir))
    return flt.multiple_type_match_filter(cand, ["laboratory"]).select(
        "document_version1_id", "document_version2_id", "score_type"
    )


@register(
    "matcher_number",
    _all_cand_ctes()
    + """
SELECT document_version1_id, document_version2_id,
       CAST(COUNT(*) AS BIGINT) AS matcher_count,
       CAST(COUNT(*) AS BIGINT) AS item_count
FROM all_cand GROUP BY 1, 2""",
)
def q_matcher_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — matcher-agreement count per pair. Ref: MatcherNumberMatcher.scala:32-46."""
    cand = _all_candidates(load_tables(spark, sf_dir))
    return m.matcher_number(cand).select(
        "document_version1_id",
        "document_version2_id",
        F.col("matcher_count").cast("long").alias("matcher_count"),
        F.col("item_count").cast("long").alias("item_count"),
    )


@register(
    "match_stats",
    _all_cand_ctes()
    + """,
mirrored AS (
  SELECT document_version1_id AS document_version_id, score_type, score FROM all_cand
  UNION ALL
  SELECT document_version2_id AS document_version_id, score_type, score FROM all_cand)
SELECT document_version_id, score_type,
       CAST(COUNT(*) AS BIGINT) AS match_count,
       ROUND(MIN(score), 4) AS score_min,
       ROUND(MAX(score), 4) AS score_max,
       ROUND(AVG(score), 4) AS score_mean,
       ROUND(COALESCE(STDDEV_POP(score), 0.0), 4) AS score_std,
       ROUND(QUANTILE_CONT(score, 0.5), 4) AS score_median
FROM mirrored GROUP BY 1, 2""",
)
def q_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — per-document match statistics. Ref: StatisticStage.scala:67-176."""
    cand = _all_candidates(load_tables(spark, sf_dir))
    s = st.match_statistics(cand)
    return s.select(
        "document_version_id",
        "score_type",
        "match_count",
        F.round("score_min", 4).alias("score_min"),
        F.round("score_max", 4).alias("score_max"),
        F.round("score_mean", 4).alias("score_mean"),
        F.round("score_std", 4).alias("score_std"),
        F.round("score_median", 4).alias("score_median"),
    )


@register(
    "match_ranks",
    _all_cand_ctes()
    + """,
mirrored AS (
  SELECT document_version1_id AS document_version_id,
         document_version2_id AS partner_id, score_type, score FROM all_cand
  UNION ALL
  SELECT document_version2_id AS document_version_id,
         document_version1_id AS partner_id, score_type, score FROM all_cand)
SELECT document_version_id, partner_id, score_type,
       ROUND(score, 4) AS score,
       CAST(RANK() OVER (PARTITION BY document_version_id, score_type
                         ORDER BY ROUND(score, 6) DESC, partner_id ASC) AS BIGINT) AS rank
FROM mirrored""",
)
def q_match_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6/W3 — partner ranking per document with RANK tie semantics.
    Ref: StatisticStage.scala:105-121."""
    from pyspark.sql.window import Window

    cand = _all_candidates(load_tables(spark, sf_dir))
    mirrored = st.mirror_candidates(cand)
    w = Window.partitionBy("document_version_id", "score_type").orderBy(
        F.round(F.col("score"), 6).desc(), F.col("partner_id").asc()
    )
    return mirrored.select(
        "document_version_id",
        "partner_id",
        "score_type",
        F.round("score", 4).alias("score"),
        F.rank().over(w).cast("long").alias("rank"),
    )


@register(
    "normalised_scores",
    f"""WITH {V_ENTITIES}, {_tf_chain('p_', 'entities')},
ordered AS (
  SELECT document_version1_id, document_version2_id, score,
         ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC,
                            document_version1_id, document_version2_id) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM p_cand),
factor AS (
  SELECT score AS f FROM ordered
  WHERE rn = GREATEST(1, CAST(FLOOR(n * 0.01) AS BIGINT)))
SELECT document_version1_id, document_version2_id,
       ROUND(LEAST(score / (SELECT f FROM factor) * 100.0, 100.0), 4) AS score
FROM ordered""",
)
def q_normalised_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — 99th-percentile normalisation. Ref: NormalisationStage.scala:54-58.

    The exact global-window variant (single partition) reproduces the
    reference; operators.normaliser also provides the percentile_approx
    scale path.
    """
    import math

    from pyspark.sql.window import Window

    cand = _entity_candidates(load_tables(spark, sf_dir), "person")
    n = cand.count()
    rank = max(1, math.floor(n * 0.01))
    w = Window.orderBy(
        F.round(F.col("score"), 6).desc(),
        F.col("document_version1_id"),
        F.col("document_version2_id"),
    )
    row = (
        cand.select("score", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == rank)
        .first()
    )
    factor = float(row["score"]) if row else 1.0
    return cand.select(
        "document_version1_id",
        "document_version2_id",
        F.round(
            F.least(F.col("score") / F.lit(factor) * 100.0, F.lit(100.0)), 4
        ).alias("score"),
    )


@register(
    "score_pivot",
    _all_cand_ctes()
    + """
SELECT document_version1_id, document_version2_id,
       ROUND(MAX(CASE WHEN score_type = 'person' THEN score END), 4) AS score_person,
       ROUND(MAX(CASE WHEN score_type = 'laboratory' THEN score END), 4) AS score_laboratory
FROM all_cand GROUP BY 1, 2""",
)
def q_score_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — wide per-pair score list via pivot. Ref: ScoreListStage.scala:57-109."""
    cand = _all_candidates(load_tables(spark, sf_dir)).withColumn(
        "pair_id",
        pair_id(F.col("document_version1_id"), F.col("document_version2_id")),
    )
    wide = sl.score_list(cand, ["person", "laboratory"])
    return wide.select(
        "document_version1_id",
        "document_version2_id",
        F.round("score_person", 4).alias("score_person"),
        F.round("score_laboratory", 4).alias("score_laboratory"),
    )


@register(
    "total_score",
    _all_cand_ctes()
    + """,
weights(score_type, weight) AS (VALUES ('person', 0.6), ('laboratory', 0.4)),
ctx AS (
  SELECT c.document_version1_id, c.document_version2_id, c.score,
         w.weight * c.score /
           MAX(c.score) OVER (PARTITION BY c.document_version2_id, c.score_type)
           * 100.0 AS contextual
  FROM all_cand c JOIN weights w ON c.score_type = w.score_type)
SELECT document_version1_id, document_version2_id,
       ROUND(SUM(score), 4) AS total_score,
       ROUND(SUM(contextual), 4) AS total_contextual_score
FROM ctx GROUP BY 1, 2""",
)
def q_total_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/W2 — weighted total + contextual score.
    Ref: TotalStatisticStage.scala:58-80."""
    t = load_tables(spark, sf_dir)
    cand = _all_candidates(t)
    weights = t.spark.createDataFrame(
        [("person", 0.6), ("laboratory", 0.4)], ["score_type", "weight"]
    )
    out = st.total_score(cand, weights)
    return out.select(
        "document_version1_id",
        "document_version2_id",
        F.round("total_score", 4).alias("total_score"),
        F.round("total_contextual_score", 4).alias("total_contextual_score"),
    )


@register(
    "dual_type_pairs",
    """WITH owned AS (
  SELECT DISTINCT l_orderkey AS document_version_id, l_partkey AS entity_id, 1 AS is_primary
  FROM lineitem WHERE l_linenumber = 1),
referenced AS (
  SELECT DISTINCT l_orderkey AS document_version_id, l_partkey AS entity_id, 0 AS is_primary
  FROM lineitem WHERE l_linenumber > 1),
u AS (SELECT DISTINCT * FROM (SELECT * FROM owned UNION ALL SELECT * FROM referenced))
SELECT DISTINCT a.entity_id,
       a.document_version_id AS document_version1_id,
       b.document_version_id AS document_version2_id
FROM u a JOIN u b
  ON a.entity_id = b.entity_id
 AND a.document_version_id < b.document_version_id
 AND a.is_primary + b.is_primary < 2""",
)
def q_dual_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — dual-type pair generation (owned vs referenced entities).
    Ref: DualTypeEntitiesMatcher.scala:60-137."""
    li = load_tables(spark, sf_dir).raw("lineitem")
    owned = li.where(F.col("l_linenumber") == 1).select(
        F.col("l_orderkey").alias("document_version_id"),
        F.col("l_partkey").alias("entity_id"),
    )
    referenced = li.where(F.col("l_linenumber") > 1).select(
        F.col("l_orderkey").alias("document_version_id"),
        F.col("l_partkey").alias("entity_id"),
    )
    return m.dual_type_entity_pairs(owned, referenced).select(
        "entity_id", "document_version1_id", "document_version2_id"
    ).distinct()


# ---------------- TPC-H-style headline queries (bench anchors) ----------------


@register(
    "pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — scan/agg throughput anchor."""
    li = load_tables(spark, sf_dir).raw("lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


# ---------------- LLM-data-pipeline plane ----------------


@register(
    "doc_token_stats",
    """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk,
         text FROM documents)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS token_count,
       CAST(length(text) AS BIGINT) AS char_count,
       ROUND(len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE), 4) AS distinct_ratio,
       ROUND(len(list_filter(tk, x -> list_contains(['the','a','an','of','and','or','to','in','is','are','for','on','with','by','at','from','as','that','this','it'], x))) / CAST(len(tk) AS DOUBLE), 4) AS stopword_ratio
FROM toks""",
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring over documents (LLM-data plane)."""
    return ts.with_token_stats(load_tables(spark, sf_dir).llm_documents())


@register(
    "doc_fingerprint",
    """SELECT doc_id,
       md5(array_to_string(list_filter(string_split(lower(text), ' '), x -> x <> ''), ' ')) AS fingerprint
FROM documents""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalised text)."""
    return ts.with_fingerprint(load_tables(spark, sf_dir).llm_documents())


@register(
    "dedup_exact",
    """WITH fp AS (
  SELECT doc_id,
         md5(array_to_string(list_filter(string_split(lower(text), ' '), x -> x <> ''), ' ')) AS fingerprint
  FROM documents)
SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS doc_count, MIN(doc_id) AS keep_id
FROM fp GROUP BY 1""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy."""
    return dd.exact_duplicates(load_tables(spark, sf_dir).llm_documents())


@register(
    "lang_id",
    """WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk FROM documents)
SELECT doc_id,
       CASE WHEN len(list_filter(tk, x -> list_contains(['the','a','an','of','and','or','to','in','is','are','for','on','with','by','at','from','as','that','this','it'], x))) / CAST(len(tk) AS DOUBLE) >= 0.03
            THEN 'en' ELSE 'unk' END AS predicted_lang
FROM toks""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-hit ratio)."""
    return ts.with_lang_id(load_tables(spark, sf_dir).llm_documents())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
