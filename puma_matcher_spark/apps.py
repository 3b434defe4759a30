"""End-to-end application flows — the rebuild of the reference's driver
apps (app/FullMatcherApp.scala, OptimizerApp.scala,
PersonDeduplicatorApp.scala).

``run_full_matcher`` reproduces FullMatcherApp's shape on the fixture
corpus:

1. **match creator** pipeline — one PipelineConfig per entity family,
   stages Matcher → Scorer (filters applied pair-level after the
   aggregate, where they're cheapest);
2. **match saver** — union across configs (``as_data_source``),
   MultipleTypeMatchFilter, canonical persist + per-document statistics;
3. **optimizer** — weight training against derived labels +
   total/contextual scores.

Everything returns DataFrames; callers choose sinks
(persister.persist_parquet / sources.publish for blue/green).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from puma_matcher_spark.operators import filters as flt
from puma_matcher_spark.operators import matcher as m
from puma_matcher_spark.operators import scorer as sc
from puma_matcher_spark.operators import stats as st
from puma_matcher_spark.operators import weights as wt
from puma_matcher_spark.operators.persister import canonicalize_pairs, dedup_candidates
from puma_matcher_spark.pipeline import Pipeline, PipelineConfig, Stage
from puma_matcher_spark.schemas import EntityType
from puma_matcher_spark.sources.testdata import Tables, load_tables


@dataclass
class MatcherResult:
    candidates: DataFrame          # canonical MATCH_CANDIDATE rows
    statistics: DataFrame          # per-document stats
    weights: DataFrame             # trained score weights
    total_scores: DataFrame        # weighted totals per pair


def _family_stages(t: Tables) -> list[Stage]:
    """Matcher → Scorer → Filters for one entity family; family selection
    comes from the PipelineConfig params (FullMatcherApp.scala:104-201
    wires one config per entity type)."""

    def matcher(config: PipelineConfig, inputs: dict) -> DataFrame:
        if config.params["family"] == "person":
            ents = t.entities()
        else:
            # lab links must span both customer parities or the type
            # filter (XOR on custkey-parity-derived document_type) would
            # drop every same-customer pair
            ents = t.entities_secondary_orders().withColumn(
                "entity_id", F.floor(F.col("entity_id") / 2).cast("long")
            )
        tf = m.entity_tf(ents)
        doc_count = ents.select("document_version_id").distinct().count()
        capped = m.cap_entity_frequency(tf, 2000, doc_count)
        pairs = m.entity_pairs(capped)
        scored = sc.score_entity_pairs(
            sc.with_idf(pairs, tf, doc_count),
            tf,
            config.params["family"],
            EntityType.from_string(
                "person" if config.params["family"] == "person" else "laboratory"
            ).type_id,
        )
        return scored

    def filters(config: PipelineConfig, inputs: dict) -> DataFrame:
        docs = t.documents_dim()
        cand = inputs["scored"]
        cand = flt.type_filter(cand, docs)
        cand = flt.date_filter(cand, docs)
        return flt.document_version_id_filter(
            cand, docs.where(~F.col("obsolete"))
        )

    def normalisation(config: PipelineConfig, inputs: dict) -> DataFrame | None:
        # optional stage (Pipeline passes input through on None) — the
        # reference normalises per config before the editor; the approx
        # percentile is the scale path (W1)
        if not config.params.get("normalise", True):
            return None
        from puma_matcher_spark.operators.normaliser import (
            normalisation_factor,
            normalise_scores,
        )

        cand = inputs["filtered"]
        factor = normalisation_factor(cand, percentile=0.99, exact=False)
        return normalise_scores(cand, factor)

    from puma_matcher_spark.schemas import FrameType

    return [
        Stage(name="matcher", input=[], output="scored", fn=matcher,
              frame_type=FrameType.MATCH_CANDIDATE),
        Stage(name="filters", input=["scored"], output="filtered", fn=filters,
              frame_type=FrameType.MATCH_CANDIDATE),
        Stage(name="normalisation", input=["filtered"], output="editor_output",
              fn=normalisation, optional=True),
    ]


def run_full_matcher(
    spark: SparkSession, sf_dir: str, train_weights: bool = True
) -> MatcherResult:
    t = load_tables(spark, sf_dir)

    # pipeline 1 — match creator, one config per entity family
    creator = Pipeline("match creator", _family_stages(t))
    creator.run(
        [
            PipelineConfig(name="person", params={"family": "person"}),
            PipelineConfig(name="laboratory", params={"family": "laboratory"}),
        ],
        parallel=True,
    )

    # pipeline 2 — match saver over the cross-config union
    all_cand = creator.as_data_source("editor_output")
    filtered = flt.multiple_type_match_filter(all_cand, ["laboratory"])
    canonical = dedup_candidates(canonicalize_pairs(filtered))
    statistics = st.match_statistics(canonical)

    # optimizer — weights against derived accepted labels
    if train_weights:
        training = (
            canonical.where(F.col("pair_id") % 7 == 0)
            .select(
                F.col("document_version1_id").alias("proposal_id"),
                F.col("document_version2_id").alias("publication_id"),
                F.lit(True).alias("accepted"),
            )
            .distinct()
        )
        weights = wt.best_weights(
            spark, canonical, training, ["person", "laboratory"], step=0.25
        )
    else:
        weights = spark.createDataFrame(
            [("person", 0.5), ("laboratory", 0.5)], ["score_type", "weight"]
        )
    totals = st.total_score(canonical, weights)
    return MatcherResult(
        candidates=canonical,
        statistics=statistics,
        weights=weights,
        total_scores=totals,
    )


@dataclass
class CurationAppResult:
    clean: DataFrame
    stage_counts: dict


def load_manifest_documents(
    spark: SparkSession,
    manifest: str,
    doc_ids: list[int] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Documents via the native ``manifest_text`` DataSource
    (sources/pydatasource.py) in the curation pipeline's input shape
    (doc_id, text, lang, source).

    The ``doc_ids`` filter is applied as a plain ``isin`` predicate —
    Spark 4's planner pushes it into the source (``pushFilters``), so
    excluded manifest entries are pruned BEFORE their files are stat-ed
    or opened (a missing file behind a filtered-out entry never errors,
    even with strict=True — the e2e pushdown probe in
    tests/test_apps.py relies on this).  ``lang`` comes from the SHARED
    lang-ID kernel (llmdata.textstats.lang_id_label), so the manifest
    and parquet ingest paths can never label the same text differently;
    ``source`` is the file's parent directory (the manifest analogue of
    the fixture's source column).

    Reference: datasource/FileDataSource.scala:37-61 feeding
    FullMatcherApp's full_text materialization.
    """
    from puma_matcher_spark.llmdata.textstats import lang_id_label
    from puma_matcher_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("manifest_text")
        .option("manifest", manifest)
        .option("strict", str(strict).lower())
        .load()
    )
    if doc_ids is not None:
        df = df.where(F.col("doc_id").isin([int(i) for i in doc_ids]))
    return df.select(
        "doc_id",
        "text",
        lang_id_label(F.col("text")).alias("lang"),
        F.element_at(F.split("file_path", "/"), -2).alias("source"),
    )


def run_curation_app(
    spark: SparkSession,
    sf_dir: str | None = None,
    out_root: str | None = None,
    source: str = "parquet",
    manifest: str | None = None,
    doc_ids: list[int] | None = None,
) -> CurationAppResult:
    """End-to-end training-data curation driver — the llmdata twin of
    ``run_full_matcher``: load → exact + near dedup + quality filter
    (llmdata.pipeline) → exact-substring span cutting (llmdata.dedup)
    → optional per-source Hive-partitioned publish.

    ``source``: ``"parquet"`` loads the fixture documents table from
    ``sf_dir``; ``"manifest_text"`` ingests through the native Spark-4
    Python DataSource (split-planned, pushdown-pruned — see
    :func:`load_manifest_documents`), carrying the connector through a
    real pipeline instead of only its unit tests.

    The audit counts are computed lazily (1-row frames) and collected in
    one pass at the end, so the whole app is a handful of jobs, not one
    per stage.  When ``out_root`` is given the cleaned corpus lands
    partitioned by source (readers prune by partition), written before
    the counts are resolved so the write reuses the same plan — and for
    the manifest source the cached connector input is then RELEASED and
    ``clean`` re-pointed at the published parquet (blue/green hand-off).
    With manifest input and no ``out_root`` the input cache is kept for
    the returned lazy frame; callers done with it own the unpersist.
    """
    from puma_matcher_spark.llmdata.dedup import cut_spans, duplicate_spans
    from puma_matcher_spark.llmdata.pipeline import curate_documents
    from puma_matcher_spark.operators.persister import persist_partitioned

    if source == "manifest_text":
        if manifest is None:
            raise ValueError("source='manifest_text' requires manifest=")
        # persist: the curation DAG references the input many times
        # (dedup semi-joins, span cutting, audit counts) and every
        # reference re-executes a Python DataSource scan — unlike a
        # parquet scan there is no cheap re-read, so materialize once
        # (the reference app materializes full_text the same way,
        # FullMatcherApp.scala); measured 36 s → ~2 s on a 5-doc corpus
        docs = load_manifest_documents(spark, manifest, doc_ids=doc_ids).persist()
    elif source == "parquet":
        if sf_dir is None:
            raise ValueError("source='parquet' requires sf_dir")
        docs = load_tables(spark, sf_dir).llm_documents()
    else:
        raise ValueError(f"unknown curation source: {source!r}")
    res = curate_documents(docs, eager_counts=False)
    spans = duplicate_spans(res.clean, shingle_n=5)
    cut = cut_spans(res.clean, spans)
    final = (
        res.clean.select("doc_id", "lang", "source")
        .join(cut, "doc_id")
        .select("doc_id", "lang", "source", "clean_text", "n_tokens_removed")
    )
    if out_root is not None:
        persist_partitioned(final, out_root, ["source"])
    counts = {k: df.first()["n"] for k, df in res.stage_counts.items()}
    counts["tokens_cut"] = int(
        cut.agg(F.sum("n_tokens_removed").alias("n")).first()["n"] or 0
    )
    if source == "manifest_text" and out_root is not None:
        # all heavy reuse of the cached connector input is done (counts
        # are resolved, the corpus is published): release the executor
        # storage and hand the caller the published parquet instead —
        # the blue/green pattern, and cheaper for them than re-reading
        # the Python source (column order restated: partition columns
        # come back last on a partitioned read)
        docs.unpersist()
        final = spark.read.parquet(out_root).select(
            "doc_id", "lang", "source", "clean_text", "n_tokens_removed"
        )
    return CurationAppResult(clean=final, stage_counts=counts)


@dataclass
class IngestAppResult:
    accepted: DataFrame    # batch docs admitted to the corpus
    stage_counts: dict


def run_incremental_ingest_app(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    jaccard_threshold: float = 0.8,
    min_tokens: int = 5,
    out_root: str | None = None,
    collect_counts: bool = True,
    corpus_index=None,
) -> IngestAppResult:
    """Daily-ingest driver: admit a NEW document batch against the
    existing corpus — the incremental twin of ``run_curation_app``,
    composed so every stage is batch-sized, never corpus-sized:

    1. exact dedup vs corpus + within batch (fingerprint anti-join,
       llmdata.dedup.incremental_ingest);
    2. near-dup vs corpus: batch×corpus LSH candidates
       (minhash_incremental_pairs) verified by exact Jaccard on the
       candidate pairs only, survivors dropped;
    3. quality gate (token count) on what remains;
    4. optional blue/green publish of the accepted batch.

    The corpus side can be either raw text (``corpus``) or a
    precomputed :class:`puma_matcher_spark.llmdata.dedup.DedupIndex`
    (``corpus_index`` — fingerprints, band keys, shingles).  The two
    paths are result-identical (same kernels, test-pinned); the index
    path never touches corpus text, which is what makes repeated calls
    (the streaming ingest driver) corpus-recompute-free.
    """
    from puma_matcher_spark.llmdata import dedup as dd
    from puma_matcher_spark.llmdata.textstats import with_token_stats
    from puma_matcher_spark.sources.publish import publish

    if corpus_index is None:
        if corpus is None:
            raise ValueError("need corpus text or corpus_index")
        corpus_index = dd.build_dedup_index(corpus.select("doc_id", "text"))

    # stage counts are diagnostics: each is an EXTRA action re-running
    # the joins above it — callers on a hot path (the streaming ingest
    # driver) pass collect_counts=False and pay for one job per batch
    counts: dict = {}
    if collect_counts:
        counts["batch_in"] = batch.count()

    fresh_ids = dd.incremental_ingest_indexed(
        batch, corpus_index.fingerprints
    ).select("doc_id")
    docs1 = batch.join(fresh_ids, "doc_id", "left_semi")
    if collect_counts:
        counts["after_exact"] = docs1.count()

    cand = dd.minhash_incremental_pairs_indexed(docs1, corpus_index.band_keys)
    # exact verification on candidate pairs only: rename so the shared
    # jaccard kernel sees (doc1, doc2) over the union shingle frame
    pairs = cand.select(
        F.col("new_doc_id").alias("doc1_id"),
        F.col("corpus_doc_id").alias("doc2_id"),
    )
    both_sh = dd.shingles(docs1.select("doc_id", "text")).unionByName(
        corpus_index.shingles
    )
    verified = dd.jaccard_for_pairs_from_shingles(both_sh, pairs).where(
        F.col("jaccard") >= jaccard_threshold
    )
    near_dup_ids = verified.select(F.col("doc1_id").alias("doc_id")).distinct()
    docs2 = docs1.join(near_dup_ids, "doc_id", "left_anti")
    if collect_counts:
        counts["after_near_dup"] = docs2.count()

    stats = with_token_stats(docs2)
    accepted = docs2.join(
        stats.where(F.col("token_count") >= min_tokens).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    if collect_counts:
        counts["accepted"] = accepted.count()

    if out_root is not None:
        publish(accepted, out_root)
    return IngestAppResult(accepted=accepted, stage_counts=counts)


def run_streaming_ingest_app(
    spark: SparkSession,
    manifest: str,
    corpus: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.8,
    min_tokens: int = 5,
    index_compact_every: int | None = 16,
    max_rows_per_trigger: int | None = None,
):
    """Continuous-ingest driver — the streaming composition of the two
    connectors built this rebuild: the native ``manifest_text`` stream
    reader tails manifest appends (exactly-once row-count offsets,
    sources/pydatasource.py) and every micro-batch runs the SAME
    admission pipeline as :func:`run_incremental_ingest_app` (exact
    anti-join vs corpus, batch×corpus LSH near-dup verify, quality
    gate) inside ``foreachBatch``.

    Accepted documents land in ``out_root/batch_id=<id>`` partitions
    with overwrite — the idempotent-sink recipe
    (streaming/events.py:write_stream_idempotent): a replayed batch
    after a crash rewrites its own partition instead of duplicating
    rows.  ``availableNow`` trigger: each call drains everything
    appended since the last committed offset, then stops — the
    schedulable version of the reference's polling ingest
    (FileDataSource.scala feeding the matcher pipeline on new data).

    Cross-batch dedup (ADVICE r6) runs on the PRECOMPUTED-INDEX pattern
    (round 8): each batch writes its accepted documents' DedupIndex rows
    (fingerprints / LSH band keys / shingles — hash- and shingle-width,
    never text) to ``out_root/_index/<component>/batch_id=<id>``; later
    batches union those index rows into the corpus side instead of
    re-reading and re-fingerprinting the full admitted TEXT per
    micro-batch (which was corpus-growth-linear in compute per batch and
    cumulatively quadratic over a long manifest tail).  The static
    corpus's index is built once per app start.  The ``_index``
    underscore prefix keeps Spark's partition discovery on ``out_root``
    from seeing it.  The ``batch_id < current`` filter keeps a
    crash-REPLAYED batch from seeing its own previous output and
    self-rejecting everything (the overwrite sink makes the replay
    idempotent instead); sink existence is probed explicitly through the
    Hadoop FS API, so a corrupt or unreadable sink PROPAGATES instead of
    silently degrading dedup to static-corpus-only (ADVICE r7).

    Returns the started StreamingQuery; callers ``awaitTermination``.
    """
    from puma_matcher_spark.llmdata import dedup as dd
    from puma_matcher_spark.sources.pydatasource import register

    register(spark)
    reader = spark.readStream.format("manifest_text").option(
        "manifest", manifest
    )
    if max_rows_per_trigger:
        # r12 drain-granularity knob (sidecar study only — the benched
        # workload and every production default drain in one batch).
        # NOTE: Python micro-batch sources do not support availableNow
        # (Spark falls back to single-batch execution, which would STOP
        # after the first capped batch and strand the backlog), so the
        # capped mode runs on a tight processingTime trigger and the
        # CALLER stops the query once the sink is complete — see
        # scripts/streaming_trigger_study.py.
        reader = reader.option("max_rows_per_trigger", str(max_rows_per_trigger))
    stream = reader.load()
    # the static corpus never changes across micro-batches: index it once
    # and PERSIST each component (MEMORY_AND_DISK) — without the persist,
    # every micro-batch would re-derive the static corpus's fingerprints
    # / 128 minhashes / shingles from text, making per-batch cost scale
    # with the static corpus instead of the batch.  Materialization is
    # lazy (the first batch pays it); the cache lives for the session,
    # the natural lifetime of the availableNow drain.
    static_index = dd.build_dedup_index(corpus.select("doc_id", "text"))
    for _df in (
        static_index.fingerprints,
        static_index.band_keys,
        static_index.shingles,
    ):
        _df.persist()
    index_root = f"{out_root}/_index"
    components = ("fingerprints", "band_keys", "shingles")

    def _path_exists(path: str) -> bool:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            # a compaction that crashed between its two renames leaves
            # the component parked at .compact-old and nothing at path —
            # restore it before reading (maintenance.compact_batch_index
            # applies the same recovery on its next run)
            parked = jvm.org.apache.hadoop.fs.Path(path + ".compact-old")
            if fs.exists(parked):
                fs.rename(parked, p)
        return fs.exists(p)

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the admission pipeline takes several actions over the
        # batch (anti-joins, shingle build); without a barrier each one
        # re-runs the Python DataSource reader — re-reading every file
        # per action (the measured 36s->2s trap, see sources/pydatasource)
        docs = batch_df.select("doc_id", "text").persist()
        sess = batch_df.sparkSession

        def _with_prior(static_df: DataFrame, c: str, cols: tuple) -> DataFrame:
            # probe each component explicitly: a missing dir means no
            # COMMITTED batch wrote it (committed batches write all
            # three before the checkpoint commit; a mid-write crash's
            # partial rows are excluded by batch_id < current on
            # replay) — any other read failure propagates
            path = f"{index_root}/{c}"
            if not _path_exists(path):
                return static_df
            prior = (
                sess.read.parquet(path)
                .where(F.col("batch_id") < batch_id)
                .select(*cols)
            )
            return static_df.unionByName(prior)

        idx = dd.DedupIndex(
            fingerprints=_with_prior(
                static_index.fingerprints,
                "fingerprints",
                ("doc_id", "fingerprint"),
            ),
            band_keys=_with_prior(
                static_index.band_keys,
                "band_keys",
                ("doc_id", "band", "band_key"),
            ),
            shingles=_with_prior(
                static_index.shingles, "shingles", ("doc_id", "shingle")
            ),
        )
        try:
            res = run_incremental_ingest_app(
                docs,
                corpus_index=idx,
                jaccard_threshold=jaccard_threshold,
                min_tokens=min_tokens,
                collect_counts=False,  # diagnostics off the hot path
            )
            res.accepted.write.mode("overwrite").parquet(
                f"{out_root}/batch_id={batch_id}"
            )
            # index the batch's ACCEPTED docs for future batches — read
            # the just-written partition back (one cheap parquet scan)
            # instead of re-running the whole admission DAG three times
            accepted = sess.read.parquet(
                f"{out_root}/batch_id={batch_id}"
            ).select("doc_id", "text")
            aidx = dd.build_dedup_index(accepted)
            for c, df in (
                ("fingerprints", aidx.fingerprints),
                ("band_keys", aidx.band_keys),
                ("shingles", aidx.shingles),
            ):
                df.write.mode("overwrite").parquet(
                    f"{index_root}/{c}/batch_id={batch_id}"
                )
            # bound the index's directory/file count over a long manifest
            # tail: every k batches fold all COMMITTED per-batch
            # partitions (batch_id < current — the in-flight batch stays
            # separate so a crash replay can still exclude its own rows)
            # into one merged batch_id=<current-1> partition via the
            # atomic staging swap.  Without this, _with_prior's union
            # lists/opens one directory per historical batch even though
            # the ROW volume is hash-width-flat (r8 verdict finding #1).
            if index_compact_every and (
                (batch_id + 1) % index_compact_every == 0
            ):
                from puma_matcher_spark.sources.maintenance import (
                    compact_batch_index,
                )

                for c in components:
                    p = f"{index_root}/{c}"
                    if _path_exists(p):
                        compact_batch_index(sess, p, fold_below=batch_id)
        finally:
            docs.unpersist()

    writer = stream.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if max_rows_per_trigger:
        writer = writer.trigger(processingTime="0 seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
