"""File-based text sources (S2 rebuild).

Reference: datasource/FileDataSource.scala:37-61 reads a JDBC list of
(document_version_id, file_path) then slurps each file on the executor
with ``Source.fromFile`` inside a map — a row-at-a-time anti-pattern.

Spark-first: ``spark.read.text(wholetext=True)`` over a directory glob
with ``input_file_name()`` recovers (path, text) in one distributed scan
with proper split planning; joining back to the id mapping is a plain
equi-join (AQE broadcasts the small side).  At 100 TB the path inventory
is itself a dataframe — ``read_text_files`` takes a ``base_glob`` so the
listing happens in the scan, never as a driver ``collect`` of paths; the
collect branch is kept only for small explicit lists (the reference's
contract: one JDBC query for the list, FileDataSource.scala:37-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: above this many paths, refuse the driver-collect branch — the caller
#: must pass ``base_glob`` (the scan-side listing) instead
MAX_COLLECT_PATHS = 100_000


def _uri_to_path(col):
    """``input_file_name()`` yields a percent-encoded file URI; recover
    the plain filesystem path so it equi-joins against raw path strings.
    ``url_decode`` is form-decoding (it would turn a literal ``+`` into a
    space), so literal ``+`` is pre-escaped to ``%2B`` first."""
    no_scheme = F.regexp_replace(col, "^file:(//)?", "")
    return F.url_decode(F.replace(no_scheme, F.lit("+"), F.lit("%2B")))


def read_text_dir(
    spark: SparkSession, base_glob: str, path_col: str = "file_path"
) -> DataFrame:
    """Distributed (file_path, text) scan of every file under a glob —
    no driver-side path list at any size."""
    return (
        spark.read.text(base_glob, wholetext=True)
        .withColumn(path_col, F.input_file_name())
        .withColumnRenamed("value", "text")
        .withColumn(path_col, _uri_to_path(F.col(path_col)))
    )


def read_text_files(
    spark: SparkSession,
    path_map: DataFrame,
    path_col: str = "file_path",
    base_glob: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """(document_version_id, file_path) → (document_version_id, text).

    With ``base_glob`` (the scale path): one distributed wholetext scan
    of the glob joined to the mapping — the path inventory never touches
    the driver.  Without it, the explicit path list is collected (the
    reference's semantics for its ~1e5-file corpus) but refused beyond
    ``MAX_COLLECT_PATHS`` so the anti-pattern cannot reach 100 TB scale
    silently.

    ``strict`` (default): a path_map row whose file did not appear in
    the scan fails the job at execution time with the offending path —
    matching the collect branch, where a missing file fails the read.
    ``strict=False`` keeps such rows with ``text`` NULL.
    """
    if base_glob is not None:
        texts = read_text_dir(spark, base_glob, path_col)
        return _join_texts(path_map, texts, path_col, strict)
    paths = [
        r[path_col]
        for r in path_map.select(path_col).limit(MAX_COLLECT_PATHS + 1).collect()
    ]
    if len(paths) > MAX_COLLECT_PATHS:
        raise ValueError(
            f"path_map exceeds {MAX_COLLECT_PATHS} files; pass base_glob= "
            "so the listing stays in the distributed scan"
        )
    if not paths:
        return path_map.select(
            "document_version_id", F.lit(None).cast("string").alias("text")
        ).limit(0)
    texts = (
        spark.read.text(paths, wholetext=True)
        .withColumn(path_col, F.input_file_name())
        .withColumnRenamed("value", "text")
        .withColumn(path_col, _uri_to_path(F.col(path_col)))
    )
    return _join_texts(path_map, texts, path_col, strict)


def _join_texts(
    path_map: DataFrame, texts: DataFrame, path_col: str, strict: bool
) -> DataFrame:
    """Left-join text onto the mapping; in strict mode an unresolved
    path fails the job at execution time (in-plan ``raise_error`` — zero
    extra jobs) instead of flowing downstream as a NULL text."""
    joined = path_map.join(texts, path_col, "left")
    text = F.col("text")
    if strict:
        text = F.when(
            text.isNull(),
            F.raise_error(
                F.concat(
                    F.lit("read_text_files: no scanned file matched path "),
                    F.col(path_col),
                )
            ),
        ).otherwise(text)
    return joined.select("document_version_id", text.alias("text"))


def read_csv_table(
    spark: SparkSession, path: str, header: bool = True, schema=None
) -> DataFrame:
    """S9 — CSV reference-data source (InstrumentInsert.scala:24-112 reads
    classpath instruments.csv row-by-row and JDBC-inserts; rebuild is one
    distributed read + whatever sink the caller picks)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def clean_full_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The reference's full_text cleaning before materialisation
    (FullMatcherApp.scala:90-92): strip control chars / collapse
    whitespace."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(text_col), r"[\x00-\x1f]+", " "), r"\s+", " "
    )
    return df.withColumn(text_col, F.trim(cleaned))
