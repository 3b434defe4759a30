"""File-based text sources (S2 rebuild).

Reference: datasource/FileDataSource.scala:37-61 reads a JDBC list of
(document_version_id, file_path) then slurps each file on the executor
with ``Source.fromFile`` inside a map — a row-at-a-time anti-pattern.

Spark-first: ``spark.read.text(wholetext=True)`` over the path list with
``input_file_name()`` recovers (path, text) in one distributed scan with
proper split planning; joining back to the id mapping is a broadcast
join.  At 100 TB the file listing itself is driver-side metadata —
partition the path list and prefer fewer, larger files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_files(
    spark: SparkSession, path_map: DataFrame, path_col: str = "file_path"
) -> DataFrame:
    """(document_version_id, file_path) → (document_version_id, text).

    ``path_map`` must be small enough to collect its path list (same
    contract as the reference, which runs one JDBC query for it).
    """
    paths = [r[path_col] for r in path_map.select(path_col).collect()]
    if not paths:
        return path_map.select(
            "document_version_id", F.lit(None).cast("string").alias("text")
        ).limit(0)
    texts = (
        spark.read.text(paths, wholetext=True)
        .withColumn(path_col, F.input_file_name())
        .withColumnRenamed("value", "text")
    )
    # input_file_name returns a URI; normalise to match raw paths
    texts = texts.withColumn(
        path_col, F.regexp_replace(path_col, "^file:(//)?", "")
    )
    return path_map.join(texts, path_col, "left").select(
        "document_version_id", "text"
    )


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
