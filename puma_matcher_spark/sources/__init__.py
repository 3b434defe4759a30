from puma_matcher_spark.sources.testdata import Tables, load_tables  # noqa: F401
