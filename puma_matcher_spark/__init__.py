"""puma_matcher_spark — a PySpark-native rebuild of the FILL2030/puma-matcher
entity-matching engine, plus large-scale training-data-pipeline operators.

Design stance (SURVEY.md §7):

* Every operator is a pure function ``DataFrame -> DataFrame`` built from
  Catalyst column expressions — no row-at-a-time lambdas.  The reference's
  ``MapFunction``/``FlatMapFunction`` kernels are re-expressed as SQL
  aggregates, window functions and higher-order array functions so the whole
  plan stays inside whole-stage codegen.
* Pipelines are thin orchestration over DataFrames (`pipeline.Pipeline`),
  mirroring the reference's Stage/Pipeline/PipelineConfig surface
  (reference: matching/pipepline/Pipeline.scala) without its
  thread-and-sleep machinery — Spark's scheduler handles concurrency.
* Scale levers are explicit and reusable: frequency-capped self-joins
  (`operators.matcher.cap_entity_frequency`), broadcast dimension joins,
  AQE (enabled in `session.get_spark`), and approximate variants
  (`percentile_approx`, `approx_count_distinct`) for the 100 TB path.
"""

__version__ = "0.1.0"
