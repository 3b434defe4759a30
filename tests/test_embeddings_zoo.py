"""Embeddings-zoo broad parity (round 8): every oracled query over the
``embeddings`` table must match DuckDB on an adversarial corpus — NULL
embedding, empty array, zero-norm vector, zero-PREFIX vectors (valid full
vector, all-zero first 32 dims), extreme/tiny magnitudes, exact duplicates,
antipodal pairs, NULL and negative labels.

The probe behind this test caught eleven latent defects in the
similarity/ANN plane, all invisible on the standard fixtures:

* ANSI DIVIDE_BY_ZERO on zero-norm vectors in every cosine path
  (brute_force_topk, cosine_threshold_pairs → semantic_dedup,
  embedding_dup_clusters/near_dups, lsh_bucketed_topk, prefix_rerank),
* DIVIDE_BY_ZERO on a zero-norm *centroid* in centroid_drift (antipodal
  valid vectors averaging to zero),
* a KMeans-fit NPE on NULL embeddings in ivf_topk,
* DuckDB list_inner_product crashes on NULL/empty arrays in the
  embedding_outliers / embedding_int8_topk oracles,
* nearest_centroid_confusion diverging on NULL labels (Spark's
  null-unsafe centroid join dropped the NULL-label centroid while the
  oracle kept it) and on NULL distances (Spark sorts NULL first ASC,
  DuckDB defaults NULLS LAST).

The fix is one shared validity contract (llmdata/similarity.py
``valid_vectors`` / ``nonempty_vectors``, mirrored in the oracles as
queries._EMB_VALID / _EMB_NONEMPTY) plus ``cosine_or_zero`` for coarse
prefix scores — this test pins all of it.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from puma_matcher_spark.oracle import compare_query
from puma_matcher_spark.queries import REGISTRY

DIM = 64  # matches the registered geometry: 64-dim LSH planes, 32-dim prefix


def _vec(*pairs):
    e = [0.0] * DIM
    for i, x in pairs:
        e[i] = float(x)
    return e


ZOO = [
    # (vec_id, embedding, label)
    (0, _vec((0, 1.0)), 0),
    (1, _vec((0, 1.0)), 0),                       # exact duplicate of 0
    (2, _vec((0, 0.999), (1, 0.04)), 0),           # near-duplicate of 0
    (3, _vec((1, 1.0)), 1),
    (4, [0.0] * DIM, 1),                           # zero-norm vector
    (5, None, 1),                                  # NULL embedding
    (6, [], 2),                                    # empty array
    (7, _vec((2, 1e6)), 2),                        # extreme magnitude
    (8, _vec((2, 1e-6)), 2),                       # tiny magnitude
    (9, _vec((3, -1.0)), None),                    # NULL label
    (10, _vec((0, -1.0)), -1),                     # antipode of 0
    (11, _vec((4, 0.6), (5, 0.8)), 3),
    (12, _vec((4, 0.6), (5, 0.8)), 3),             # duplicate of 11
    (13, _vec((6, 1.0), (7, 1.0)), 4),
    (14, _vec((40, 1.0), (50, 0.5)), 4),           # zero PREFIX (dims 0-31)
    (15, _vec((35, -0.7), (62, 0.2)), 0),          # zero prefix, negative tail
    (16, _vec((0, float("nan"))), 5),              # NaN component
    (17, _vec((0, 1.0), (8, float("nan"))), 5),    # NaN amid real values
    (18, _vec((1, float("inf")), (2, 1.0)), 5),    # Inf component
    (19, [1.0, None] + [0.0] * (DIM - 2), 5),      # NULL component (r8 ADVICE #1)
]


def write_zoo(tmp_path) -> str:
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in ZOO], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in ZOO], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in ZOO], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    base = " ".join(f"t{j}" for j in range(40))
    docs = [
        (0, base, "en", "zooA"),
        (1, base, "en", "zooB"),
        (2, "", "en", "zooA"),
        (3, None, "en", "zooB"),
        (4, "short text", "de", "zooA"),
    ]
    dtbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array([d[2] for d in docs]),
            "source": pa.array([d[3] for d in docs]),
            "n_chars": pa.array([len(d[1] or "") for d in docs], pa.int64()),
        }
    )
    pq.write_table(dtbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.slow
def test_embeddings_zoo_broad_parity(spark, tmp_path):
    sf = write_zoo(tmp_path)
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    failures, n_checked = [], 0
    for name, spec in REGISTRY.items():
        if spec.oracle is None or "embedding" not in spec.oracle:
            continue
        try:
            res = compare_query(
                spark, con, name, spec.spark_fn, spec.oracle, sf
            )
        except Exception as e:  # noqa: BLE001 — any crash IS the failure
            failures.append(f"{name}: EXC {type(e).__name__}: {str(e)[:200]}")
            continue
        n_checked += 1
        if not res.ok:
            failures.append(f"{name}: {res}")
    assert n_checked >= 12, f"zoo scope shrank: only {n_checked} checked"
    assert not failures, "embeddings-zoo divergence:\n" + "\n".join(failures)


def test_valid_vectors_predicate_semantics(spark):
    """The shared validity predicate drops exactly NULL / empty /
    all-zero / non-finite embeddings and keeps everything else (incl.
    tiny, huge-but-finite and negative components)."""
    from puma_matcher_spark.llmdata import similarity as sim

    df = spark.createDataFrame(
        [(r[0], r[1]) for r in ZOO], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    kept = {r["vec_id"] for r in sim.valid_vectors(df).collect()}
    assert kept == set(range(20)) - {4, 5, 6, 16, 17, 18, 19}
    nonempty = {r["vec_id"] for r in sim.nonempty_vectors(df).collect()}
    assert nonempty == set(range(20)) - {5, 6, 16, 17, 18, 19}


def test_invalid_vectors_are_singletons_in_dup_clusters(spark, tmp_path):
    """embedding_dup_clusters keeps NULL/empty/zero-norm vectors in its
    output as their own canonical singletons — excluded from pairing,
    never silently dropped from the corpus enumeration."""
    sf = write_zoo(tmp_path)
    out = REGISTRY["embedding_dup_clusters"].spark_fn(spark, sf)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == set(range(20))
    for bad in (4, 5, 6, 16, 17, 18, 19):
        assert rows[bad]["canonical_id"] == bad and rows[bad]["is_canonical"]


def test_zero_prefix_vectors_survive_prefix_rerank(spark, tmp_path):
    """A valid full vector with an all-zero 32-dim prefix must flow
    through the coarse stage (cosine_or_zero → 0.0 coarse score), not
    crash it — and remains reachable in the fine stage."""
    sf = write_zoo(tmp_path)
    out = REGISTRY["embedding_prefix_rerank"].spark_fn(spark, sf)
    rows = out.collect()
    assert rows, "prefix rerank returned nothing on the zoo"
    # query vec_id 0 exists (0 % 50 == 0); invalid ids never appear
    ids = {r["neighbor_id"] for r in rows}
    assert not ids & {4, 5, 6, 16, 17, 18, 19}
