"""Generate a seeded sf1.0 fixture TWIN (10x sf0.1) under
scripts/data-sf1/ — the cheapest empirical proxy for the 100x design
claims: run `SPARK_GRAFT_SF_DIR=scripts/data-sf1 python bench.py` and
compare per-query times against sf0.1 to get scaling exponents
(recorded in PLANS.md §round-6 sf1 scaling).

The driver's own testdata (TESTDATA.md) is read-only and tops out at
sf0.1; this twin reproduces the documented star schema + value domains
(measured from /root/testdata/sf0.1 — same columns, dtypes, categorical
domains, key ranges, text token vocabulary, planted exact/near dups)
with numpy seed 42.  It is NOT byte-compatible with the driver fixture
and is gitignored; correctness always comes from the driver's own SFs.

Usage: python scripts/gen_sf1.py [out_dir] [scale]   # default 10x sf0.1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data-sf1"
)
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0  # x sf0.1

N_CUST = int(15_000 * SCALE)
N_SUPP = int(1_000 * SCALE)
N_PART = int(20_000 * SCALE)
N_ORD = int(150_000 * SCALE)
N_LINE = int(600_000 * SCALE)
N_EVT = int(1_000_000 * SCALE / 10)  # events grew 10x 0.01->0.1 already
N_DOC = int(5_000 * SCALE)
N_EMB = int(2_000 * SCALE)

rng = np.random.default_rng(42)
DAY = np.timedelta64(1, "D")


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def ts_col(arr_days: np.ndarray, start: str) -> pa.Array:
    base = np.datetime64(start)
    return pa.array(base + arr_days * DAY, type=pa.timestamp("us"))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": regions,
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i:02d}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )

    seg = ["BUILDING", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(1, N_CUST + 1), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(1, N_CUST + 1)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, N_CUST), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, N_CUST), 2),
                "c_mktsegment": pa.array(
                    np.array(seg)[rng.integers(0, 5, N_CUST)]
                ),
            }
        ),
    )
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(1, N_SUPP + 1), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(1, N_SUPP + 1)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, N_SUPP), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, N_SUPP), 2),
            }
        ),
    )

    ptypes = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(1, N_PART + 1), pa.int64()),
                "p_name": [f"part {i} colour{i % 92}" for i in range(1, N_PART + 1)],
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, N_PART)]
                ),
                "p_type": pa.array(
                    np.array(ptypes)[rng.integers(0, 6, N_PART)]
                ),
                "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
                "p_retailprice": np.round(rng.uniform(900, 2100, N_PART), 2),
            }
        ),
    )

    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o_days = rng.integers(0, 2404, N_ORD)  # 1995-01-01 .. 2001-08-01
    o_status = np.array(["O", "F", "P"])[
        rng.choice(3, N_ORD, p=[0.49, 0.49, 0.02])
    ]
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, N_ORD + 1), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(1, N_CUST + 1, N_ORD), pa.int64()
                ),
                "o_orderstatus": pa.array(o_status),
                "o_totalprice": np.round(rng.uniform(850, 480000, N_ORD), 2),
                "o_orderdate": ts_col(o_days, "1995-01-01"),
                "o_orderpriority": pa.array(
                    np.array(prio)[rng.integers(0, 5, N_ORD)]
                ),
            }
        ),
    )

    l_order = rng.integers(1, N_ORD + 1, N_LINE)
    ship_lag = rng.integers(1, 122, N_LINE)
    rf = np.array(["N", "A", "R"])[rng.choice(3, N_LINE, p=[0.5, 0.25, 0.25])]
    ls = np.array(["O", "F"])[rng.integers(0, 2, N_LINE)]
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_order, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(1, N_PART + 1, N_LINE), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(1, N_SUPP + 1, N_LINE), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, N_LINE), pa.int32()
                ),
                "l_quantity": rng.integers(1, 51, N_LINE).astype("float64"),
                "l_extendedprice": np.round(
                    rng.uniform(900, 105000, N_LINE), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, N_LINE) / 100, 2),
                "l_tax": np.round(rng.integers(0, 9, N_LINE) / 100, 2),
                "l_returnflag": pa.array(rf),
                "l_linestatus": pa.array(ls),
                "l_shipdate": ts_col(
                    o_days[l_order - 1] + ship_lag, "1995-01-01"
                ),
            }
        ),
    )

    etypes = np.array(["view", "click", "purchase", "signup", "error"])
    evt_ts = np.datetime64("2024-01-01") + (
        rng.integers(0, 30 * 86_400_000, N_EVT).astype("timedelta64[ms]")
    )
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(1, N_EVT + 1), pa.int64()),
                "ts": pa.array(np.sort(evt_ts), pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, N_CUST // 10, N_EVT), pa.int64()
                ),
                "event_type": pa.array(
                    etypes[rng.choice(5, N_EVT, p=[0.4, 0.3, 0.1, 0.1, 0.1])]
                ),
                "value": np.round(rng.exponential(60, N_EVT), 2),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)]
                ),
            }
        ),
    )

    # documents: same 31-token query-words vocabulary as the fixture,
    # ~1.6% exact dups + ~1% near dups (one token swapped)
    vocab = np.array(
        (
            "a batch part spark line column order small sort fast value scan "
            "slow hash group agg filter query big key window row table stream "
            "merge data join shuffle plan cache scala"
        ).split()
    )
    texts: list[str] = []
    for i in range(N_DOC):
        n = int(rng.integers(8, 116))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n)]))
    n_exact = N_DOC // 64
    n_near = N_DOC // 100
    for j in range(n_exact):  # exact dup: copy an earlier doc verbatim
        texts[N_DOC - 1 - j] = texts[int(rng.integers(0, N_DOC // 2))]
    for j in range(n_near):  # near dup: one token substituted
        src = texts[int(rng.integers(0, N_DOC // 2))].split()
        src[int(rng.integers(0, len(src)))] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[N_DOC // 2 + j] = " ".join(src)
    langs = np.array(["en", "fr", "de", "es", "zh"])
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(1, N_DOC + 1), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs[rng.integers(0, 5, N_DOC)]),
                "source": pa.array(
                    [f"src{i}" for i in rng.integers(0, 20, N_DOC)]
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    # the driver fixture's embeddings are UNIT-NORMALIZED (measured:
    # norm 1.0 ± 0.0 at sf0.01/sf0.1) — match that domain, else ANN
    # studies on this twin misreport (int8 ranks by dot product, which
    # only agrees with cosine ranking on unit vectors)
    emb = rng.standard_normal((N_EMB, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True).astype("float32")
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(1, N_EMB + 1), pa.int64()),
                "embedding": pa.array(
                    list(emb), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    rng.integers(0, 10, N_EMB), pa.int32()
                ),
            }
        ),
    )

    # CLUSTERED twin (VERDICT r7 #5): the isotropic study above is the
    # recall FLOOR (IVF recall ~ probe fraction by construction when
    # vectors have no cluster structure); production embeddings are
    # clustered, where IVF cells align with real density and recall
    # should beat the floor.  Seeded Gaussian mixture: 16 unit centers
    # (random 64-d directions are near-orthogonal), within-cluster noise
    # 0.15 → unit-normalized (within-cluster cosine ≈ 0.4, cross ≈ 0.03
    # — well separated without being degenerate).
    # own seeded stream so the clustered table is reproducible standalone
    # (independent of how many draws the tables above consumed)
    rng_c = np.random.default_rng(77)
    k_clusters = 16
    centers = rng_c.standard_normal((k_clusters, 64)).astype("float32")
    centers /= np.linalg.norm(centers, axis=1, keepdims=True).astype("float32")
    assign = rng_c.integers(0, k_clusters, N_EMB)
    emb_c = (
        centers[assign]
        + 0.15 * rng_c.standard_normal((N_EMB, 64)).astype("float32")
    )
    emb_c /= np.linalg.norm(emb_c, axis=1, keepdims=True).astype("float32")
    write(
        "embeddings_clustered",
        pa.table(
            {
                "vec_id": pa.array(np.arange(1, N_EMB + 1), pa.int64()),
                "embedding": pa.array(list(emb_c), pa.list_(pa.float32())),
                "label": pa.array(assign.astype("int32"), pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    main()
