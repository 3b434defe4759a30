#!/usr/bin/env python
"""Physical-plan shape report for the headline bench queries.

Emits one markdown table row per query: shuffle-exchange count,
broadcast-exchange count, whole-stage-codegen span count, and scan
count — the quantities the scale design cares about.  Run with the
repo root on sys.path:

    python scripts/plan_report.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from puma_matcher_spark.plans.inspect import formatted_plan  # noqa: E402
from puma_matcher_spark.queries import REGISTRY  # noqa: E402
from puma_matcher_spark.session import get_spark  # noqa: E402

from bench import BENCH_QUERIES  # noqa: E402

# round-3 operator families: data-quality, CDC/SCD2, retrieval,
# quantized/two-stage ANN, incremental ingest
ROUND3_QUERIES = [
    "dq_profile",
    "dq_expectations",
    "cdc_latest_state",
    "scd2_history",
    "doc_keywords",
    "winsorized_prices",
    "incremental_near_dups",
    "bm25_search",
    "phrase_search",
    "embedding_int8_topk",
    "embedding_prefix_rerank",
    # late round-3 batch: trend/regression, linkage, graph, layout,
    # sampling, TPC-H shapes, attribution models
    "events_trend",
    "part_edit_pairs",
    "large_orders",
    "order_priority_late",
    "brand_supplier_counts",
    "small_quantity_revenue",
    "weighted_sample",
    "zorder_values",
    "pagerank_mass",
    "events_attribution_models",
    "bigram_logprob",
    "events_hll_rollup",
    "events_theta_setops",
    "events_kll_quantiles",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# Physical-plan shapes ({sf_dir}, AQE initial plans)\n")
    import re

    node_re = re.compile(r"^\((\d+)\) (\w+)")

    def table(names: list[str]) -> None:
        print("| query | shuffles | broadcasts | codegen ids | scans |")
        print("|---|---|---|---|---|")
        for name in names:
            plan = formatted_plan(REGISTRY[name].spark_fn(spark, sf_dir))
            nodes = [
                m.group(2)
                for ln in plan.splitlines()
                if (m := node_re.match(ln.strip()))
            ]
            shuffles = sum(1 for n in nodes if n == "Exchange")
            bcasts = sum(1 for n in nodes if n == "BroadcastExchange")
            scans = sum(1 for n in nodes if n == "Scan")
            wscg = len(set(re.findall(r"codegen id : (\d+)", plan)))
            print(f"| {name} | {shuffles} | {bcasts} | {wscg} | {scans} |")

    table(BENCH_QUERIES)
    print("\n## Round-3 operator families\n")
    table(ROUND3_QUERIES)


if __name__ == "__main__":
    main()
