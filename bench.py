"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is timed as a full action (plan + execute + collect-to-count);
per-query value is the median of REPS runs after one warmup of the session.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = int(os.environ.get("BENCH_REPS", "3"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "scan_filter_project",
    "topk_orders_per_customer",
    "lookup_join_dedup",
    "pooled_lookup_sum",
    "left_join_defaults",
    "asof_prior_click",
    "sliding_window_1h",
    "ordered_history",
    "metric_auc",
    "metric_gauc",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from hybridbackend_spark.queries import get_queries
    from hybridbackend_spark.session import get_session

    spark = get_session("bench")
    queries = get_queries()

    # warm the JVM / parquet footer caches once with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 3)

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "reps": REPS,
                "master": spark.sparkContext.master,
            }
        )
    )


if __name__ == "__main__":
    main()
