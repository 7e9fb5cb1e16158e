"""Scale-curve bench for the flagship scale operators (round-6,
verdict item 4): the 100 TB claims for the dedup/ANN/graph family rest
on plan shape (banded LSH, IVF cells, O(log d) star contraction); this
harness adds MEASURED growth curves so near-linear scaling is an
artifact, not an argument.

Method: time each query at sf0.01, sf0.1, and a ~10x synthetic tier
built by replicating the sf0.1 table with remapped ids and perturbed
content (distinct docs/vectors/users — exact duplicates would
degenerately stress bucket caps instead of scaling realistically,
mirroring the size-sweep discipline of the reference's
hybridbackend/tensorflow/benchmarks/data_benchmark_parquet.py:38-69).
Per tier: one untimed warm-up, then min of BENCH_SCALE_REPS (default 2)
timed noop-sink runs. Output: a table with per-tier rows/secs and the
time-growth : row-growth ratio; >1.5x super-linearity is flagged. Also
writes BENCH_SCALE.json.

Usage: python bench_scale.py  (~5 min; run on a quiet box)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPS = int(os.environ.get("BENCH_SCALE_REPS", "2"))
BASE = "/root/testdata"
SYN_DIR = os.environ.get("BENCH_SCALE_SYNDIR", "/tmp/spark_graft_scale/sf1")

# query -> (table it scales with)
TARGETS = {
    "minhash_lsh_dedup_docs": "documents",
    "cosine_topk_lsh_docs": "embeddings",
    "semantic_dedup_docs": "embeddings",
    "cc_star_event_chains": "events",
    # wedge-join graph family: 10x lineitem with BOTH orderkey and
    # partkey remapped = 10 disjoint co-purchase graphs (same density,
    # more data) — the honest "more data, same distribution" tier;
    # leaving partkeys shared would instead measure density growth.
    "clustering_coeff_parts": "lineitem",
    "link_predict_parts": "lineitem",
    # round-7 additions (verdict item 4): the exact set-sim join and the
    # HyperBall reach sketch had no measured curve yet
    "setsim_join_docs": "documents",
    # custkey/suppkey remapped per copy -> 10 disjoint bipartite graphs
    # with the sf0.1 diameter: rounds constant, per-round cost 10x
    "hyperball_reach_suppliers": "lineitem",
}
COPIES = 10
OFFSET = 10_000_000


def build_synthetic() -> None:
    """Replicate sf0.1 documents/embeddings/events COPIES times with
    remapped ids and slight content perturbation; write parquet the
    engine reads like the driver-generated tiers."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(SYN_DIR, exist_ok=True)

    def write(name: str, parts: list) -> None:
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{SYN_DIR}/{name}.parquet", version="2.6")

    docs = pq.read_table(f"{BASE}/sf0.1/documents.parquet")
    parts = []
    for k in range(COPIES):
        t = docs
        t = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pc.add(t["doc_id"], k * OFFSET),
        )
        # distinct text per copy: tag EVERY token with the copy id, so
        # the copies are 10 DISJOINT corpora with identical internal
        # similarity structure (cross-copy shingle Jaccard = 0). The
        # earlier one-suffix-token perturbation made every copy a ~0.9
        # Jaccard near-duplicate of the others, which inflates the TRUE
        # output of exact-threshold joins quadratically in copies — a
        # duplication stress test, not a scale tier (no algorithm beats
        # its own output size). Dedup-rate realism is preserved WITHIN
        # each copy, which is what the per-copy operators measure.
        t = t.set_column(
            t.schema.get_field_index("text"), "text",
            pc.replace_substring_regex(
                t["text"], pattern=r"(\S+)", replacement=rf"c{k}\1"
            ),
        )
        parts.append(t)
    write("documents", parts)

    emb = pq.read_table(f"{BASE}/sf0.1/embeddings.parquet")
    parts = []
    for k in range(COPIES):
        t = emb.set_column(
            emb.schema.get_field_index("vec_id"), "vec_id",
            pc.add(emb["vec_id"], k * OFFSET),
        )
        parts.append(t)
    write("embeddings", parts)

    ev = pq.read_table(f"{BASE}/sf0.1/events.parquet")
    parts = []
    for k in range(COPIES):
        t = ev
        for col in ("event_id", "user_id"):
            t = t.set_column(
                t.schema.get_field_index(col), col,
                pc.add(t[col], k * OFFSET),
            )
        parts.append(t)
    write("events", parts)

    li = pq.read_table(f"{BASE}/sf0.1/lineitem.parquet")
    parts = []
    for k in range(COPIES):
        t = li
        # orderkey+partkey remap: disjoint co-purchase graphs; suppkey
        # remap: disjoint customer-supplier graphs for HyperBall (the
        # offset is %4-neutral so the edge filter keeps the same
        # per-copy pattern)
        for col in ("l_orderkey", "l_partkey", "l_suppkey"):
            t = t.set_column(
                t.schema.get_field_index(col), col,
                pc.add(t[col], k * OFFSET),
            )
        parts.append(t)
    write("lineitem", parts)

    orders = pq.read_table(f"{BASE}/sf0.1/orders.parquet")
    parts = []
    for k in range(COPIES):
        t = orders
        for col in ("o_orderkey", "o_custkey"):
            t = t.set_column(
                t.schema.get_field_index(col), col,
                pc.add(t[col], k * OFFSET),
            )
        parts.append(t)
    write("orders", parts)


def main() -> None:
    build = os.environ.get("BENCH_SCALE_REBUILD", "1") == "1"
    if build and os.path.isdir(SYN_DIR):
        shutil.rmtree(SYN_DIR)
    if not os.path.isdir(SYN_DIR):
        build_synthetic()

    from hybridbackend_spark.queries import get_queries
    from hybridbackend_spark.session import get_session

    spark = get_session(
        "bench-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    queries = get_queries()

    tiers = [
        ("sf0.01", f"{BASE}/sf0.01"),
        ("sf0.1", f"{BASE}/sf0.1"),
        ("sf0.1x10", SYN_DIR),
    ]
    rows_at = {}
    for label, d in tiers:
        for t in set(TARGETS.values()):
            if os.path.exists(f"{d}/{t}.parquet"):
                rows_at[(label, t)] = spark.read.parquet(
                    f"{d}/{t}.parquet"
                ).count()

    def run(name: str, sf_dir: str) -> float:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return round(min(times), 3)

    result = {}
    print(f"{'query':32} {'tier':9} {'rows':>9} {'sec':>8} "
          f"{'t-ratio':>8} {'r-ratio':>8} {'t/r':>6}")
    for name, table in TARGETS.items():
        prev = None
        curve = []
        for label, d in tiers:
            rows = rows_at[(label, table)]
            sec = run(name, d)
            entry = {"tier": label, "rows": rows, "sec": sec}
            if prev is not None and prev["sec"] > 0:
                tr = sec / prev["sec"]
                rr = rows / prev["rows"]
                entry["time_ratio"] = round(tr, 2)
                entry["rows_ratio"] = round(rr, 2)
                entry["growth"] = round(tr / rr, 2)
                flag = "  <-- SUPER-LINEAR" if tr / rr > 1.5 else ""
                print(f"{name:32} {label:9} {rows:9d} {sec:8.3f} "
                      f"{tr:8.2f} {rr:8.2f} {tr / rr:6.2f}{flag}")
            else:
                print(f"{name:32} {label:9} {rows:9d} {sec:8.3f} "
                      f"{'':8} {'':8}")
            curve.append(entry)
            prev = entry
        result[name] = curve

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SCALE.json"), "w") as f:
        json.dump({"reps": REPS, "agg": "min", "copies": COPIES,
                   "curves": result}, f, indent=2)
    print("wrote BENCH_SCALE.json")


if __name__ == "__main__":
    main()
