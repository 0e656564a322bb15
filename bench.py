"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline workload (mirrors BASELINE.md's operative metrics):
  * index_build      — inverted-index build over a deterministic synthetic
                       transcripts corpus (~60k turns, BASELINE.json
                       input_hint schema) → turns/sec
  * bm25_queries     — the reference query set (40 queries, k=10) through
                       the block-max MaxScore engine → qps + p50/p99 ms
  * hybrid / dedup / ann / text queries over the sf tables

Scaling mode (the north rule's N→4N-executor criterion, evidenced at two
parallelism levels in this single-node sandbox):
  python bench.py --scaling   → runs the same workload at local[8] and
  local[32] in separate JVMs and reports throughput + efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BENCH_QUERIES = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "40"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "12000"))
SCALING_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "64000"))
SCALING_QUERIES = int(os.environ.get("SPARK_GRAFT_SCALING_QUERIES", "200"))


def _transcripts_path(n_convs: int) -> str:
    """Deterministic synthetic transcripts corpus (seed=42), cached; written
    as 64 part files so the scan parallelizes like a real table."""
    path = f"/tmp/nss_bench_transcripts_{n_convs}"
    if not os.path.exists(path):
        from neural_search_spark.transcripts import write_transcripts_parquet

        write_transcripts_parquet(path, n_convs=n_convs, seed=42, n_files=64)
    return path


def run_workload(cpus: int, mode: str = "full") -> dict:
    from pyspark.sql import functions as F

    from neural_search_spark import gate
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.bm25 import BM25Index, bm25_topk
    from neural_search_spark.session import get_spark
    from neural_search_spark.transcripts import generate_queries

    # shuffle-partition policy (measured, 1M-turn build, interleaved runs):
    # at ≤8 cores 1 task/core wins (10.4k vs 9.6k turns/s at local[8] with
    # 2×); at 32 cores 2 tasks/core smooths stragglers (+11-15%: 17.7-18.0k
    # vs 15.2-16.1k). Matches cluster practice: oversubscribe reduce tasks
    # once scheduler variance dominates.
    sp = max(cpus, 8) if cpus <= 16 else 2 * cpus
    spark = get_spark(cpus=cpus, shuffle_partitions=sp, app_name="nss-bench")
    n_convs = SCALING_CONVS if mode == "scaling" else BENCH_CONVS
    tpath = _transcripts_path(n_convs)
    tr = spark.read.parquet(tpath)
    n_turns = tr.count()

    out: dict = {"queries": {}}
    q = out["queries"]

    # --- index build -------------------------------------------------------
    idx_dir = f"/tmp/nss_bench_index_{cpus}"
    t0 = time.time()
    # n_shards is a property of the DATA layout, not the cluster size — keep
    # it fixed so N- and 4N-core runs build the identical index
    info = IndexBuilder(spark, idx_dir, n_shards=32, block_size=4096).build(tr)
    build_s = time.time() - t0
    q["index_build"] = round(build_s, 3)
    out["n_turns"] = n_turns
    out["build_turns_per_sec"] = round(n_turns / build_s, 1)
    out["hot_terms_split"] = info["hot_terms_split"]

    # --- BM25 query batch (reference query set) ----------------------------
    # serving shape: hot posting blocks pinned in executor memory
    idx = BM25Index(spark, idx_dir).cache()
    n_q = SCALING_QUERIES if mode == "scaling" else N_BENCH_QUERIES
    queries = generate_queries(n_q).to_dict("records")
    for rec in queries[:2]:  # JVM/codegen warmup, untimed
        bm25_topk(idx, rec["query_text"], k=rec["k"]).collect()
    if mode == "full":
        lat = []
        t0 = time.time()
        for rec in queries:
            t1 = time.time()
            bm25_topk(idx, rec["query_text"], k=rec["k"]).collect()
            lat.append(time.time() - t1)
        total_q = time.time() - t0
        lat.sort()
        q["bm25_query_batch"] = round(total_q, 3)
        out["bm25_qps"] = round(len(lat) / total_q, 2)
        out["bm25_p50_ms"] = round(1000 * lat[len(lat) // 2], 1)
        out["bm25_p99_ms"] = round(1000 * lat[min(len(lat) - 1, int(len(lat) * 0.99))], 1)

    # batched form: all queries in ONE job (the cluster-throughput shape)
    from neural_search_spark.query.bm25 import bm25_topk_batch

    pairs = [(r["query_id"], r["query_text"]) for r in queries]
    t0 = time.time()
    bm25_topk_batch(idx, pairs, k=10).collect()
    batch_s = time.time() - t0
    q["bm25_batched_all"] = round(batch_s, 3)
    out["bm25_batched_qps"] = round(len(pairs) / batch_s, 2)

    # --- sparse postings index: build + serve (reported separately so the
    # headline total stays comparable round-over-round) --------------------
    if mode == "full":
        from neural_search_spark.index.build import doc_id_col
        from neural_search_spark.index.sparse import (
            SparseIndex,
            SparseIndexBuilder,
            sparse_index_topk,
        )
        from neural_search_spark.processors import sparse_encode
        from neural_search_spark.query.neural import QuerySpec, rewrite

        tall = sparse_encode(
            tr.withColumn("doc_id", doc_id_col()), text_col="text"
        )
        sp_dir = f"/tmp/nss_bench_sparse_{cpus}"
        t0 = time.time()
        SparseIndexBuilder(spark, sp_dir, n_shards=32, block_size=4096).build(
            tall
        )
        sp_build = time.time() - t0
        sp_idx = SparseIndex(spark, sp_dir).cache()
        sp_queries = [
            rewrite(
                QuerySpec(query_type="neural_sparse", query_text=r["query_text"])
            ).query_tokens
            for r in queries[:20]
        ]
        sparse_index_topk(sp_idx, sp_queries[0], k=10).collect()  # warm
        t0 = time.time()
        for toks in sp_queries:
            sparse_index_topk(sp_idx, toks, k=10).collect()
        sp_serve = time.time() - t0
        out["sparse_index_build_sec"] = round(sp_build, 3)
        out["sparse_qps"] = round(len(sp_queries) / sp_serve, 2)

    # --- sf-table operator queries ----------------------------------------
    extra_ops = [] if mode == "scaling" else [
        ("hybrid_minmax_arith", gate.q_hybrid_minmax_arith),
        ("minhash_lsh_pairs", gate.q_minhash_lsh_pairs),
        ("simhash", gate.q_simhash),
        ("cosine_topk", gate.q_cosine_topk),
        ("lsh_ann_topk", gate.q_lsh_ann_topk),
        ("quality", gate.q_quality),
        ("events_rollup", gate.q_events_rollup),
    ]
    for name, fn in extra_ops:
        t1 = time.time()
        fn(spark, SF_DIR).collect()
        q[name] = round(time.time() - t1, 3)

    if mode == "full":
        # round-3 measures — reported as separate fields (NOT inside the
        # headline `queries` total) so the headline stays round-over-round
        # comparable, like the sparse-index lines.

        # hybrid over the SERVING block index — the flagship plan (depth-
        # bounded bm25_topk branches → broadcast-stats normalize → combine)
        from neural_search_spark.query.hybrid import hybrid_topk

        qa, qb = queries[0]["query_text"], queries[1]["query_text"]
        t1 = time.time()
        hybrid_topk(
            [
                bm25_topk(idx, qa, k=50).drop("rank"),
                bm25_topk(idx, qb, k=50).drop("rank"),
            ],
            k=10,
        ).collect()
        out["hybrid_index_sec"] = round(time.time() - t1, 3)

        # Engine ANN route: serving cost tracks the probed LSH buckets,
        # not corpus rows (sf0.1 embeddings table)
        t1 = time.time()
        gate.q_engine_ann_topk(spark, SF_DIR).collect()
        out["engine_ann_topk_sec"] = round(time.time() - t1, 3)

        # on-disk bucket-partitioned LSH store: build once, then probe
        # queries read ONLY their probed partitions (PartitionFilters) —
        # reported outside the headline total like the sparse index
        from neural_search_spark.extras.similarity import LshAnnIndex

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        store = "/tmp/nss_bench_lsh_store"
        t1 = time.time()
        LshAnnIndex.write(emb, store, n_planes=8)
        out["ann_store_build_sec"] = round(time.time() - t1, 3)
        disk = LshAnnIndex.load(spark, store, probe_hamming=1)
        qv = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
        disk.topk(qv, k=10).collect()  # warm (codegen)
        t1 = time.time()
        disk.topk(qv, k=10).collect()
        out["ann_disk_query_sec"] = round(time.time() - t1, 3)

        # per-partition HNSW graphs (the Lucene-segment model): build is
        # one applyInPandas task per graph; the 8-query batch amortizes
        # the graph scan the way the segment searcher amortizes it
        from neural_search_spark.extras.hnsw import build_graphs, hnsw_topk_batch

        t1 = time.time()
        g = build_graphs(emb, n_graphs=8, M=16, ef_construction=64).persist()
        g.count()
        out["hnsw_build_sec"] = round(time.time() - t1, 3)
        qbatch = {
            str(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.limit(8).collect()
        }
        hnsw_topk_batch(g, dict(list(qbatch.items())[:1]), k=10).collect()  # warm
        t1 = time.time()
        hnsw_topk_batch(g, qbatch, k=10, ef_search=64).collect()
        out["hnsw_batch8_sec"] = round(time.time() - t1, 3)
        g.unpersist()

        # PQ tier: train + encode once (the ~21× compressed serving table),
        # then an ADC+refine query — the memory-bound path whose scan cost
        # tracks 8-byte codes, not raw vectors
        from neural_search_spark.extras import pq as pqmod

        t1 = time.time()
        books = pqmod.train_codebooks(emb, m=8, ksub=64, n_sample=512, n_iter=10)
        pcodes = pqmod.pq_encode(emb, books).persist()
        pcodes.count()
        out["pq_encode_sec"] = round(time.time() - t1, 3)
        pqmod.pq_topk(pcodes, books, qv, k=10, refine=50, emb=emb).collect()  # warm
        t1 = time.time()
        pqmod.pq_topk(pcodes, books, qv, k=10, refine=50, emb=emb).collect()
        out["pq_query_sec"] = round(time.time() - t1, 3)
        pcodes.unpersist()

    if mode == "scaling":
        # control: the DRIVER serving path (pyarrow pruned read + numpy
        # kernel, zero Spark jobs) is single-threaded by design — its qps
        # should be ~flat across core counts, isolating any sub-par 8→32
        # number to the coordinator kernel rather than the distributed path
        drv = queries[: min(50, len(queries))]
        for rec in drv[:2]:
            bm25_topk(idx, rec["query_text"], k=10, mode="driver").collect()
        t0 = time.time()
        for rec in drv:
            bm25_topk(idx, rec["query_text"], k=10, mode="driver").collect()
        out["bm25_driver_qps"] = round(len(drv) / (time.time() - t0), 2)

    out["total_sec"] = round(sum(q.values()), 3)
    spark.stop()
    return out


def main():
    if "--scaling" in sys.argv:
        # run the identical workload at two parallelism levels, fresh JVMs
        lo, hi = (
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "8,32").split(",")
        )
        results = {}
        for cpus in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            env["SPARK_GRAFT_BENCH_MODE"] = "scaling"
            r = subprocess.run(
                [sys.executable, __file__, "--single"],
                env=env, capture_output=True, text=True,
            )
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
            results[cpus] = json.loads(line)
        ratio = hi / lo
        tl, th = results[lo]["value"], results[hi]["value"]
        bl, bh = results[lo]["build_turns_per_sec"], results[hi]["build_turns_per_sec"]
        ql, qh = results[lo]["bm25_batched_qps"], results[hi]["bm25_batched_qps"]
        eff = {
            # throughput scaling efficiency from N to (hi/lo)·N cores:
            # (rate_hi / rate_lo) / (hi/lo)
            "build": round(bh / bl / ratio, 3),
            "query": round(qh / ql / ratio, 3),
            "total": round(tl / th / ratio, 3),
        }
        print(
            json.dumps(
                {
                    f"local{lo}": results[lo],
                    f"local{hi}": results[hi],
                    "efficiency": eff,
                }
            )
        )
        return

    out = run_workload(CPUS, os.environ.get("SPARK_GRAFT_BENCH_MODE", "full"))
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline workload wall-clock (index build + 40-query "
                "BM25 batch + hybrid/dedup/ann/text operators)",
                "value": out.pop("total_sec"),
                "unit": "sec",
                "queries": out.pop("queries"),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **out,
            }
        )
    )


if __name__ == "__main__":
    if "--single" in sys.argv:
        sys.argv.remove("--single")
    main()
