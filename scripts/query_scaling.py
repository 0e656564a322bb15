"""Query-side scaling probe: batched BM25 throughput at two parallelism
levels over ONE prebuilt index (alternating best-of-N protocol,
BENCH.md methodology — sandbox noise is ±30-50% on single runs).

Usage:
  python scripts/query_scaling.py build   # build the 1M-turn index once
  python scripts/query_scaling.py run 2   # one measurement at local[2]
  python scripts/query_scaling.py sweep   # alternating sweep + efficiency
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IDX = "/tmp/nss_qscale_index"
N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "64000"))
N_QUERIES = 200
REPEATS = 3


def _corpus() -> str:
    path = f"/tmp/nss_bench_transcripts_{N_CONVS}"
    if not os.path.exists(path):
        from neural_search_spark.transcripts import write_transcripts_parquet

        write_transcripts_parquet(path, n_convs=N_CONVS, seed=42, n_files=64)
    return path


def build():
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8, app_name="qscale-build")
    tr = spark.read.parquet(_corpus())
    IndexBuilder(spark, IDX, n_shards=32, block_size=4096).build(tr)
    print("built", IDX)


def run(cpus: int):
    from neural_search_spark.query.bm25 import BM25Index, bm25_topk_batch
    from neural_search_spark.session import get_spark
    from neural_search_spark.transcripts import generate_queries

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8),
                      app_name="qscale")
    idx = BM25Index(spark, IDX).cache()
    queries = generate_queries(N_QUERIES).to_dict("records")
    pairs = [(r["query_id"], r["query_text"]) for r in queries]
    # warm the cache (repartition materialization) + codegen, untimed
    bm25_topk_batch(idx, pairs[:5], k=10).collect()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        bm25_topk_batch(idx, pairs, k=10).collect()
        best = min(best, time.time() - t0)
    print(json.dumps({"cpus": cpus, "best_sec": round(best, 3),
                      "qps": round(len(pairs) / best, 2)}))
    spark.stop()


def sweep():
    results: dict[int, list[float]] = {2: [], 8: []}
    for _ in range(3):
        for cpus in (2, 8):
            r = subprocess.run(
                [sys.executable, __file__, "run", str(cpus)],
                capture_output=True, text=True,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            results[cpus].append(json.loads(line)["qps"])
    q2, q8 = max(results[2]), max(results[8])
    print(json.dumps({
        "qps_local2": q2, "qps_local8": q8, "all": results,
        "efficiency_2_to_8": round(q8 / q2 / 4, 3),
    }))


if __name__ == "__main__":
    {"build": build, "sweep": sweep}.get(
        sys.argv[1], lambda: run(int(sys.argv[2]))
    )() if sys.argv[1] != "run" else run(int(sys.argv[2]))
