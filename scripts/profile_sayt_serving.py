"""SAYT serving qps at bench scale: rebuild gram indexes (sorted terms)
then time per-query and batch serving like bench.py does."""
import sys
import time

sys.path.insert(0, "/root/repo")
from bench import _transcripts_path, shuffle_partition_policy  # noqa: E402


def main() -> None:
    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.bm25 import BM25Index
    from neural_search_spark.query.sayt import (
        build_sayt_indexes,
        search_as_you_type_batch,
        search_as_you_type_topk,
    )
    from neural_search_spark.session import get_spark
    from neural_search_spark.tokenizer import tokenize_py

    cpus = 32
    n_convs = 12000
    sp = shuffle_partition_policy(cpus, n_convs * 16)
    spark = get_spark(cpus=cpus, shuffle_partitions=sp, app_name="prof-ss")
    tr = spark.read.parquet(_transcripts_path(n_convs))
    tr.count()

    root_dir = "/tmp/nss_profss_root"
    IndexBuilder(spark, root_dir, n_shards=32, block_size=4096).build(tr)
    t0 = time.time()
    idxs = build_sayt_indexes(
        spark, "/tmp/nss_profss", tr, grams=(2, 3),
        n_shards=32, block_size=4096,
    )
    print(f"gram_build={time.time() - t0:.1f}s")
    idxs[1] = BM25Index(spark, root_dir).cache()

    phrases = []
    for r in tr.limit(16).collect():
        tk = tokenize_py(r["text"])
        if len(tk) >= 2:
            phrases.append(f"{tk[0]} {tk[1]}")
        if len(phrases) == 6:
            break
    sayt_qs = [" ".join(p.split()[:2])[:-2] for p in phrases]
    search_as_you_type_topk(idxs, sayt_qs[0], k=10).collect()  # warm
    t0 = time.time()
    for sq in sayt_qs:
        search_as_you_type_topk(idxs, sq, k=10).collect()
    print(f"sayt_qps={len(sayt_qs) / (time.time() - t0):.2f}")

    batch = [(f"q{i}", s) for i, s in enumerate(sayt_qs)]
    search_as_you_type_batch(idxs, batch, k=10).collect()  # warm
    t0 = time.time()
    search_as_you_type_batch(idxs, batch, k=10).collect()
    print(f"sayt_qps_batch={len(batch) / (time.time() - t0):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
