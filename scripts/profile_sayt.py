"""Profile the SAYT gram-build section in isolation at sf0.1 conditions.

Usage: python scripts/profile_sayt.py [old|new]
"""
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")
from bench import _transcripts_path, shuffle_partition_policy  # noqa: E402


def main(variant: str) -> None:
    from neural_search_spark.session import get_spark

    cpus = 32
    n_convs = 12000
    sp = shuffle_partition_policy(cpus, n_convs * 16)
    spark = get_spark(cpus=cpus, shuffle_partitions=sp, app_name="prof-sayt")
    tr = spark.read.parquet(_transcripts_path(n_convs))
    tr.count()

    from neural_search_spark.index.build import IndexBuilder
    from neural_search_spark.query.sayt import _shingle_expr
    from neural_search_spark.tokenizer import tokenize_expr

    # warm the session like the bench does: a full root-index build first
    info = IndexBuilder(
        spark, "/tmp/nss_prof_root", n_shards=32, block_size=4096
    ).build(tr)
    print("root stage_sec:", info.get("stage_sec"))

    t0 = time.time()
    if variant == "old":
        for n in (2, 3):
            gram_dir = f"/tmp/nss_prof_sayt{n}"
            info = IndexBuilder(
                spark, gram_dir, n_shards=32, block_size=4096,
                tokens_col="__sayt_toks",
            ).build(
                tr.withColumn("__b", tokenize_expr("text"))
                .withColumn("__sayt_toks", _shingle_expr(F.col("__b"), n))
                .drop("__b")
            )
            print(f"gram{n} stage_sec:", info.get("stage_sec"))
    else:
        from neural_search_spark.query.sayt import build_sayt_indexes

        build_sayt_indexes(
            spark, "/tmp/nss_prof_saytN", tr, grams=(2, 3),
            n_shards=32, block_size=4096,
            concurrent=(variant != "newseq"),
        )
    print(f"VARIANT={variant} gram_build_sec={time.time() - t0:.2f}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "old")
