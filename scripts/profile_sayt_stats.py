"""Decompose the gram3 term_stats stage blowup: time each sub-step."""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from bench import _transcripts_path, shuffle_partition_policy  # noqa: E402


def main() -> None:
    from neural_search_spark.session import get_spark

    cpus = 32
    n_convs = 12000
    sp = shuffle_partition_policy(cpus, n_convs * 16)
    spark = get_spark(cpus=cpus, shuffle_partitions=sp, app_name="prof-stats")
    tr = spark.read.parquet(_transcripts_path(n_convs))
    tr.count()

    from pyspark import StorageLevel

    from neural_search_spark.index.build import (
        compute_term_stats,
        postings_from_tokens,
        term_dictionary_from_tokens,
        tokenized_turns,
    )
    from neural_search_spark.query.sayt import _shingle_expr
    from neural_search_spark.tokenizer import tokenize_expr

    for n in (2, 3):
        src = (
            tr.withColumn("__b", tokenize_expr("text"))
            .withColumn("__t", _shingle_expr(F.col("__b"), n))
            .drop("__b")
        )
        toks = tokenized_turns(src, "__t").persist(StorageLevel.MEMORY_AND_DISK)
        t0 = time.time()
        toks.count()
        t_tok = time.time() - t0
        postings = postings_from_tokens(toks).persist(StorageLevel.MEMORY_AND_DISK)
        t0 = time.time()
        n_post = postings.count()
        t_post = time.time() - t0
        t0 = time.time()
        tdict = term_dictionary_from_tokens(toks)
        n_vocab = tdict.count()
        t_dict = time.time() - t0
        t0 = time.time()
        tst = compute_term_stats(postings)
        tst.count()
        t_stats = time.time() - t0
        t0 = time.time()
        joined = tdict.join(tst, "tid").select("term", "tid", "df", "cf")
        joined.write.mode("overwrite").parquet(f"/tmp/nss_prof_terms{n}")
        t_join_write = time.time() - t0
        print(
            f"gram{n}: postings={n_post} vocab={n_vocab} "
            f"tok={t_tok:.1f} post={t_post:.1f} dict={t_dict:.1f} "
            f"stats={t_stats:.1f} join_write={t_join_write:.1f}"
        )
        toks.unpersist()
        postings.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
