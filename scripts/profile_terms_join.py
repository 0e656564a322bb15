"""Reproduce the builder's single-action terms write for gram3 and print
the join plan actually executed."""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from bench import _transcripts_path, shuffle_partition_policy  # noqa: E402


def main() -> None:
    from pyspark import StorageLevel

    from neural_search_spark.index.build import (
        compute_term_stats,
        postings_from_tokens,
        term_dictionary_from_tokens,
        tokenized_turns,
    )
    from neural_search_spark.query.sayt import _shingle_expr
    from neural_search_spark.session import get_spark
    from neural_search_spark.tokenizer import tokenize_expr

    cpus = 32
    n_convs = 12000
    sp = shuffle_partition_policy(cpus, n_convs * 16)
    spark = get_spark(cpus=cpus, shuffle_partitions=sp, app_name="prof-tj")
    tr = spark.read.parquet(_transcripts_path(n_convs))
    tr.count()

    n = 3
    src = (
        tr.withColumn("__b", tokenize_expr("text"))
        .withColumn("__t", _shingle_expr(F.col("__b"), n))
        .drop("__b")
    )
    toks = tokenized_turns(src, "__t").persist(StorageLevel.MEMORY_AND_DISK)
    postings_all = postings_from_tokens(toks).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # builder stage-1 twin: materializes toks only
    toks.agg(F.count(F.lit(1)), F.sum("dl")).collect()

    tdict = term_dictionary_from_tokens(toks)
    tid_stats = compute_term_stats(postings_all)
    joined = tdict.join(tid_stats, "tid").select("term", "tid", "df", "cf")
    t0 = time.time()
    joined.write.mode("overwrite").parquet("/tmp/nss_prof_terms_j")
    print(f"single-action terms write: {time.time() - t0:.1f}s")
    print(joined._jdf.queryExecution().executedPlan().toString()[:3000])
    spark.stop()


if __name__ == "__main__":
    main()
