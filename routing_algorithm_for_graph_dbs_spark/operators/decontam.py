"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (public practice since GPT-2/GPT-3
appendix dedup notes): any training document sharing at least one length-n
word shingle with a benchmark document is "contaminated" and excluded (or
reported). At 100 TB the only workable shape is the one built here:

- both sides reduce to DISTINCT hashed n-grams (16-byte md5 digests), so
  the shuffle carries digests, never text;
- the benchmark side is tiny by construction (eval sets are MBs) — Spark's
  AQE broadcasts it, making the probe a map-side hash lookup over the
  training scan, no shuffle of the corpus at all;
- output is per-document match statistics, joinable back to the corpus as
  an anti-join filter.

Reference scope note: the reference engine (Routing-Algorithm-for-Graph-DBs)
is batch GTFS analytics with no corpus surface — this module is part of the
beyond-reference training-data-pipeline inventory (SURVEY.md "Training-data
pipeline surface"), same category as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routing_algorithm_for_graph_dbs_spark.operators.dedup import word_shingles


def ngram_digests(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 13
) -> DataFrame:
    """(key, gram-digest) pairs: DISTINCT word n-grams of the normalized
    text, hashed to md5 digests. Documents shorter than n words contribute
    their whole normalized text as one shingle (word_shingles semantics) —
    a short benchmark prompt then only matches documents containing exactly
    that text as their own short shingle set, which is the conservative
    direction. Empty texts contribute nothing."""
    grams = word_shingles(F.col(text_col), n)
    return (
        df.select(F.col(key_col), F.explode(grams).alias("gram"))
        .filter(F.length("gram") > 0)
        .select(key_col, F.md5("gram").alias("gram_digest"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_key_col: str | None = None,
) -> DataFrame:
    """Per-document contamination report against ``benchmark``.

    Returns one row per CONTAMINATED document: ``(key_col, n_shared_grams,
    n_bench_docs)`` — how many distinct shingles it shares with the
    benchmark, and how many distinct benchmark documents those shingles
    come from. Clean documents are absent (filter the corpus with a left
    anti join on the result).

    Scale shape: corpus grams never leave their partitions — the benchmark
    digest set is broadcast (explicitly, it is small by definition) and the
    match is a map-side semi-probe followed by one groupBy on the corpus
    key. If the same document id appears on both sides (self-matching a
    benchmark drawn from the corpus), it is excluded — a document is not
    contaminated by itself.
    """
    bt = bench_text_col or text_col
    bk = bench_key_col or key_col
    corpus = ngram_digests(docs, text_col, key_col, n)
    bench = (
        ngram_digests(benchmark, bt, bk, n)
        .withColumnRenamed(bk, "_bench_id")
        .distinct()
    )
    hits = corpus.join(
        F.broadcast(bench), "gram_digest", "inner"
    ).filter(F.col(key_col) != F.col("_bench_id"))
    return hits.groupBy(key_col).agg(
        F.countDistinct("gram_digest").alias("n_shared_grams"),
        F.countDistinct("_bench_id").alias("n_bench_docs"),
    )
