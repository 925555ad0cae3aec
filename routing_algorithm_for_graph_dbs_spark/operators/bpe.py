"""Distributed BPE (byte-pair-encoding) merge learning.

The tokenizer-training step of an LLM data pipeline: greedily learn the
``n_merges`` most frequent adjacent symbol pairs from a corpus, exactly
as GPT-2-style word-level BPE does (merges apply within words; words are
the classic whitespace/punctuation pre-tokens).

Scale design — the key move is that BPE statistics live on the DISTINCT
WORD table, not the corpus:

- One corpus-sized aggregation up front builds ``(word, count)``. From
  then on every merge round touches a relation bounded by VOCABULARY
  size (hundreds of thousands of rows even for 100 TB of text), with
  counts carrying the corpus weight.
- Each round is one small Spark job: explode adjacent symbol pairs
  weighted by word count, aggregate, take the argmax (count desc, pair
  asc — a total order, so the learned merge list is deterministic).
- The merge applies lazily as a JVM-side ``aggregate`` fold over each
  word's symbol array (left-to-right, non-overlapping — matching the
  reference semantics); the words relation is localCheckpoint-ed every
  few rounds so plan depth stays bounded over hundreds of merges.

The driver holds only the learned merge list and one argmax row per
round — never the vocabulary.

No DuckDB oracle: a greedy K-round loop is not expressible as one SQL
statement (it would need K unrolled array-rewrite CTEs). Correctness is
pinned instead by a pure-Python reference BPE implementation in
tests/test_dataops.py (same pre-tokenization, same tie-break), the same
strategy the graph kernels use for their non-SQL parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHECKPOINT_EVERY = 8


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the lowercase alnum pre-tokens — the ONE
    corpus-sized pass."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "),
            r"\s+",
            " ",
        )
    )
    return (
        df.select(F.explode(F.split(norm, " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _apply_merge(sym_col, a: str, b: str):
    """Fold the symbol array left-to-right, merging non-overlapping
    adjacent (a, b) into a+b — pure JVM higher-order expression."""
    merged = F.lit(a + b)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns
    ``[(left, right, weighted_pair_count), ...]`` in learned order.

    Stops early when no pair reaches ``min_pair_count`` (summed over the
    corpus via word counts). Ties break deterministically: highest
    count, then lexicographically smallest (left, right).
    """
    words = (
        _word_counts(df, text_col)
        .select(
            F.split(F.col("word"), "").alias("syms"),
            F.col("cnt"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
            "cnt",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        words = words.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        if (r + 1) % CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: words split to
    characters, merges replayed in learned order (the standard BPE
    inference rule). Pure column expressions — the merge list compiles
    into a fixed chain of ``aggregate`` folds, no UDF, no shuffle."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "),
            r"\s+",
            " ",
        )
    )
    def _merge_fn(a: str, b: str):
        # a real closure: PySpark reads the lambda's arity, so default-arg
        # capture (lambda syms, a=a, b=b: ...) would present 3 parameters
        return lambda syms: _apply_merge(syms, a, b)

    tok = F.transform(F.split(norm, " "), lambda w: F.split(w, ""))
    for m in merges:
        tok = F.transform(tok, _merge_fn(m[0], m[1]))
    return df.withColumn(out_col, F.flatten(tok))
