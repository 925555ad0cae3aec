"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID, quality
scoring, token counting, document fingerprinting over the ``documents``
table. All pure column expressions — JVM-side, whole-stage codegen, no
Python on the hot path — so they stream through 100 TB of parquet at scan
speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Small high-frequency marker-word lists per language (public knowledge).
# Deliberately tiny: the heuristic is count-of-marker-hits, the classic
# cheap language-ID baseline for corpus triage.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "non"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "que", "dans"],
    "es": ["el", "la", "los", "que", "y", "de", "es", "por"],
}

# BPE-ish pre-tokenizer: letter runs, single digits, or single punctuation
# (the GPT-2-style pre-split shape, simplified to ASCII classes).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _word_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish sub-token count per document."""
    t = F.col(text_col)
    return df.withColumn("ws_tokens", _word_count(t)).withColumn(
        "bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0)))
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + composite score.

    Features: length, word count, mean word length, punctuation ratio,
    uppercase ratio, digit ratio, english-stopword ratio. Composite score is
    a fixed linear blend in [0, ~1]; deterministic, rounded for stable
    cross-engine comparison.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    words = _word_count(t)
    # \p{L}\p{N}, not \w: Java's \w is ASCII-only, which would count every
    # accented letter as punctuation — systematically deflating the quality
    # score for exactly the non-English corpora LANG_MARKERS targets
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\p{L}\p{N}_\s]", ""))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    stop_re = "(?i)\\b(" + "|".join(LANG_MARKERS["en"]) + ")\\b"
    n_stop = F.size(F.regexp_extract_all(t, F.lit(stop_re), F.lit(0)))

    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_words = F.greatest(words, F.lit(1))
    punct_ratio = n_punct / safe_chars
    upper_ratio = n_upper / safe_chars
    digit_ratio = n_digit / safe_chars
    stop_ratio = n_stop / safe_words
    mean_word_len = (n_chars - (words - 1)) / safe_words

    score = (
        F.least(words / F.lit(100.0), F.lit(1.0)) * 0.3
        + F.least(stop_ratio * 2, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.2
        + (1 - F.least(digit_ratio * 4, F.lit(1.0))) * 0.1
        + (1 - F.least(upper_ratio * 4, F.lit(1.0))) * 0.1
    )
    return (
        df.withColumn("n_words", words)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("upper_ratio", F.round(upper_ratio, 6))
        .withColumn("digit_ratio", F.round(digit_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word-count language ID: per language, count marker hits;
    predict the argmax (ties -> lexicographically first language code;
    no hits at all -> 'und')."""
    cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        pat = "(?i)\\b(" + "|".join(markers) + ")\\b"
        cols.append(
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            ).alias(f"hits_{lang}")
        )
    out = df.select("*", *cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # build reverse so earlier languages win ties via last-wins chaining
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints:

    - ``fp_md5``: md5 of the normalized text (lowercase, collapsed
      whitespace) — exact-dup key, identical in any engine with md5.
    - ``fp_head``: md5 of the first 256 normalized chars — cheap
      prefix-duplicate probe.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fp_md5", F.md5(norm)).withColumn(
        "fp_head", F.md5(F.substring(norm, 1, 256))
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): hash every character k-gram of the normalized text,
    slide a window of ``w`` consecutive hashes, keep each window's minimum —
    guarantees any shared substring of length >= k + w - 1 contributes a
    shared fingerprint, at ~2/(w+1) selection density.

    Long format on purpose: explode to (doc, pos, k-gram hash), rolling min
    via a bounded-frame window — linear work, spillable, no per-row arrays
    of the whole document. Hash is md5-as-string (min is lexicographic) so
    any engine reproduces the selection bit-for-bit. Returns distinct
    (key, fp) pairs.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "), r"\s+", " "
        )
    )
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    grams = df.select(
        F.col(key_col),
        norm.alias("_norm"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
    ).select(
        F.col(key_col),
        "pos",
        F.md5(F.substring(F.col("_norm"), F.col("pos"), k)).alias("h"),
    )
    win = Window.partitionBy(key_col).orderBy("pos").rowsBetween(0, w - 1)
    n_win = Window.partitionBy(key_col)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .withColumn("_n", F.max("pos").over(n_win))
        # documents with fewer than w windows still emit their single
        # min-hash (standard winnowing guarantees >= 1 fingerprint per doc;
        # dropping short docs entirely would make short exact duplicates
        # invisible to fingerprint-based dedup)
        .filter(F.col("pos") <= F.greatest(F.col("_n") - (w - 1), F.lit(1)))
        .select(key_col, "fp")
        .distinct()
    )


#: Gopher's two structural units: lines, and paragraphs on blank lines.
REPETITION_PARTS: dict[str, str] = {"line": r"\n", "para": r"\n{2,}"}


def _long0() -> Column:
    return F.lit(0).cast("long")


def _dup_frac_cols(text_col: str, sep: str) -> tuple[Column, Column]:
    """(dup_frac, dup_char_frac) for one part splitter, as a SINGLE pass
    over the sorted part array.

    Sort + run detection instead of ``size``/``array_distinct``/two
    ``aggregate`` calls: Catalyst does not common-subexpression-eliminate
    across higher-order functions, so the four-expression formulation
    re-evaluated the split+trim+filter chain four times per row per part
    (measured ~40% of the repetition profile's wall). Here ``cleaned`` is
    evaluated once (inside ``array_sort``) and one fold computes part
    count, char count, and their distinct-run versions together —
    O(p log p) per document, still zero shuffle and zero Python."""
    cleaned = F.filter(
        F.transform(F.split(F.col(text_col), sep), F.trim),
        lambda x: F.length(x) > 0,
    )
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        _long0().alias("n"),
        _long0().alias("chars"),
        _long0().alias("nd"),
        _long0().alias("cd"),
    )

    def step(acc, x):
        # equal parts are adjacent after the sort, so "first of a run" is
        # exactly "distinct part"; NULL-safe because prev starts NULL
        dup = F.coalesce(x == acc.prev, F.lit(False))
        return F.struct(
            x.alias("prev"),
            (acc.n + 1).alias("n"),
            (acc.chars + F.length(x)).alias("chars"),
            (acc.nd + F.when(dup, _long0()).otherwise(F.lit(1).cast("long"))).alias(
                "nd"
            ),
            (
                acc.cd + F.when(dup, _long0()).otherwise(F.length(x).cast("long"))
            ).alias("cd"),
        )

    r = F.aggregate(F.array_sort(cleaned), acc0, step)
    frac = F.when(r.n > 0, (r.n - r.nd) / r.n).otherwise(F.lit(0.0))
    char_frac = F.when(r.chars > 0, (r.chars - r.cd) / r.chars).otherwise(F.lit(0.0))
    return F.round(frac, 6), F.round(char_frac, 6)


def _top_ngram_cols(text_col: str, n: int) -> tuple[Column, Column]:
    """(n_grams, top_ngram_frac) as pure array expressions — sort the
    n-gram array and take the longest equal-run in one fold. O(t log t)
    per document with NO shuffle; the previous explode + two-stage groupBy
    formulation was linear too but paid a corpus-wide shuffle on
    (doc, gram) plus a rejoin, and at small split counts serialized the
    whole corpus through one reducer. (The truly quadratic alternative —
    counting each gram by filtering the array — is still avoided.)"""
    from routing_algorithm_for_graph_dbs_spark.operators.dedup import (
        normalize_text,
    )

    toks = F.split(normalize_text(F.col(text_col)), " ")
    k = F.size(toks) - (n - 1)
    shifted = [F.slice(toks, i + 1, k) for i in range(n)]
    grams = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.arrays_zip(*shifted),
            lambda x: F.concat_ws(" ", *[x.getField(str(i)) for i in range(n)]),
        )
    )
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        _long0().alias("run"),
        _long0().alias("best"),
        _long0().alias("n"),
    )

    def step(acc, x):
        run = F.when(
            F.coalesce(x == acc.prev, F.lit(False)), acc.run + 1
        ).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
            (acc.n + 1).alias("n"),
        )

    r = F.aggregate(F.array_sort(grams), acc0, step)
    frac = F.when(r.n > 0, r.best / r.n).otherwise(F.lit(0.0))
    return r.n, F.round(frac, 6)


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    parts: dict[str, str] | None = None,
) -> DataFrame:
    """Within-document repetition features (the Gopher/MassiveText-style
    quality filters: Rae et al. 2021 §A1.1, public report).

    For each named splitter in ``parts`` (default: ``line`` on newlines and
    ``para`` on blank lines, the Gopher units — pass e.g. ``{"word":
    r"\\s+"}`` for token-level repetition on unstructured corpora):

    - ``dup_<name>_frac``: fraction of non-empty parts that are repeated
      occurrences (second and later copies of an already-seen part).
    - ``dup_<name>_char_frac``: same, weighted by part characters.

    All pure array expressions over one scan (single sorted-run fold per
    part, see ``_dup_frac_cols``) — the filter runs at parquet scan speed
    with NO shuffle and no Python. Parts are trimmed; empties dropped;
    fractions are 0.0 for documents with no parts. Rounded to 6 for
    stable cross-engine comparison.
    """
    cols = []
    for name, sep in (parts or REPETITION_PARTS).items():
        frac, char_frac = _dup_frac_cols(text_col, sep)
        cols.append(frac.alias(f"dup_{name}_frac"))
        cols.append(char_frac.alias(f"dup_{name}_char_frac"))
    return df.select(key_col, *cols)


def top_ngram_fraction(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Fraction of a document's word n-grams taken by its single most
    frequent n-gram (the other half of the Gopher repetition filters —
    boilerplate/spam pages repeat one phrase over and over).

    Pure projection (``_top_ngram_cols``): no shuffle, no join, linear
    scan. Ties on count don't matter (only the max count is used).
    Documents with no n-grams (shorter than ``n`` words) get 0.0.
    """
    n_grams, frac = _top_ngram_cols(text_col, n)
    return df.select(
        F.col(key_col),
        n_grams.cast("long").alias("n_grams"),
        frac.alias("top_ngram_frac"),
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    parts: dict[str, str] | None = None,
    n: int = 2,
) -> DataFrame:
    """The full Gopher repetition filter set in ONE projection: per-part
    duplicate fractions plus the top-n-gram occupancy, each a single
    sorted-run fold — one scan of the corpus, zero shuffles, zero joins
    (``repetition_scores(df).join(top_ngram_fraction(df))`` reads the
    text twice and shuffles both sides on the key)."""
    cols = []
    for name, sep in (parts or REPETITION_PARTS).items():
        frac, char_frac = _dup_frac_cols(text_col, sep)
        cols.append(frac.alias(f"dup_{name}_frac"))
        cols.append(char_frac.alias(f"dup_{name}_char_frac"))
    n_grams, top_frac = _top_ngram_cols(text_col, n)
    cols.append(n_grams.cast("long").alias("n_grams"))
    cols.append(top_frac.alias("top_ngram_frac"))
    return df.select(key_col, *cols)


# RE2-compatible (and Java-regex-compatible) patterns so the DuckDB oracle
# scrubs identically: no backrefs, no lookaround, and no \s inside a
# negated class (Java's \s includes \x0B, RE2's does not — the explicit
# class below means both engines stop a URL at exactly the same chars).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = "https?://[^ \\t\\n\\x0B\\f\\r]+"


def scrub_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus scrubbing: mask URLs then emails with placeholder tokens and
    count what was masked — the standard PII/noise-reduction pass before
    training. Adds ``n_urls``, ``n_emails``, ``scrubbed`` (URLs first:
    an address inside a query string must count as part of its URL, not as
    a bare email). Pure column regexes — scan-speed, no shuffle."""
    t = F.col(text_col)
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_PATTERN), F.lit(0)))
    no_urls = F.regexp_replace(t, URL_PATTERN, "<URL>")
    n_emails = F.size(
        F.regexp_extract_all(no_urls, F.lit(EMAIL_PATTERN), F.lit(0))
    )
    scrubbed = F.regexp_replace(no_urls, EMAIL_PATTERN, "<EMAIL>")
    return (
        df.withColumn("n_urls", n_urls)
        .withColumn("n_emails", n_emails)
        .withColumn("scrubbed", scrubbed)
    )


def sentence_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_len: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-corpus duplicate-sentence statistics (the RefinedWeb/C4 "drop
    lines repeated across the corpus" filter, at sentence granularity —
    the canonical unit when documents are single-line).

    Splits each document on sentence terminators (``[.!?]+`` — identical
    Java-regex/RE2 semantics), keeps trimmed sentences of at least
    ``min_len`` chars, and marks a sentence duplicated when its lowercase
    md5 appears in >= ``min_docs`` DISTINCT documents. Returns per-doc
    ``(n_sentences, n_dup_sentences, dup_sentence_frac, dup_char_frac)`` —
    the columns a pipeline thresholds on to drop boilerplate-heavy pages.

    Scale shape: explode -> hash -> groupBy(hash) with map-side partial
    counts (the count-distinct collapses to (hash, doc) distinct first), a
    self-equi-join on the 16-byte digest, and one groupBy(doc). Sentences
    shuffle by digest, never by text; the 100 TB corpus moves md5s plus
    lengths. No Python, no UDFs, codegen throughout.
    """
    sents = (
        df.select(
            F.col(key_col),
            F.explode(F.split(F.col(text_col), r"[.!?]+")).alias("s"),
        )
        .withColumn("s", F.trim(F.col("s")))
        .filter(F.length("s") >= min_len)
        .select(
            key_col,
            F.md5(F.lower(F.col("s"))).alias("h"),
            F.length("s").alias("slen"),
        )
    )
    counts = (
        sents.select("h", key_col)
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
        .withColumn("_dup", F.lit(True))
    )
    per_doc = (
        sents.join(counts, "h", "left")
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_dup_sentences"),
            F.sum("slen").alias("n_chars_total"),
            F.sum(F.when(F.col("_dup"), F.col("slen")).otherwise(0)).alias("n_chars_dup"),
        )
    )
    return per_doc.select(
        key_col,
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_dup_sentences").cast("long").alias("n_dup_sentences"),
        F.round(F.col("n_dup_sentences") / F.col("n_sentences"), 6).alias(
            "dup_sentence_frac"
        ),
        F.round(
            F.when(F.col("n_chars_total") > 0, F.col("n_chars_dup") / F.col("n_chars_total"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_char_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks — the
    standard pre-embedding / context-window packing step. Chunk i starts at
    ``i * (chunk_size - overlap)``; a document emits chunks until one
    reaches its end (a doc at most ``chunk_size`` long emits exactly one).

    Returns ``(key, chunk_id, chunk_start, chunk_text, chunk_len)``.

    Scale shape: the chunk index materializes as ``sequence`` + ``explode``
    over a computed count — a map-side expansion with no shuffle and no
    Python; a 100 TB corpus chunks at scan speed and the output partitions
    inherit the input's. Char-based (tokenizer-agnostic) so two engines
    slice identically; token-aware pipelines run token_counts on the chunks.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    t = F.col(text_col)
    n = F.when(
        F.length(t) <= chunk_size, F.lit(1)
    ).otherwise(F.ceil((F.length(t) - F.lit(chunk_size)) / F.lit(stride)) + 1)
    out = (
        df.select(
            F.col(key_col),
            t.alias("_t"),
            F.explode(F.sequence(F.lit(0), (n - 1).cast("int"))).alias("chunk_id"),
        )
        .select(
            key_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("long").alias("chunk_start"),
            F.substring(
                F.col("_t"), F.col("chunk_id").cast("int") * stride + 1, chunk_size
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text").cast("long"))
    )
    return out


# domain = host part of a URL; same RE2/Java-compatible discipline as
# URL_PATTERN (character classes only, no lookaround)
DOMAIN_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def url_domains(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Explode every URL host mentioned in each document: (key, domain),
    lowercased, one row per OCCURRENCE (duplicates preserved — domain
    frequency is the signal for URL-based corpus filtering/blocklists).
    Map-side regex + explode; aggregate downstream on the domain key."""
    return df.select(
        key_col,
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(DOMAIN_PATTERN), F.lit(1))
        ).alias("domain"),
    ).withColumn("domain", F.lower(F.col("domain")))
