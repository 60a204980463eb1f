"""Text-analysis operators for training-data pipelines.

All JVM-side built-ins — no Python UDFs anywhere in this module, so every
operator rides whole-stage codegen and scales linearly with executors.
Canonical tokenization (shared with dedup.py so signatures agree):
``lower → trim → split on \\s+ → drop empties``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword sets for heuristic language ID. Chosen for
# determinism, not linguistic completeness — the operator contract is
# "same text → same label", which is what a 100 TB corpus filter needs.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "zu"],
}
LANG_ORDER = ["en", "fr", "es", "de"]  # deterministic tie-break order

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"

# GPT-2-style pretokenizer classes (letters / digits / other, optional
# leading space). No groups, no backreferences → identical semantics under
# Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def tokens_expr(col: Column | str) -> Column:
    """lower/trim/whitespace-split token array, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.split(F.lower(F.trim(c)), r"\s+")
    return F.filter(raw, lambda t: t != F.lit(""))


def shingles_expr(tokens: Column, k: int = 3) -> Column:
    """Word k-gram array from a token array (empty when < k tokens)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (k - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j) for j in range(k)])
    return F.when(F.size(tokens) >= k, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens, a chars/4 BPE-style estimate
    (the standard "1 token ≈ 4 chars" heuristic, exact-integer math), and
    the pretokenization-accurate GPT-2-class regex count."""
    toks = tokens_expr(text_col)
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.ceil(F.length(F.trim(F.col(text_col))) / F.lit(4)).alias("n_tokens_bpe_est"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), F.lit(0)))
        .cast("bigint")
        .alias("n_tokens_regex"),
    )


def quality_exprs(toks: Column, text: Column) -> dict[str, Column]:
    """The quality-score expression family over a token array + trimmed
    text (single definition shared by `quality_score` and the one-pass
    `corpus_datasheet`): mean token length, punctuation ratio, stopword
    ratio, composite score — all exact-integer-derived doubles so the
    arithmetic is engine-portable. Only meaningful where size(toks) > 0."""
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    token_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    punct_ratio = n_punct.cast("double") / n_chars
    stop_ratio = n_stop.cast("double") / n_tokens
    score = (
        F.when(n_tokens >= 5, F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when((punct_ratio) < 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return {
        "n_tokens": n_tokens,
        "mean_token_len": token_chars.cast("double") / n_tokens,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality signals: token count, mean token length, punctuation ratio,
    stopword ratio, and a composite score — all exact-integer-derived
    doubles so the arithmetic is engine-portable."""
    q = quality_exprs(tokens_expr(text_col), F.trim(F.col(text_col)))
    return df.where(q["n_tokens"] > 0).select(
        F.col(id_col),
        q["n_tokens"].cast("bigint").alias("n_tokens"),
        F.round(q["mean_token_len"], 4).alias("mean_token_len"),
        F.round(q["punct_ratio"], 4).alias("punct_ratio"),
        F.round(q["stopword_ratio"], 4).alias("stopword_ratio"),
        q["quality_score"].alias("quality_score"),
    )


def lang_pred_exprs(toks: Column) -> tuple[Column, Column]:
    """`(pred_lang, best_ratio)` expression pair over a token array —
    single definition shared by `language_id` and the one-pass
    `corpus_datasheet`. Per-language stopword hit ratio, argmax with the
    fixed `LANG_ORDER` tie-break, 'und' when nothing hits. Only
    meaningful where size(toks) > 0."""
    ratios = {
        lang: (
            F.size(F.filter(toks, lambda t: t.isin(words))).cast("double")
            / F.size(toks)
        )
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*[ratios[lang] for lang in LANG_ORDER])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:  # first max wins — deterministic
        pred = pred.when(ratios[lang] == best, F.lit(lang))
    return pred, best


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic n-gram/stopword language ID: per-language stopword hit
    ratio, argmax with fixed tie-break order, 'und' when nothing hits."""
    df = df.select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    ).where(F.size("__toks") > 0)
    pred, best = lang_pred_exprs(F.col("__toks"))
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        F.round(best, 4).alias("confidence"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Document fingerprint: min word-k-gram md5 (a 1-seed MinHash — the
    rolling-hash/winnowing family reduced to its cheapest deterministic
    member) + distinct shingle count. Array ops per row, no shuffle."""
    # Materialize tokens, then shingles, in separate projections: repeated
    # references inside higher-order functions are not CSE'd, so inlining
    # would re-run the tokenizer per array index.
    toks = df.select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    sh = toks.where(F.size("__toks") >= k).select(
        F.col(id_col), F.array_distinct(shingles_expr(F.col("__toks"), k)).alias("__sh")
    )
    return sh.select(
        F.col(id_col),
        F.array_min(F.transform(F.col("__sh"), F.md5)).alias("fingerprint"),
        F.size("__sh").cast("bigint").alias("n_shingles"),
    )


def normalize_text_expr(col: Column | str) -> Column:
    """Canonical text normalization for corpus prep: strip URLs, drop
    non-printable-ASCII characters, collapse whitespace runs, lowercase,
    trim. Plain-ASCII regexes only, so the expression means the same thing
    under Java regex (Spark) and RE2 (DuckDB) — the oracle-portability
    constraint."""
    c = F.col(col) if isinstance(col, str) else col
    no_urls = F.regexp_replace(c, r"https?://[^\s]+", " ")
    printable = F.regexp_replace(no_urls, r"[^ -~]", " ")
    collapsed = F.regexp_replace(printable, r"\s+", " ")
    return F.lower(F.trim(collapsed))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-size token windows per document — the chunking
    pass feeding RAG indexing and long-context training sets.

    Window starts step by ``stride``; the FINAL start is clamped to
    ``n - chunk_tokens`` so every chunk is full-size (the tail overlaps a
    little more instead of emitting a fragment), except single-chunk docs
    shorter than ``chunk_tokens``. Pure per-row array math (sequence →
    slice → posexplode): no shuffle, no UDFs, output rows ∝ corpus
    tokens / stride. Chunk identity is (doc_id, chunk_idx) — stable
    across runs for incremental index maintenance.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), tokens_expr(text_col).alias("__t")
    ).where(F.size("__t") > 0)
    n = F.size("__t")
    n_starts = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / F.lit(stride)).cast("int")
        + F.lit(1)
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.least(i * stride, F.greatest(n - chunk_tokens, F.lit(0))),
    )
    chunks = F.transform(
        starts, lambda s: F.slice(F.col("__t"), s + 1, chunk_tokens)
    )
    return toks.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__chunk")
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
        F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
    )


def train_val_split_expr(
    id_col: Column | str, val_fraction_pct: int = 10
) -> Column:
    """Deterministic train/val assignment: bucket = md5(id) mod 100, rows
    with bucket < ``val_fraction_pct`` are 'val'. Content-addressed and
    engine-portable — the correct splitter at 100 TB, where ``rand()`` is
    irreproducible across retries/partitions and sorting for a slice is a
    global shuffle. The same id lands in the same split in every engine,
    run, and cluster layout."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint") % 100
    )
    return F.when(bucket < val_fraction_pct, F.lit("val")).otherwise(F.lit("train"))


def corpus_datasheet(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-row corpus datasheet — the summary a training-data team
    publishes alongside a dataset release: document and token volume,
    exact-duplicate rate, language mix, and quality-score mix, built from
    the SAME expression definitions as the per-doc operators
    (`quality_exprs`, `lang_pred_exprs`, the shared tokenizer) so the
    datasheet can never drift from the signals it summarizes.

    Scale shape: ONE corpus scan. Every per-doc signal (token counts,
    language prediction, quality score, the sha2 dedup digest) is a
    per-row projection built from the same expression definitions the
    standalone operators use (`quality_exprs`, `lang_pred_exprs`), so the
    whole datasheet is a single map-side-combinable aggregate — at 100 TB
    the naive compose-and-cross-join shape costs 5 full scans; this costs
    one. Docs with zero tokens carry NULL language/quality signals, and
    the null-skipping aggregates reproduce exactly the standalone
    operators' `size(toks) > 0` populations. The dup rate is a
    countDistinct on a 32-byte sha2 digest — constant-width keys, same as
    exact dedup.
    """
    # Materialize the token array ONCE in its own projection: the quality
    # and language expressions reference it dozens of times, and repeated
    # references inside higher-order functions are not CSE'd — inlining
    # would re-run the regex split per reference (same trap documented on
    # `fingerprint` and `_eval_train_shingles`).
    prepped = df.where(F.col(text_col).isNotNull()).select(
        F.col(text_col).alias("__text"),
        F.trim(F.col(text_col)).alias("__trimmed"),
        tokens_expr(text_col).alias("__toks"),
    )
    q = quality_exprs(F.col("__toks"), F.col("__trimmed"))
    pred, _best = lang_pred_exprs(F.col("__toks"))
    has_toks = F.size("__toks") > 0
    signals = prepped.select(
        F.size("__toks").cast("bigint").alias("__n_tokens"),
        F.ceil(F.length("__trimmed") / F.lit(4)).alias("__bpe"),
        F.length("__trimmed").cast("bigint").alias("__chars"),
        F.sha2(F.col("__text"), 256).alias("__sha"),
        F.when(has_toks, pred).alias("__lang"),
        F.when(has_toks, q["quality_score"]).alias("__q"),
    )
    row = signals.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__n_tokens").cast("bigint").alias("n_tokens_total"),
        F.sum("__bpe").cast("bigint").alias("n_tokens_bpe_total"),
        F.sum("__chars").cast("bigint").alias("n_chars_total"),
        (F.count(F.lit(1)) - F.countDistinct("__sha"))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        *[
            F.sum((F.col("__lang") == lang).cast("int"))
            .cast("bigint")
            .alias(f"n_{lang}")
            for lang in LANG_ORDER + ["und"]
        ],
        F.round(F.sum("__q") / F.count("__q"), 4).alias("mean_quality"),
        F.sum((F.col("__q") == 3.0).cast("int")).cast("bigint").alias("n_full_quality"),
    )
    return row.select(
        "n_docs",
        "n_tokens_total",
        "n_tokens_bpe_total",
        "n_chars_total",
        "n_exact_dup_docs",
        F.round(
            F.col("n_exact_dup_docs").cast("double") / F.col("n_docs"), 6
        ).alias("exact_dup_frac"),
        F.round(
            F.col("n_tokens_total").cast("double") / F.col("n_docs"), 4
        ).alias("mean_doc_tokens"),
        *[f"n_{lang}" for lang in LANG_ORDER + ["und"]],
        "mean_quality",
        "n_full_quality",
    )
