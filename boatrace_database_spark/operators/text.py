"""Text-analysis operators for document tables (tokenize, quality score,
language-ID heuristic, fingerprinting).

Everything is built-in `pyspark.sql.functions` — JVM-side, whole-stage
codegen, no Python in the row path. At 100 TB these are embarrassingly
parallel scans with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword core — enough for ratio features / lang-ID.
EN_STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on", "with",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


# GPT-2-style pre-tokenizer core: letter runs, digit runs, single
# punctuation marks. A real BPE then merges within these pieces, so
# this count upper-bounds (and tracks) BPE token counts without a vocab.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Subword-style token count via the BPE pre-tokenizer regex —
    JVM-side regexp_count, no vocabulary needed."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    stop = F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))
    return F.size(stop) / F.greatest(F.size(toks), F.lit(1))


def digit_ratio(text: Column) -> Column:
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return digits / F.greatest(F.length(text), F.lit(1))


def avg_word_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low digit noise,
    sane stopword density. Deterministic arithmetic (oracle-friendly)."""
    length_term = F.least(char_count(text) / F.lit(500.0), F.lit(1.0))
    digit_term = 1 - digit_ratio(text)
    stop_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return (length_term + digit_term + stop_term) / 3


def lang_id(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic. With richer per-language
    stopword lists this extends naturally; the structure (score per
    language, argmax) is the real operator."""
    toks = tokens(F.lower(text))
    en_score = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(en_score >= 2, F.lit("en")).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace). Engine-portable and deterministic."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normalized)


def rolling_hash(text: Column, modulus: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (deterministic, portable):
    h = sum(code(c_i) * base^i) mod modulus, via a higher-order fold."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.struct(F.lit(0).cast("long").alias("h"), F.lit(1).cast("long").alias("p")),
        lambda acc, c: F.struct(
            ((acc.h + F.ascii(c) * acc.p) % modulus).alias("h"),
            ((acc.p * base) % modulus).alias("p"),
        ),
        lambda acc: acc.h,
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text features at once (single scan)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_chars_computed": char_count(t),
            "stopword_ratio": F.round(stopword_ratio(t), 6),
            "digit_ratio": F.round(digit_ratio(t), 6),
            "quality": F.round(quality_score(t), 6),
            "lang_pred": lang_id(t),
            "fingerprint": fingerprint(t),
        }
    )


def top_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 25,
) -> DataFrame:
    """Top-k word n-grams by DOCUMENT frequency (ties broken on the
    n-gram string) — the corpus-vocabulary dial.

    The companion to ``minhash_table(..., max_df=)``: before choosing a
    boilerplate cutoff you LOOK at what the most document-frequent
    shingles are (license headers, templates, navigation chrome all
    surface here first). Document frequency, not occurrence count, so
    a single spammy document cannot promote its pet phrase.

    Scale shape: reuses the dedup inverted index (explode distinct
    shingles per doc), one count-distinct aggregate with map-side
    partials, then a k-row TakeOrdered on the (vocabulary-sized, far
    smaller than the corpus) aggregate — the same two-exchange plan at
    any corpus size.
    """
    from boatrace_database_spark.operators.dedup import shingle_table

    sh = shingle_table(df, id_col, text_col, n)
    return (
        sh.groupBy("shingle")
        .agg(F.countDistinct("id").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "shingle")
        .limit(k)
    )
