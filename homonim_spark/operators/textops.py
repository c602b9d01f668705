"""Text-analysis operators for large-scale training-data pipelines.

Everything here is JVM-side ``pyspark.sql.functions`` only — no Python UDFs —
so the hot path stays inside whole-stage codegen and predicate pushdown.
Each operator has an exact ANSI-SQL oracle (see ``__spark_entry__.oracle_sql``)
over the same tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: small deterministic English stopword list for the language-ID heuristic
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be",
]


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form used by
    fingerprinting and exact dedup."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (training-pipeline token counting baseline)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-like proxy: count of word/number/punctuation units from a
    regex segmentation (deterministic, JVM-side)."""
    # split into word-ish units; each ~4.5 chars of a word becomes a token
    words = F.size(F.split(F.trim(col), r"[^A-Za-z0-9]+"))
    chars = F.length(F.regexp_replace(col, r"\s+", ""))
    return (words + F.floor(chars / F.lit(16))).cast("long")


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column) -> Column:
    total = F.greatest(F.length(col), F.lit(1))
    punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return punct / total


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    return (
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
        / F.greatest(F.size(toks), F.lit(1))
    )


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic: rewards reasonable length and
    stopword presence, penalizes punctuation soup. All built-ins."""
    llen = F.log1p(F.length(col))
    return (
        F.lit(0.4) * F.least(llen / F.lit(8.0), F.lit(1.0))
        + F.lit(0.4) * F.least(stopword_ratio(col) * 4, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0)))
    )


def lang_id(col: Column) -> Column:
    """n-gram/stopword language-ID heuristic: 'en' when English stopwords
    make up a meaningful share of tokens, else 'unk'. Deterministic,
    SQL-expressible."""
    return F.when(stopword_ratio(col) >= 0.05, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 hex of the normalized text. md5 is
    bit-identical across Spark and DuckDB, so dedup decisions replicate
    exactly in the oracle."""
    return F.md5(normalize_text(col))


def span_text_profile(documents: DataFrame) -> DataFrame:
    """Text analysis over interleaved-span documents (input_hint schema):
    concatenate each document's text spans in offset order, then profile.
    ``array_join`` + ``filter`` keep everything JVM-side."""
    by_offset = F.array_sort(
        F.col("spans"),
        lambda l, r: F.when(l["offset"] < r["offset"], -1)
        .when(l["offset"] > r["offset"], 1).otherwise(0),
    )
    joined = F.array_join(
        F.transform(
            F.filter(by_offset, lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ),
        " ",
    )
    flat = documents.select(
        "doc_id", joined.alias("text"),
        F.size(F.filter(F.col("spans"), lambda s: s["kind"] == "media")).alias("n_media_spans"),
    )
    return text_profile(flat).join(flat.select("doc_id", "n_media_spans"), "doc_id")


def vocabulary_stats(documents: DataFrame, text_col: str = "text",
                     top_k: int = 50) -> DataFrame:
    """Corpus vocabulary: top-k words by document frequency with total
    term frequency — one explode + one groupBy (classic training-pipeline
    vocabulary pass; partial aggregation handles the heavy tail)."""
    words = documents.select(
        "doc_id", F.explode(tokens(normalize_text(F.col(text_col)))).alias("word")
    ).filter(F.length("word") > 0)
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("tf"),
             F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("word"))
        .limit(top_k)
    )


def length_histogram(documents: DataFrame, text_col: str = "text",
                     bucket: int = 100) -> DataFrame:
    """Document-length distribution: counts per ``bucket``-char bin — the
    standard corpus-curation length filter input."""
    b = F.floor(F.length(F.col(text_col)) / bucket).cast("long")
    return (
        documents.groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.length(F.col(text_col))).alias("total_chars"))
        .orderBy("bucket")
    )


def text_profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full text-analysis feature set."""
    c = F.col(text_col)
    return documents.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(mean_word_len(c), 6).alias("mean_word_len"),
        F.round(quality_score(c), 6).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
