"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, document fingerprinting.

Beyond-reference operators (the reference is a log CLI); these run over
``documents(doc_id, text, lang, source, n_chars)``-shaped tables. All of
them are pure Catalyst expressions — no Python in the hot path — and
each has an ANSI-SQL twin (see ``__spark_entry__.oracle_sql``) built
from the SAME constants below, so Spark and DuckDB verify each other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | single digits | single punct.
# ASCII-only classes keep Spark (Java regex) and DuckDB (RE2) in agreement.
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
WS_RE = r"\s+"

# Tiny per-language stopword markers for the n-gram/stopword langid
# heuristic. Deterministic argmax with lexicographic tie-break.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht", "das", "ein", "mit"],
    "en": ["the", "and", "of", "is", "not", "that", "a", "with"],
    "es": ["el", "la", "y", "es", "no", "que", "un", "con"],
    "fr": ["le", "la", "et", "est", "pas", "que", "un", "avec"],
}

# Rolling polynomial fingerprint parameters (shared with the SQL twin).
FP_BASE = 31
FP_MOD = 1_000_000_007


def _words(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), WS_RE)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document counting + quality features.

    Columns: n_chars, n_ws_tokens (whitespace tokens), n_bpe_tokens
    (BPE-ish regex pre-tokens), n_punct, punct_ratio, stopword_ratio
    (English markers), mean_token_chars, quality_score in [0, 1].
    """
    text = F.col(text_col)
    words = _words(text)
    n_ws = F.size(words)
    n_bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_chars = F.length(text)
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*LANG_MARKERS["en"]))
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_ws, F.lit(1)), 6)
    mean_tok = F.round(n_chars / F.greatest(n_ws, F.lit(1)), 6)
    # quality: long enough, some stopwords, not punctuation soup,
    # word lengths in a natural band — each term in [0,1].
    quality = F.round(
        0.25 * F.least(n_ws / F.lit(50.0), F.lit(1.0))
        + 0.25 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.25 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + 0.25 * F.when((mean_tok >= 3) & (mean_tok <= 12), 1.0).otherwise(0.0),
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok.alias("mean_token_chars"),
        quality.alias("quality_score"),
    )


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language-ID: per-language hit ratio + argmax.

    Ties (including the all-zero case) break lexicographically — 'de'
    wins an all-zero row, making the output fully deterministic.
    """
    words = _words(F.col(text_col))
    n = F.greatest(F.size(words), F.lit(1))
    cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.filter(words, lambda w: w.isin(*markers)))
        cols.append(F.round(hits / n, 6).alias(f"score_{lang}"))
    out = docs.select("doc_id", *cols)
    # argmax with lexicographic tie-break: compare (score, reversed-name)
    langs = sorted(LANG_MARKERS)
    best = F.col(f"score_{langs[0]}")
    pred = F.lit(langs[0])
    for lang in langs[1:]:
        is_better = F.col(f"score_{lang}") > best
        pred = F.when(is_better, lang).otherwise(pred)
        best = F.when(is_better, F.col(f"score_{lang}")).otherwise(best)
    return out.withColumn("lang_pred", pred)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash over the normalized character stream:
    ``h = (h*31 + ascii(ch)) mod 1e9+7``. A stable 64-bit-safe document
    fingerprint computable identically in any engine with a fold."""
    norm = F.lower(F.regexp_replace(F.col(text_col), WS_RE, " "))
    chars = F.split(norm, "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_BASE + F.ascii(ch)) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))
