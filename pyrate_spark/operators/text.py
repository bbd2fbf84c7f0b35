"""Text analysis for large-scale training-data pipelines.

All pure column algebra (JVM-side, whole-stage codegen): token counting,
quality scoring, language-ID heuristic, document fingerprinting. Every
function has an exact ANSI-SQL twin used as the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_WS = r"\s+"

# per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "es": ["el", "la", "que", "es"],
    "fr": ["le", "la", "et", "est"],
}


def _word_re(w: str) -> str:
    return rf"\b{w}\b"


# GPT-2-style pre-tokeniser pattern (contractions, space-prefixed word
# / number / symbol runs, residual whitespace) restricted to ASCII
# classes so Java regex (Spark) and RE2 (DuckDB) count identically
BPE_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
          r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenisation + two sub-token estimates: the 4
    chars/token heuristic and a BPE-ish pre-tokeniser regex match count
    (the GPT-2 pattern's ASCII core)."""
    toks = F.size(F.split(F.trim(F.col(text_col)), _WS))
    return docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.ceil(F.length(text_col) / F.lit(4)).cast("long").alias("n_subtokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).cast("long")
        .alias("n_bpe_pieces"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword ratios + composite quality score
    (the classic web-text quality gates, all in one projection)."""
    length = F.length(text_col)
    n_tok = F.size(F.split(F.trim(F.col(text_col)), _WS))
    n_punct = F.length(F.regexp_replace(text_col, r"[^.,!?;:]", ""))
    n_stop = sum((F.regexp_count(F.lower(F.col(text_col)),
                                 F.lit(_word_re(w)))
                  for w in LANG_MARKERS["en"]), F.lit(0))
    punct_ratio = n_punct.cast("double") / length
    stop_ratio = n_stop.cast("double") / n_tok
    mean_word_len = (length - n_tok + 1).cast("double") / n_tok
    score = (
        F.when(length < 50, 0.0).otherwise(1.0)
        * F.when(punct_ratio > 0.2, 0.5).otherwise(1.0)
        * F.when(stop_ratio < 0.01, 0.5).otherwise(1.0)
        * F.when((mean_word_len < 2) | (mean_word_len > 12), 0.5)
           .otherwise(1.0))
    return docs.select(
        "doc_id",
        length.alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID with deterministic tie-breaking
    (highest count wins; ties -> lexicographically first lang; zero
    hits -> 'und')."""
    scores = [
        sum((F.regexp_count(F.lower(F.col(text_col)), F.lit(_word_re(w)))
             for w in words), F.lit(0)).alias(f"score_{lang}")
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):           # earlier langs override ties
        pred = F.when((F.col(f"score_{lang}") == best) & (best > 0),
                      F.lit(lang)).otherwise(pred)
    return scored.select("doc_id", pred.alias("pred_lang"),
                         best.alias("marker_hits"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalised-content fingerprint: lowercase, strip non-alnum,
    collapse whitespace, md5. Stable across formatting changes."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
        _WS, " ")
    return docs.select("doc_id", F.md5(F.trim(norm)).alias("fp"))


# Rabin-Karp polynomial rolling-hash parameters: modulus < 2^31 keeps
# every intermediate (acc*B + c) under 2^39, safely inside int64 for
# both Spark's ANSI arithmetic and DuckDB
RH_BASE = 131
RH_MOD = 2147483647


def fingerprint_rolling(docs: DataFrame, text_col: str = "text",
                        window: int = 32) -> DataFrame:
    """Rolling-hash fingerprints (Rabin-Karp polynomial over char
    codes): the whole-document hash plus the minimum windowed hash —
    the content-defined-chunking primitive (a shifted byte keeps most
    window hashes intact, unlike md5-of-document). Pure fold/transform
    column algebra, no UDF; exactly reproducible in SQL.

    h(doc)   = fold(chars, 0, acc*B + code mod M)
    h_win(i) = hash of chars[i : i+window); min over i emitted
    """
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    full = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, c: (acc * RH_BASE + c) % RH_MOD)
    n = F.size(codes)
    starts = F.when(
        n <= window, F.array(F.lit(0))
    ).otherwise(F.sequence(F.lit(0), n - window))
    win_hashes = F.transform(
        starts,
        lambda i: F.aggregate(
            F.slice(codes, i + 1, window), F.lit(0).cast("long"),
            lambda acc, c: (acc * RH_BASE + c) % RH_MOD))
    return docs.select(
        "doc_id",
        full.alias("rh_full"),
        F.array_min(win_hashes).alias("rh_min_window"),
        n.alias("n_chars"))
