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


# Multi-label public suffixes recognised by registrable_domain (an
# embedded, documented SUBSET of the public-suffix list — the operator
# contract is "PSL-shaped extraction with a pluggable suffix set", not
# a vendored copy of the full list; pass `extra_suffixes` for more)
MULTI_SUFFIXES = ("ac.uk", "co.in", "co.jp", "co.nz", "co.uk",
                  "com.au", "com.br", "gov.uk", "net.au", "org.uk")


def registrable_domain(docs: DataFrame, url_col: str = "url",
                       extra_suffixes: tuple[str, ...] = ()) -> DataFrame:
    """URL canonicalisation for per-site aggregation (the Common-Crawl
    pipeline's group-by-domain primitive): host extraction (scheme,
    userinfo and port stripped, lowercased) plus the registrable domain
    — the last two host labels, or three when the last two form a known
    multi-label public suffix (co.uk and friends).

    Pure column algebra on regexes/arrays shared verbatim with the SQL
    oracle (ASCII classes only, so Java regex and RE2 agree); one
    narrow projection, no shuffle — grouping by the result is the
    caller's (fine-grained, skew-diluted) shuffle key.
    """
    suffixes = sorted(set(MULTI_SUFFIXES) | set(extra_suffixes))
    raw = F.regexp_extract(F.col(url_col),
                           r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(raw), "^.*@", ""), ":[0-9]+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, n - 1, 2), ".")
    reg = (F.when(n <= 1, host)
            .when((n >= 3) & last2.isin(*suffixes),
                  F.array_join(F.slice(labels, n - 2, 3), "."))
            .otherwise(last2))
    return docs.select(
        "doc_id",
        host.alias("host"),
        reg.alias("registrable"),
        (host != reg).alias("is_subdomain"))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     max_top_word_frac: float = 0.2,
                     min_distinct_ratio: float = 0.3) -> DataFrame:
    """Gopher/C4-style repetition quality signals: per document the
    whitespace-token count, distinct-token ratio and top-token fraction
    (count of the most frequent token / all tokens), plus the keep/drop
    gate at the given thresholds (repetitious pages are the classic
    web-scrape failure mode those filters target).

    Scale shape: explode -> two partial-aggregable hash aggregations
    keyed on (doc_id, word) then doc_id — linear in corpus size with
    fine-grained (skew-diluted) shuffle keys, never the O(distinct x
    len) per-row array scan a lambda-based mode would cost on long
    documents. Emitting the top COUNT (not the word) keeps the result
    deterministic with no tie-break machinery. Empty documents drop
    out (no tokens -> no rows), documented like pair-less urls.
    """
    words = F.explode(
        F.filter(F.split(F.lower(F.trim(F.col(text_col))), _WS),
                 lambda w: w != "")).alias("word")
    per_word = (docs.select("doc_id", words)
                .groupBy("doc_id", "word").count())
    agg = (per_word.groupBy("doc_id")
           .agg(F.sum("count").alias("n_words"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("count").alias("top_count")))
    top_frac = F.col("top_count") / F.col("n_words")
    distinct_ratio = F.col("n_distinct") / F.col("n_words")
    return agg.select(
        "doc_id", "n_words", "n_distinct",
        F.round(top_frac, 6).alias("top_word_frac"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        ((top_frac <= max_top_word_frac)
         & (distinct_ratio >= min_distinct_ratio)).alias("keep"))


# PII patterns (name, regex, replacement): ASCII-class-only so Java
# regex (Spark) and RE2 (DuckDB) match identically; counts are taken
# on the ORIGINAL text per pattern, replacements apply sequentially in
# this order (an already-replaced placeholder is never re-scrubbed)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("longnum", r"\b[0-9]{9,}\b", "<NUM>"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: per-pattern match counts
    plus the scrubbed text (emails, dotted-quad IPs, long digit runs —
    account/phone-shaped — replaced by typed placeholders). One narrow
    shuffle-free projection of regexp_count/regexp_replace chains;
    patterns are a documented, auditable tuple, not a model."""
    counts = [F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
              .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select("doc_id", *counts,
                       scrubbed.alias("text_scrubbed"))


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
