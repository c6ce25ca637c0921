"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, document fingerprinting.

No reference analogue (the reference's text surface is Bloblang string
methods, /root/reference/internal/bloblang/query/methods_strings.go) —
these are the large-scale-pipeline ops the engine adds. Everything here is
built-in Spark SQL expressions (JVM whole-stage codegen, no Python), and
each formula is deliberately mirrorable in ANSI SQL so the DuckDB oracle
can verify it bit-for-bit.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram-free heuristic language ID.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "para", "en", "no"],
}

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/piece regex: runs of letters, runs of digits, or single
# non-space symbols — a public GPT-2-style pre-tokenizer approximation.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), TOKEN_SPLIT_RE)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish piece count via the public GPT-2-style pre-tokenizer regex.

    regexp_count, not size(regexp_extract_all(...)): same non-overlapping
    match count without materializing every piece as a string array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_RE))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # count the punctuation class directly — identical to
    # length(regexp_replace(c, [^.!?,;:], '')) without building the
    # stripped string per row
    puncts = F.regexp_count(c, F.lit(r"[.!?,;:]"))
    return F.round(puncts / F.greatest(F.length(c), F.lit(1)), 6)


def _stopword_hits(c: Column, words: list[str]) -> Column:
    """Token-exact stopword occurrence count WITHOUT interpreted HOFs
    (CLAUDE.md bans F.filter lambdas in hot per-row paths): pad the
    whitespace-normalized lowercase text with spaces so every token is
    space-delimited, then regexp_count ' (w1|w2|...)(?= )' — the lookahead
    keeps consecutive stopwords countable. Bit-identical to
    size(filter(tokens, == w)) and to the DuckDB list_filter oracles."""
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), F.lit(" ")
    )
    pat = " (?:" + "|".join(re.escape(w) for w in words) + ")(?= )"
    return F.regexp_count(padded, F.lit(pat))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    hits = _stopword_hits(c, LANG_STOPWORDS[lang])
    return F.round(hits / F.greatest(F.size(tokens(F.lower(c))), F.lit(1)), 6)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    healthy stopword ratio. Deterministic, SQL-mirrorable."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    len_ok = F.when((n >= 5) & (n <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(c) < 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(c) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(len_ok + punct_ok + sw_ok, 6)


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _stopword_hits(c, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(col: Column | str) -> Column:
    """argmax language by stopword hits; ties broken by fixed lang order;
    'und' (undetermined) when no stopword hits at all."""
    scores = lang_scores(col)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(best == 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (stable across
    engines; the rolling-hash variant is fingerprint_rolling)."""
    return F.md5(normalize_text(col))


def fingerprint_rolling(col: Column | str, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over normalized bytes — mirrorable in SQL via
    list reduce. NOTE: F.transform/F.aggregate run INTERPRETED per
    character; this is the demonstration/oracle variant — the hot-path
    fingerprint is `fingerprint` (md5, codegen)."""
    c = normalize_text(col)
    # fold over code points: h = (h*base + cp) % mod
    cps = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        cps,
        F.lit(0).cast("long"),
        lambda acc, cp: (acc * base + cp) % F.lit(mod),
    )


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumns(
        {
            "n_tokens": token_count(col),
            "n_bpe": bpe_token_count(col),
            "punct_ratio": punct_ratio(col),
            "stopword_ratio": stopword_ratio(col),
            "quality": quality_score(col),
            "lang_pred": lang_id(col),
            "fp": fingerprint(col),
        }
    )
