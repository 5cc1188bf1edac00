"""Text-analysis column functions for the training-data pipeline:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure Spark Column expressions (JVM-side, codegen'd) built to be exactly
reproducible in ANSI SQL for the DuckDB oracle: integer arithmetic
everywhere a float hash-mismatch could creep in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic; deterministic and identical in the oracle SQL
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "du", "que", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "des", "ist"],
}

PUNCT_CLASS = "[.!?,;:]"
WORD_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(text), " "), lambda t: F.length(t) > 0)


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).alias("n_tokens")


def n_tokens_regex(text: Column) -> Column:
    """BPE-ish token count: word / number / single-symbol pieces."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(WORD_REGEX), 0))


def punct_count(text: Column) -> Column:
    """Punctuation count via length delta (portable to any SQL dialect)."""
    return (F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, "")))


def stopword_count(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    # per-occurrence count (array_intersect would dedupe)
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def quality_score(text: Column) -> Column:
    """Integer-permille quality heuristic: stopword ratio + length band +
    punctuation density, all integer arithmetic (order-independent, exact
    in both Spark and the DuckDB oracle)."""
    nt = F.size(tokens(text))
    stop_permille = F.floor(F.lit(1000) * stopword_count(text) /
                            F.greatest(nt, F.lit(1))).cast("long")
    punct_permille = F.floor(F.lit(1000) * punct_count(text) /
                             F.greatest(F.length(text), F.lit(1))).cast("long")
    len_band = F.least(F.floor(F.length(text) / F.lit(100)), F.lit(10)).cast("long")
    return (stop_permille + F.lit(100) * len_band - punct_permille).alias("quality")


def lang_scores(text: Column) -> list[Column]:
    """One integer stopword-hit count per language."""
    toks = tokens(text)
    cols = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        cols.append(F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
                    .cast("long").alias(f"score_{lang}"))
    return cols


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))).alias("fingerprint")


def hash60(s: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5.

    Matches DuckDB's ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash31(s: Column) -> Column:
    """Portable 31-bit integer hash (safe for a*h+b minhash arithmetic
    without int64 overflow in either engine)."""
    return F.pmod(F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
                  F.lit(2147483647))


WINNOW_B = 131
WINNOW_P = 2147483647


def winnow_token_hashes(toks: Column) -> Column:
    """Stage 1 of winnowing (Schleimer et al., SIGMOD'03 rolling-hash
    document fingerprints): per-token portable 31-bit hashes.  ``toks``
    must be an ALREADY-MATERIALIZED token-array column, and each stage's
    output must be materialized before the next stage's HOF consumes it
    (see shingles_of_tokens' perf note — HOF lambdas are interpreted)."""
    return F.transform(toks, lambda t: F.pmod(
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        F.lit(WINNOW_P)))


def winnow_from_hashes(hs: Column, k: int = 3, w: int = 4) -> Column:
    """Second stage of winnowing over a MATERIALIZED token-hash array
    column: k-gram rolling hashes -> sliding-window minima -> distinct."""
    b2 = WINNOW_B * WINNOW_B
    grams = F.transform(
        F.sequence(F.lit(0), F.size(hs) - F.lit(k)),
        lambda i: (hs[i] * F.lit(b2) + hs[i + F.lit(1)] * F.lit(WINNOW_B)
                   + hs[i + F.lit(2)]) % F.lit(WINNOW_P))
    # < k tokens: single-hash fallback; zero-token docs yield an EMPTY
    # array.  Element access MUST be F.get (null on out-of-bounds):
    # under Spark 4's default ANSI mode hs[0] on [] RAISES
    # INVALID_ARRAY_INDEX — CaseWhen is lazy per row, so the sf corpus
    # (no short docs) never hit it; the randomized-corpus oracle gate
    # (tests/test_oracle_random_corpus.py) did.  The null is filtered so
    # zero-token docs emit nothing, matching DuckDB's list_distinct
    # NULL-stripping (ADVICE r2).
    short = F.filter(F.array(F.get(hs, 0)), lambda v: v.isNotNull())
    return F.when(F.size(hs) >= k, grams).otherwise(short)


def winnow_windows(grams: Column, w: int = 4) -> Column:
    """Distinct sorted minima of every w-wide window over a MATERIALIZED
    gram-array column (windows clamp to the array when it is shorter)."""
    n_win = F.greatest(F.size(grams) - F.lit(w), F.lit(0))
    mins = F.transform(
        F.sequence(F.lit(0), n_win),
        lambda j: F.array_min(F.slice(grams, j + F.lit(1), w)))
    # array_min of an empty slice is null (empty gram array) — strip, so
    # zero-token docs fingerprint to [] like the DuckDB oracle
    return F.array_sort(F.array_distinct(
        F.filter(mins, lambda m: m.isNotNull())))


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, appendix A1.1 —
# public paper).  The repetition-family rule lives in the catalog's
# repetition_ratio query; these are the word-statistics family.  Every
# rule is integer arithmetic on counts (ratio thresholds become integer
# cross-multiplications), so the flags are bit-identical in the DuckDB
# oracle and never sensitive to float division.
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100000
#: required-stopword rule: the document must contain at least 2 DISTINCT
#: members ("the" + one more) — Gopher's "contains at least 2 of a small
#: set of stop words" rule, with a set chosen to discriminate on the
#: synthetic corpus vocabulary
GOPHER_REQ_STOPWORDS = ["the", "a", "and", "of"]


def gopher_flags(text: Column, toks: Column) -> list[Column]:
    """Gopher word-statistics rule columns over an ALREADY-MATERIALIZED
    token-array column (the HOF rule: the split is computed once in the
    caller's projection, not re-evaluated inside each consumer).

    Counts avoid per-element HOF work where a single JVM regexp can
    produce the same number:
    - ``sum_word_chars`` = length with spaces removed (tokens are the
      non-space runs, so this IS the sum of token lengths);
    - ``n_alpha_words`` = maximal non-space runs containing a letter
      (greedy ``[^ ]*[a-z][^ ]*`` matches each such run exactly once).

    Rules (integer cross-multiplied):
      r_words:  GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS
      r_mean:   3 <= mean word length <= 10   (3n <= chars AND chars <= 10n)
      r_symbol: symbol-to-word ratio <= 0.1   (10 * n_symbols <= n_words)
      r_alpha:  >= 80% of words contain a letter (5 * n_alpha >= 4 * n)
      r_stop:   >= 2 distinct required stopwords present
      keep:     all of the above
    """
    low = F.lower(text)
    n_words = F.size(toks).cast("long")
    sum_chars = F.length(F.regexp_replace(low, " ", "")).cast("long")
    n_alpha = F.size(F.regexp_extract_all(
        low, F.lit("[^ ]*[a-z][^ ]*"), 0)).cast("long")
    n_sym = (F.regexp_count(low, F.lit("#"))
             + F.regexp_count(low, F.lit(r"\.\.\."))).cast("long")
    req = F.array(*[F.lit(w) for w in GOPHER_REQ_STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, req)).cast("long")
    r_words = ((n_words >= GOPHER_MIN_WORDS)
               & (n_words <= GOPHER_MAX_WORDS)).cast("long")
    r_mean = ((F.lit(3) * n_words <= sum_chars)
              & (sum_chars <= F.lit(10) * n_words)).cast("long")
    r_symbol = (F.lit(10) * n_sym <= n_words).cast("long")
    r_alpha = (F.lit(5) * n_alpha >= F.lit(4) * n_words).cast("long")
    r_stop = (n_stop >= 2).cast("long")
    keep = ((r_words == 1) & (r_mean == 1) & (r_symbol == 1)
            & (r_alpha == 1) & (r_stop == 1)).cast("long")
    return [
        n_words.alias("n_words"), sum_chars.alias("sum_word_chars"),
        n_alpha.alias("n_alpha_words"), n_sym.alias("n_symbols"),
        n_stop.alias("n_req_stop"),
        r_words.alias("r_words"), r_mean.alias("r_mean"),
        r_symbol.alias("r_symbol"), r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"), keep.alias("keep"),
    ]


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data scrubbing).  Pure JVM regexp
# expressions; the patterns stay inside the (large) dialect intersection of
# Java regex and DuckDB's RE2 — character classes, bounded repetition and
# \b only, no lookaround — so the oracle runs them verbatim.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+1-555-\d{4}"


def pii_counts(text: Column) -> list[Column]:
    """(n_emails, n_ips, n_phones) as long columns."""
    return [
        F.regexp_count(text, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    ]


def redact_pii(text: Column) -> Column:
    """Replace every email/IPv4/phone match with a typed mask token.
    Order matters only if patterns overlap — these can't (an email match
    contains '@', an IPv4 match is digits-and-dots, a phone match starts
    with '+'), so the three replacements commute and one fixed order is
    canonical for the oracle."""
    r = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    r = F.regexp_replace(r, PII_IPV4, "<IP>")
    return F.regexp_replace(r, PII_PHONE, "<PHONE>")
