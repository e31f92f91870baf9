"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Beyond-reference surface for the training-data pipeline. Everything is
built from replace/length/split/regexp built-ins so it stays inside
whole-stage codegen AND is reproducible in ANSI SQL for the DuckDB
oracle (marker-word counting uses the replace-length trick instead of
engine-specific regex counting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol

# Small marker-word lists per language: enough signal for a heuristic
# n-gram/stopword language id on clean text.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " de ", " que ", " los ", " es "],
}

STOPWORDS_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]


def occurrence_count(col: Column, needle: str) -> Column:
    """# of occurrences of a literal substring, via the replace-length
    trick (portable across Spark and DuckDB, stays in codegen)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def _padded(col: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(col), F.lit(" "))


def lang_scores(text: Column) -> dict[str, Column]:
    padded = _padded(text)
    return {
        lang: sum(occurrence_count(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(df: DataFrame, text_col: str, out_col: str = "lang_guess") -> DataFrame:
    """Argmax of marker-word hit counts; 'und' (undetermined) when no
    marker fires. Deterministic tie-break: language order en,de,fr,es."""
    scores = lang_scores(qcol(text_col))
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    guess = F.lit("und")
    # Build from the LAST language backwards so earlier languages win ties.
    for lang in reversed(langs):
        guess = F.when(scores[lang] == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best > 0, guess).otherwise(F.lit("und"))
    return df.withColumn(out_col, guess)


def token_count(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count plus a BPE-ish subtoken count: letter
    runs + digit runs + punctuation characters each count as one token
    (the shape a byte-pair tokenizer's pre-tokenization produces)."""
    text = qcol(text_col)
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda t: t != ""))
    letter_runs = F.size(
        F.filter(F.split(text, "[^A-Za-z]+"), lambda t: t != "")
    )
    digit_runs = F.size(
        F.filter(F.split(text, "[^0-9]+"), lambda t: t != "")
    )
    punct_chars = F.length(text) - F.length(
        F.regexp_replace(text, r"[^\w\s]", "")
    )
    return df.select(
        *df.columns,
        ws.alias("n_tokens_ws"),
        (letter_runs + digit_runs + punct_chars).alias("n_tokens_bpeish"),
    )


def text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Length/punctuation/stopword quality features + a composite
    quality score in [0, 1]."""
    text = qcol(text_col)
    n_chars = F.length(text)
    words = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n_words = F.size(words)
    avg_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(0.0)
    punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    uppers = n_chars - F.length(F.regexp_replace(text, "[A-Z]", ""))
    upper_ratio = F.when(n_chars > 0, uppers.cast("double") / n_chars).otherwise(0.0)
    padded = _padded(text)
    stop_hits = sum(occurrence_count(padded, f" {w} ") for w in STOPWORDS_EN)
    stopword_ratio = F.when(
        n_words > 0, stop_hits.cast("double") / n_words
    ).otherwise(0.0)
    quality = (
        F.least(n_words.cast("double") / 20.0, F.lit(1.0)) * 0.4
        + F.least(stopword_ratio * 4.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(upper_ratio * 5.0, F.lit(1.0))) * 0.1
    )
    return df.select(
        *df.columns,
        n_chars.alias("n_chars_computed"),
        n_words.alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Normalized-content digest: lowercase, collapse whitespace, strip
    punctuation, md5. Whitespace/punct variants of the same text map to
    the same fingerprint."""
    text = qcol(text_col)
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^\w\s]", ""), r"\s+", " "
        )
    )
    return df.withColumn(out_col, F.md5(normalized))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    k: int = 8,
    window: int = 4,
    out_col: str = "fingerprints",
) -> DataFrame:
    """MOSS-style winnowing fingerprints: hash every character k-gram,
    then keep the minimum hash of each sliding window of ``window``
    consecutive k-grams. Two documents sharing any long-enough substring
    share fingerprints regardless of position — the rolling-hash
    document-fingerprinting primitive for near-dup detection at corpus
    scale (Schleimer, Wilkerson & Aiken, SIGMOD 2003).

    All array work is JVM-side higher-order functions (sequence /
    transform / slice / array_min); the "hash" is the md5 hex prefix of
    each k-gram, whose lexicographic min is engine-portable (identical
    in DuckDB), unlike engine-specific integer hash functions."""
    text = qcol(text_col)
    empty = F.array().cast("array<string>")
    n_grams = F.length(text) - F.lit(k - 1)
    # Guard every sequence(): Spark's sequence(1, n) with n < 1 yields a
    # DESCENDING run ([1, 0]), and slice(start=0) throws — short texts
    # must short-circuit to empty (CaseWhen evaluates lazily per row).
    hashes = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.substring(F.md5(F.substring(text, i, k)), 1, 8),
        ),
    ).otherwise(empty)
    # Stage the k-gram hash array as a REAL column before windowing:
    # referencing the expression inside the window lambda would re-hash
    # the whole document once per window (quadratic; measured 150x).
    tmp = f"__wf_{out_col}__"
    staged = df.withColumn(tmp, hashes)
    h = F.col(tmp)
    n_windows = F.size(h) - F.lit(window - 1)
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
            lambda j: F.array_min(F.slice(h, j, window)),
        ),
    ).otherwise(empty)
    return staged.withColumn(
        out_col, F.array_sort(F.array_distinct(mins))
    ).drop(tmp)
