"""Text-analysis column expressions for training-data pipelines.

Beyond the reference's operator set (SURVEY §2 "training-data pipeline"
extension): language ID, quality scoring, token counting, and document
fingerprinting — all pure Catalyst expressions so they run inside
whole-stage codegen over 100 TB scans with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword gazetteers for the n-gram/stopword heuristic
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "que", "por"],
}

#: a BPE-ish token pattern: words, numbers, or single non-space symbols
_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokenize(col: Column | str) -> Column:
    """Split into word / number / symbol tokens (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.regexp_extract_all(F.coalesce(c, F.lit("")), F.lit(_TOKEN_PATTERN), 0),
        lambda t: t != F.lit(""),
    )


def token_count(col: Column | str) -> Column:
    """Approximate token count (BPE-ish regex, int)."""
    return F.size(tokenize(col)).cast("int")


def detect_lang(col: Column | str) -> Column:
    """Heuristic language ID: argmax of stopword hits per language.

    Returns 'und' when no stopword matches. Expressed as a when-chain of
    JVM-side counts — at scale this is a single pass over the tokens.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.lower(F.coalesce(c, F.lit(""))), r"\s+")
    scores = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in sw])))
        for lang, sw in _LANG_STOPWORDS.items()
    }
    # count distinct stopwords hit; pick max with deterministic tiebreak
    best = None
    for lang in sorted(_LANG_STOPWORDS):
        cond = scores[lang]
        entry = F.struct(cond.alias("score"), F.lit(lang).alias("lang"))
        best = entry if best is None else F.when(
            entry["score"] > best["score"], entry
        ).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: Column | str) -> Column:
    """Document quality in [0,1]: length, punctuation and stopword ratios.

    score = 0.4*len_ok + 0.3*(1 - punct_ratio clipped) + 0.3*stopword_signal
    Deterministic, expression-only — mirrors common pretraining-data
    quality filters (Gopher/C4-style rules).
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    n_chars = F.length(c)
    words = F.split(F.lower(c), r"\s+")
    n_words = F.size(F.filter(words, lambda w: w != F.lit("")))
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    en_sw = F.array(*[F.lit(w) for w in _LANG_STOPWORDS["en"]])
    sw_hits = F.size(F.array_intersect(words, en_sw))
    len_ok = F.when((n_words >= 5) & (n_words <= 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    sw_signal = F.least(sw_hits.cast("double") / F.lit(3.0), F.lit(1.0))
    punct_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))
    )
    return F.round(0.4 * len_ok + 0.3 * punct_term + 0.3 * sw_signal, 6)


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of normalized text).

    Used for exact dedup at scale: groupBy(fingerprint) shuffles 16-byte
    keys instead of full documents.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " "))
    return F.md5(norm)


def corpus_profile(
    df,
    group_col: str = "lang",
    value_col: str = "n_chars",
    approx: bool = True,
    accuracy: int = 10000,
):
    """Per-group corpus length profile (count / mean / p50 / p90 / max).

    ``approx=True`` (the engine default) uses ``approx_percentile``
    (Greenwald-Khanna sketch): the aggregation buffer is O(accuracy) per
    group regardless of group size, so the profile survives 100-TB groups.
    ``accuracy`` bounds the rank error at ``1/accuracy`` of the group size
    (10000 → 0.01% rank error, ~80 KB per group-sketch).

    ``approx=False`` uses Spark's exact ``percentile``, which buffers
    EVERY group value in the agg buffer — it exists only for small inputs
    where bit-equality with an external engine's ``quantile_cont`` is
    required (the driver contract's ``corpus_stats`` query pins exact for
    that reason); never use it on corpus-scale groups.
    """
    pexpr = (
        f"approx_percentile({value_col}, array(0.5, 0.9), {accuracy})"
        if approx
        else f"array(percentile({value_col}, 0.5), percentile({value_col}, 0.9))"
    )
    # one percentile aggregate (the sketch), elements projected after
    agged = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(value_col), 6).alias(f"avg_{value_col}"),
        F.expr(pexpr).alias("_pcts"),
        F.max(value_col).alias(f"max_{value_col}"),
    )
    return agged.select(
        group_col,
        "n_docs",
        f"avg_{value_col}",
        F.col("_pcts")[0].cast("double").alias(f"p50_{value_col}"),
        F.col("_pcts")[1].cast("double").alias(f"p90_{value_col}"),
        f"max_{value_col}",
    )


def repetition_stats(col: Column | str, n: int = 3) -> Column:
    """Gopher-style within-document repetition signals as a struct
    (dup_ngram_frac double, top_word_frac double).

    - ``dup_ngram_frac``: 1 − |distinct word n-grams| / |word n-grams| —
      degenerate (looped) generated text repeats its own n-grams.
    - ``top_word_frac``: occurrences of the most frequent word / total
      words — boilerplate and keyword-stuffed pages are dominated by one
      token.

    Pure expressions; the words array is bound ONCE via the
    single-element-array transform scope (Catalyst performs no CSE
    across higher-order-function lambda boundaries — see
    ``word_shingles``), so the per-word inner filter sees a lambda
    variable, not a re-evaluated subtree.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(
        F.split(
            F.trim(
                F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " ")
            ),
            " ",
        ),
        lambda w: w != F.lit(""),
    )

    def build(ws: Column) -> Column:
        nw = F.size(ws)
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(nw - n + 1, F.lit(1))),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        )
        dup = F.when(
            nw >= n,
            F.lit(1.0)
            - F.size(F.array_distinct(grams)) / F.size(grams).cast("double"),
        ).otherwise(F.lit(0.0))
        # max word frequency via ONE run-length pass over the sorted
        # array — a per-distinct-word filter would be
        # O(distinct · n_words) per document, quadratic on long docs
        run_max = F.aggregate(
            F.array_sort(ws),
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            lambda a, x: F.struct(
                x.alias("prev"),
                F.when(x == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    a["best"],
                    F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda a: a["best"],
        )
        top = F.when(
            nw > 0,
            run_max.cast("double") / nw.cast("double"),
        ).otherwise(F.lit(0.0))
        return F.struct(
            F.round(dup, 6).alias("dup_ngram_frac"),
            F.round(top, 6).alias("top_word_frac"),
        )

    return F.transform(F.array(words), build)[0]
