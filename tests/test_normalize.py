"""Normalization parity tests vs the reference's scalar helpers.

Semantics under test: evaluation_gpt4_vs_gpt5.py:43-70 (normalize_text,
is_empty_token, clean_split, canonicalize) — every EMPTY_TOKENS member,
case/whitespace collapse, ';'/',' splitting (FIXTURES.md T5).
"""

import pandas as pd
from pyspark.sql import functions as F

from llm_information_extraction_spark.functions.normalize import (
    canonicalize_array,
    canonicalize_col,
    clean_split,
    is_empty_token,
    normalize_text,
    strip_pmc_prefix,
)
from llm_information_extraction_spark.vocab import CANON_MAPS, EMPTY_TOKENS


def _reference_normalize(x):
    if x is None or (isinstance(x, float) and pd.isna(x)):
        return ""
    return " ".join(str(x).lower().strip().split())


def _reference_clean_split(x):
    s = _reference_normalize(x)
    if s in EMPTY_TOKENS:
        return []
    parts = [p.strip() for p in s.replace(";", ",").split(",")]
    return [_reference_normalize(p) for p in parts if p and p not in EMPTY_TOKENS]


CASES = [
    None,
    "",
    "  Corpus   Callosum  ",
    "UNCINATE fasciculus",
    "a;b, c ;; NA, none",
    "Not Reported",
    "n/a",
    "CC, slf; Fornix",
    "  MIXED   Case\tTabs ",
    "_",
    "-",
    "x," * 50 + "y",
]


def test_normalize_text_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "v string")
    got = [r[0] for r in df.select(normalize_text("v")).collect()]
    want = [_reference_normalize(c) for c in CASES]
    assert got == want


def test_empty_tokens(spark):
    df = spark.createDataFrame([(t,) for t in EMPTY_TOKENS], "v string")
    assert all(r[0] for r in df.select(is_empty_token("v")).collect())
    df2 = spark.createDataFrame([("corpus callosum",), ("NAB",)], "v string")
    assert not any(r[0] for r in df2.select(is_empty_token("v")).collect())


def test_clean_split_parity(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "v string")
    got = [r[0] for r in df.select(clean_split("v")).collect()]
    want = [_reference_clean_split(c) for c in CASES]
    assert got == want


def test_canonicalize_map(spark):
    cmap = CANON_MAPS["whitematter_tracts"]
    df = spark.createDataFrame(
        [("SLF",), ("cc",), ("ILF ",), ("unknown tract",), (None,)], "v string"
    )
    got = [r[0] for r in df.select(canonicalize_col("v", cmap)).collect()]
    assert got == [
        "superior longitudinal fasciculus",
        "corpus callosum",
        "inferior longitudinal fasciculus",
        "unknown tract",
        "",
    ]


def test_canonicalize_array_drops_empty(spark):
    cmap = CANON_MAPS["whitematter_tracts"]
    df = spark.createDataFrame(
        [(["slf", "NA", "cc", "", "fornix"],)], "v array<string>"
    )
    got = df.select(canonicalize_array("v", cmap)).collect()[0][0]
    assert got == [
        "superior longitudinal fasciculus",
        "corpus callosum",
        "fornix",
    ]


def test_strip_pmc_prefix(spark):
    df = spark.createDataFrame([("PMC12345",), ("12345",)], "v string")
    got = [r[0] for r in df.select(strip_pmc_prefix("v")).collect()]
    assert got == ["12345", "12345"]
