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


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=0, max_value=2**64 - 1),
    st.data(),
)
def test_simhash_block_plan_pigeonhole(d, sig, data):
    """Pure-Python property behind the lossless blocking claim: flip any
    ≤ d bits of any 64-bit signature — at least one table's key blocks
    stay untouched, so the pair shares a (table, key) bucket."""
    from llm_information_extraction_spark.operators.dedup import (
        _simhash_block_plan,
    )

    widths, offsets, tables = _simhash_block_plan(d)
    n_flips = data.draw(st.integers(min_value=0, max_value=d))
    flip_bits = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=63),
            min_size=n_flips,
            max_size=n_flips,
            unique=True,
        )
    )
    other = sig
    for b in flip_bits:
        other ^= 1 << b

    def key(s, blocks):
        k = 0
        for i in blocks:
            k = (k << widths[i]) | ((s >> offsets[i]) & ((1 << widths[i]) - 1))
        return k

    assert any(key(sig, t) == key(other, t) for t in tables)
    # and every key is at least 16 bits wide (the scale guarantee)
    assert all(sum(widths[i] for i in t) >= 16 for t in tables)


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
