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


WORD = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(WORD, min_size=0, max_size=40),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=6),
)
def test_chunk_documents_properties(spark, words, max_tokens, overlap):
    """For any word list and any valid (max_tokens, overlap):
    - every chunk has 1..max_tokens tokens (when the doc is non-empty);
    - consecutive chunks start exactly `stride` tokens apart;
    - the concatenation of chunks at stride offsets covers every token
      in order (no token lost, none invented)."""
    from llm_information_extraction_spark.operators.textprep import (
        chunk_documents,
    )

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    stride = max_tokens - overlap
    df = spark.createDataFrame([("d", " ".join(words))], "doc_id string, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens, overlap).collect()
    )
    assert rows, "at least one chunk always"
    for idx, text, n in rows:
        toks = text.split() if text else []
        assert n == len(toks) and n <= max_tokens
        start = idx * stride
        assert toks == words[start : start + max_tokens]
    if words:
        # full coverage: the union of chunk token positions is 0..len-1
        covered = set()
        for idx, text, n in rows:
            covered.update(range(idx * stride, idx * stride + n))
        assert covered == set(range(len(words)))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(WORD, st.integers(1, 60)), min_size=1, max_size=25),
    st.integers(min_value=8, max_value=128),
)
def test_pack_sequences_bin_capacity_property(spark, docs, ctx):
    """Within every (group, bin): the cumulative tokens BEFORE each doc
    stay under (bin_id+1)*ctx and at/above bin_id*ctx — the defining
    property of contiguous cumulative packing."""
    from llm_information_extraction_spark.operators.textprep import (
        pack_sequences,
    )

    rows = [
        (f"{w}{i}", " ".join(["tok"] * n)) for i, (w, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = pack_sequences(df, context_tokens=ctx, num_groups=4).collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["pack_group"], []).append(r)
    for g, members in by_group.items():
        members.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in members:
            assert r["bin_id"] == cum // ctx
            cum += r["n_tokens"]


@settings(max_examples=15, deadline=None)
@given(st.lists(WORD, min_size=13, max_size=40))
def test_decontamination_self_containment_property(spark, words):
    """Any document always shares all its 13-grams with itself: a train
    set decontaminated against itself flags every (≥1-gram) doc."""
    from llm_information_extraction_spark.operators.textprep import (
        contaminated_ids,
    )

    df = spark.createDataFrame([("d0", " ".join(words))], "doc_id string, text string")
    bad = {r["doc_id"] for r in contaminated_ids(df, df).collect()}
    assert bad == {"d0"}
