"""End-to-end extraction gate: triple P/R ≥ 0.95 vs synthetic gold.

This is the headline correctness check from BASELINE.md: 200 fixture
documents (interleaved spans, animal/review/oversized mix, FIXTURES.md
sizing) → payload → gazetteer extraction → exact linking → triples,
compared as sets against the generator's gold (micro P/R per
evaluation_gpt4_vs_gpt5.py:196-225 semantics over exploded triples).
"""

import pytest
from pyspark.sql import functions as F

from llm_information_extraction_spark.operators.extraction import extract_triples
from llm_information_extraction_spark.operators.linking import (
    link_mentions,
    vocabulary_df,
)
from llm_information_extraction_spark.operators.payload import (
    build_payload,
    prune_empty_spans,
    span_signature,
)
from llm_information_extraction_spark.sources.synthetic import (
    generate_documents,
    generate_gold_triples,
)

N_DOCS = 200
SEED = 42


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, N_DOCS, seed=SEED).cache()


@pytest.fixture(scope="module")
def gold(spark):
    return generate_gold_triples(spark, N_DOCS, seed=SEED).cache()


@pytest.fixture(scope="module")
def triples(spark, docs):
    mentions = extract_triples(build_payload(docs, mode="full_text"))
    return link_mentions(mentions, vocabulary_df(spark)).cache()


def test_triple_precision_recall(triples, gold):
    tp = triples.join(gold, ["doc_id", "pred", "obj"], "inner").count()
    n_pred = triples.count()
    n_gold = gold.count()
    assert n_gold > 0 and n_pred > 0
    precision = tp / n_pred
    recall = tp / n_gold
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"


def test_prefilter_animal_review_no_tracts(triples, gold):
    # docs whose gold has no whitematter_tracts (animal/review) must not
    # emit any tract triples (brain_extraction.py:35 pre-filter)
    tract_docs = (
        gold.filter(F.col("pred") == "whitematter_tracts")
        .select("doc_id")
        .distinct()
    )
    bad = (
        triples.filter(F.col("pred") == "whitematter_tracts")
        .join(tract_docs, "doc_id", "left_anti")
        .count()
    )
    assert bad == 0


def test_binary_fields_present_for_every_doc(triples, docs):
    n_docs = docs.count()
    for field in ("DTI_study", "Human_study", "Dementia_study"):
        assert (
            triples.filter(F.col("pred") == field).select("doc_id").distinct().count()
            == n_docs
        )


def test_deterministic_across_parallelism(spark, triples):
    # same corpus generated at a different partitioning yields identical triples
    docs4 = generate_documents(spark, N_DOCS, seed=SEED, partitions=3)
    mentions = extract_triples(build_payload(docs4))
    t2 = link_mentions(mentions, vocabulary_df(spark))
    assert t2.exceptAll(triples).count() == 0
    assert triples.exceptAll(t2).count() == 0


def test_span_sequence_invariant(spark, docs):
    """Ingest → prune(keep-all) → reorder must preserve (kind, text,
    media_ref, order) — the input_hint per-row invariant."""
    base = docs.select("doc_id", span_signature("spans").alias("sig"))
    # shuffle the span array (reverse) then verify signature restores order
    shuffled = docs.select(
        "doc_id", F.reverse("spans").alias("spans")
    ).select("doc_id", span_signature("spans").alias("sig2"))
    joined = base.join(shuffled, "doc_id")
    assert joined.filter(F.col("sig") != F.col("sig2")).count() == 0


def test_prune_keeps_media_spans(spark):
    rows = [
        (
            "d1",
            [
                {"kind": "title", "text": "t", "media_ref": None, "offset": 0},
                {"kind": "section", "text": "", "media_ref": None, "offset": 1},
                {"kind": "section", "text": None, "media_ref": None, "offset": 2},
                {"kind": "table_ref", "text": None, "media_ref": "tbl_1", "offset": 3},
            ],
        )
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    kept = df.select(prune_empty_spans("spans").alias("s")).collect()[0][0]
    assert [s["kind"] for s in kept] == ["title", "table_ref"]


def test_json_payload_roundtrip(spark, docs):
    """as_json wraps the payload like the reference's json.dumps
    (main.py:94,118); from_json recovers the body exactly (F8)."""
    plain = build_payload(docs).select("doc_id", "payload")
    as_json = build_payload(docs, as_json=True).select(
        "doc_id",
        F.from_json("payload", "body string")["body"].alias("payload"),
    )
    assert as_json.exceptAll(plain).count() == 0
    assert plain.exceptAll(as_json).count() == 0


def test_fields_restricted_extraction_no_lut(spark):
    """fields=['whitematter_tracts'] == the reference's no-LUT prompt
    (prompts/brain_extraction_no_LUT.py:1-33): single-field output, no
    binary defaults, pre-filter still applies."""
    rows = [
        ("d1", "the corpus callosum in humans with dti"),
        ("d2", "nothing relevant here"),
        ("d3", "corpus callosum in a mouse model"),  # pre-filter → []
    ]
    df = spark.createDataFrame(rows, "doc_id string, payload string")
    got = {
        (r["doc_id"], r["pred"], r["obj"])
        for r in extract_triples(df, fields=["whitematter_tracts"]).collect()
    }
    assert got == {("d1", "whitematter_tracts", "corpus callosum")}


def test_fields_restricted_derived_field_sees_trigger(spark):
    df = spark.createDataFrame(
        [("d1", "alzheimers disease patients enrolled"), ("d2", "plain text")],
        "doc_id string, payload string",
    )
    got = {
        (r["doc_id"], r["pred"], r["obj"])
        for r in extract_triples(df, fields=["Dementia_study"]).collect()
    }
    # Dementia derives from the Disease_study scan, but Disease_study
    # rows themselves are not emitted
    assert got == {
        ("d1", "Dementia_study", "yes"),
        ("d2", "Dementia_study", "no"),
    }


def test_fields_restriction_rejects_unknown_field(spark):
    df = spark.createDataFrame([("d1", "x")], "doc_id string, payload string")
    with pytest.raises(ValueError, match="unknown extraction fields"):
        extract_triples(df, fields=["not_a_field"])


def test_abstract_mode_filters_kinds(spark, docs):
    pay = build_payload(docs, mode="abstract").select("payload").limit(5).collect()
    for r in pay:
        assert "section:" not in r[0]
        assert r[0].startswith("title:")
