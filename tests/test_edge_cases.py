"""Hostile-input robustness: the pipeline must not crash or mis-extract
on degenerate documents (nulls, unicode, huge spans, duplicate offsets).
"""

from pyspark.sql import functions as F

from llm_information_extraction_spark.operators.extraction import extract_triples
from llm_information_extraction_spark.operators.linking import (
    link_mentions,
    vocabulary_df,
)
from llm_information_extraction_spark.operators.payload import (
    build_payload,
    span_signature,
)

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text, ref=None, off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_degenerate_documents(spark):
    rows = [
        ("empty_spans", []),
        ("all_null_text", [_span("section", None, None, 0)]),
        ("unicode", [_span("section",
                           "ünïcode ★ corpus callosum — naïve café 中文", None, 0)]),
        ("huge_span", [_span("section", ("fornix " * 20000).strip(), None, 0)]),
        ("dup_offsets", [_span("section", "cingulum", None, 0),
                         _span("section", "fornix", None, 0)]),
        ("whitespace_only", [_span("section", " \t\n  ", None, 0)]),
    ]
    docs = spark.createDataFrame(rows, SCHEMA)
    triples = link_mentions(
        extract_triples(build_payload(docs)), vocabulary_df(spark)
    ).cache()
    got = {
        (r["doc_id"], r["pred"], r["obj"]) for r in triples.collect()
    }
    # unicode doc still matches the embedded tract
    assert ("unicode", "whitematter_tracts", "corpus callosum") in got
    # huge span extracts once (deduped), no crash
    assert ("huge_span", "whitematter_tracts", "fornix") in got
    assert ("dup_offsets", "whitematter_tracts", "cingulum") in got
    assert ("dup_offsets", "whitematter_tracts", "fornix") in got
    # every doc gets the binary defaults, even fully-empty ones
    for doc, *_ in rows:
        assert (doc, "DTI_study", "no") in got

    # signatures are defined for all (incl. empty) span arrays
    sigs = docs.select(span_signature("spans").alias("s")).collect()
    assert all(r["s"] is not None for r in sigs)


def test_null_spans_column(spark):
    docs = spark.createDataFrame([("null_spans", None)], SCHEMA)
    out = extract_triples(
        build_payload(docs.withColumn("spans", F.coalesce(
            "spans", F.array().cast(SCHEMA.split(", ")[1].split(" ", 1)[1])
        )))
    ).collect()
    assert {(r["pred"], r["obj"]) for r in out} == {
        ("DTI_study", "no"), ("Human_study", "no"), ("Dementia_study", "no"),
    }
