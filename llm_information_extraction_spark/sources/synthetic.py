"""Deterministic synthetic corpus of interleaved text+media documents.

Implements FIXTURES.md T1/T2: a ``documents`` table with the BASELINE.json
input_hint shape::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

and the matching ``gold_triples(doc_id, pred, obj)`` expected output.

Generation is **distributed and order-independent**: ``spark.range(n)`` →
``mapInPandas`` where every document's RNG is seeded by ``(seed, doc_id)``,
so the corpus is identical at any parallelism / partitioning — which is
what lets the scaling-efficiency benchmark run the same input at local[8]
and local[32]. The same recipe scales from 200 pytest fixture docs to the
10^7-doc bench slice.

Skew knobs (north rule): ``hot_entity_skew`` draws tracts from a Zipf
distribution so a few canonical entities dominate (stress for the linking
groupBy), and ``oversized_doc_pct`` produces documents with ~40x the span
count (stress for Arrow batches / salted repartitioning).

Document semantics mirror the reference corpus (SURVEY §1.1): ordered
title/abstract/keywords/sections interleaved with table/figure refs
(``/root/reference/data/raw/dementia_data/**/tables``), with planted
controlled-vocabulary terms (brain_extraction.py:37,50-51), animal/review
pre-filter markers (:35) and gray-matter distractors (:39).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .. import vocab

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType(), True),
                        StructField("text", StringType(), True),
                        StructField("media_ref", StringType(), True),
                        StructField("offset", IntegerType(), True),
                    ]
                )
            ),
            False,
        ),
    ]
)

GOLD_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
    ]
)

# sentence templates; `{v}` is replaced by a planted vocabulary term.
_TRACT_TEMPLATES = [
    "fractional anisotropy was reduced in the {v} of patients versus controls.",
    "tract-based statistics revealed lower integrity within the {v}.",
    "we reconstructed the {v} using deterministic tractography.",
]
_DISTRACTORS = [
    "gray matter volume of the hippocampus and thalamus was also examined.",
    "participants completed a neuropsychological battery at baseline.",
    "image preprocessing included motion correction and eddy-current correction.",
    "statistical maps were thresholded at p < 0.05 family-wise corrected.",
    "the putamen and amygdala showed no volumetric differences.",
]
_ANIMAL_SENTENCE = (
    "experiments were performed in mice, a mouse model of demyelination."
)
_REVIEW_SENTENCE = "this meta-analysis pooled effect sizes across published studies."
_SINGLE_SENTENCE = "this single study enrolled participants prospectively."


def _zipf_weights(n: int, skew: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-skew) if skew > 0 else np.ones(n)
    return w / w.sum()


def _build_doc(
    i: int,
    rng: np.random.Generator,
    tracts: list[str],
    diseases: list[str],
    tract_weights: np.ndarray,
    oversized_doc_pct: float,
    pct_animal: float,
    pct_review: float,
) -> tuple[str, list[dict], list[tuple[str, str]]]:
    """Return (doc_id, spans, [(pred, obj_surface)]) for one document."""
    doc_id = f"doc_{i:09d}"
    is_animal = rng.random() < pct_animal
    is_review = (not is_animal) and rng.random() < pct_review
    is_oversized = rng.random() < oversized_doc_pct

    fv = vocab.FIELD_VOCABS
    n_tracts = int(rng.integers(1, 4))
    doc_tracts = list(
        dict.fromkeys(
            tracts[j]
            for j in rng.choice(len(tracts), size=n_tracts, p=tract_weights)
        )
    )
    disease = diseases[int(rng.integers(0, len(diseases)))]
    has_disease = rng.random() < 0.7
    modality = fv["imaging_modalities"][
        int(rng.integers(0, len(fv["imaging_modalities"])))
    ]
    is_dti = modality in ("dti", "diffusion mri", "diffusion weighted mri", "dmri")
    software = fv["analysis_software"][
        int(rng.integers(0, len(fv["analysis_software"])))
    ]
    measure = fv["diffusion_measures"][
        int(rng.integers(0, len(fv["diffusion_measures"])))
    ]
    template = fv["template_space"][int(rng.integers(0, 2))]  # talairach | mni
    method = fv["results_method"][int(rng.integers(0, len(fv["results_method"])))]
    integrity = ["decrease", "increase"][int(rng.integers(0, 2))]

    # ---- compose spans (document order = offset) -------------------------
    sents_body: list[str] = []
    if is_animal:
        sents_body.append(_ANIMAL_SENTENCE)
    elif is_review:
        sents_body.append(_REVIEW_SENTENCE)
    else:
        sents_body.append(_SINGLE_SENTENCE)
        sents_body.append("the study included humans recruited from memory clinics.")
    sents_body.append(
        f"imaging used {modality} and analyses were run in {software}."
    )
    sents_body.append(
        f"we computed {measure} maps normalized to {template} space and "
        f"compared groups with a {method}."
    )
    if not (is_animal or is_review):
        for t in doc_tracts:
            tmpl = _TRACT_TEMPLATES[int(rng.integers(0, len(_TRACT_TEMPLATES)))]
            sents_body.append(tmpl.format(v=t))
        sents_body.append(f"overall we observed a {integrity} in white matter integrity.")
    sents_body.append(_DISTRACTORS[int(rng.integers(0, len(_DISTRACTORS)))])

    title = f"white matter study {i}: {modality} findings"
    abstract_parts = [f"background: we investigated microstructure with {modality}."]
    if has_disease:
        abstract_parts.append(
            f"we studied {disease} patients vs controls in this work."
        )
    abstract = " ".join(abstract_parts)

    spans: list[dict] = []

    def add(kind: str, text: str | None = None, media_ref: str | None = None):
        spans.append(
            {
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "offset": len(spans),
            }
        )

    add("title", title)
    add("abstract", abstract)
    add("keywords", f"white matter; {measure}; {modality}")
    extra = int(rng.integers(1, 4)) + (len(sents_body) * 39 if is_oversized else 0)
    n_sections = len(sents_body) + extra
    # distribute body sentences across sections; pad with distractors
    for s in range(n_sections):
        if s < len(sents_body):
            text = sents_body[s]
        else:
            text = _DISTRACTORS[(i + s) % len(_DISTRACTORS)]
        add("section", text)
        if rng.random() < 0.25:
            add("table_ref", None, f"tbl_{i % 7:03d}")
        if rng.random() < 0.1:
            add("figure_ref", None, f"fig_{i % 5:03d}")

    # ---- gold triples (surface forms; canonicalization applied later) ----
    gold: list[tuple[str, str]] = []
    if not (is_animal or is_review):
        for t in doc_tracts:
            gold.append(("whitematter_tracts", t))
        gold.append(("white_integrity", integrity))
        gold.append(("subjects", "humans"))
        gold.append(("study_type", "single study"))
        gold.append(("Human_study", "yes"))
    else:
        if is_animal:
            gold.append(("subjects", "mice"))
            gold.append(("Human_study", "no"))
        else:
            gold.append(("study_type", "review"))
            gold.append(("Human_study", "no"))
    gold.append(("imaging_modalities", modality))
    gold.append(("analysis_software", software))
    gold.append(("diffusion_measures", measure))
    gold.append(("template_space", template))
    gold.append(("results_method", method))
    gold.append(("DTI_study", "yes" if is_dti else "no"))
    if has_disease:
        gold.append(("Disease_study", disease))
        gold.append(("patient_groups", disease))
        gold.append(("Dementia_study", "yes"))
        gold.append(("question_of_study", f"{disease} patients vs controls"))
    else:
        gold.append(("Dementia_study", "no"))
    return doc_id, spans, gold


def _doc_iterator(
    pdfs: Iterator[pd.DataFrame],
    seed: int,
    with_gold: bool,
    hot_entity_skew: float,
    oversized_doc_pct: float,
    pct_animal: float,
    pct_review: float,
) -> Iterator[pd.DataFrame]:
    tracts = vocab.tract_surface_forms()
    diseases = vocab.disease_surface_forms()
    weights = _zipf_weights(len(tracts), hot_entity_skew)
    for pdf in pdfs:
        rows = []
        for i in pdf["id"].to_numpy():
            rng = np.random.default_rng((seed << 34) ^ int(i))
            doc_id, spans, gold = _build_doc(
                int(i), rng, tracts, diseases, weights,
                oversized_doc_pct, pct_animal, pct_review,
            )
            if with_gold:
                rows.extend(
                    {"doc_id": doc_id, "pred": p, "obj": o} for p, o in gold
                )
            else:
                rows.append({"doc_id": doc_id, "spans": spans})
        yield pd.DataFrame(rows)


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    hot_entity_skew: float = 1.1,
    oversized_doc_pct: float = 0.01,
    pct_animal: float = 0.1,
    pct_review: float = 0.1,
    partitions: int | None = None,
) -> DataFrame:
    """The interleaved ``documents`` table (input_hint shape)."""
    parts = partitions or max(
        spark.sparkContext.defaultParallelism,
        math.ceil(n_docs / 50_000),
    )
    base = spark.range(0, n_docs, numPartitions=parts)
    return base.mapInPandas(
        lambda it: _doc_iterator(
            it, seed, False, hot_entity_skew, oversized_doc_pct,
            pct_animal, pct_review,
        ),
        schema=DOCUMENTS_SCHEMA,
    )


def generate_gold_triples(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    hot_entity_skew: float = 1.1,
    oversized_doc_pct: float = 0.01,
    pct_animal: float = 0.1,
    pct_review: float = 0.1,
    partitions: int | None = None,
) -> DataFrame:
    """Expected ``(doc_id, pred, obj)`` triples — canonicalized surfaces.

    Same per-doc RNG stream as :func:`generate_documents`, so gold is exact
    by construction. ``obj`` is the canonical form (CANON_MAPS applied),
    matching the pipeline's post-linking output.
    """
    parts = partitions or max(
        spark.sparkContext.defaultParallelism,
        math.ceil(n_docs / 50_000),
    )
    base = spark.range(0, n_docs, numPartitions=parts)
    raw = base.mapInPandas(
        lambda it: _doc_iterator(
            it, seed, True, hot_entity_skew, oversized_doc_pct,
            pct_animal, pct_review,
        ),
        schema=GOLD_SCHEMA,
    )
    # canonicalize objects with the same literal maps used by linking
    from ..functions.normalize import canonicalize_col

    out = raw
    expr = F.col("obj")
    for field, cmap in vocab.CANON_MAPS.items():
        expr = F.when(
            F.col("pred") == field, canonicalize_col(F.col("obj"), cmap)
        ).otherwise(expr)
    return out.withColumn("obj", expr).dropDuplicates(["doc_id", "pred", "obj"])
