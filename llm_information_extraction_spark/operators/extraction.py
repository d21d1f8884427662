"""Vectorized deterministic gazetteer triple extraction.

Replaces the reference's per-document LLM loop
(``_process_chunk_with_api``, /root/reference/main.py:143-165) with a
distributed ``mapInPandas`` stage that implements the prompt's extraction
*specification* (prompts/brain_extraction.py) deterministically:

- per-field controlled-vocabulary matching (longest-match-wins, word
  boundaries) over the normalized payload — the LUT rule
  ("Normalize spelling to match this list exactly", brain_extraction.py:37);
- animal/review pre-filter forcing ``whitematter_tracts = []``
  (brain_extraction.py:35);
- yes/no fields with default ``no`` (brain_extraction.py:55):
  ``DTI_study`` ⇐ diffusion modality present; ``Human_study`` ⇐ human
  subjects and not an animal study; ``Dementia_study`` ⇐ any Disease_study
  match;
- ``study_type`` from review/single-study markers;
- ``question_of_study`` as the "<disease> patients vs controls" comparison
  phrase (brain_extraction.py:47 guidance);
- default-empty for unmentioned fields (Global Rule 2);
- per-document dedup (``list(set(...))``, main.py:201-203 — here
  deterministic via set + sorted emission, a documented deviation from the
  reference's nondeterministic ordering, SURVEY §7 hard-part (b)).

Scale design: the gazetteer is compiled ONCE per executor task into
per-field regexes (alternation sorted longest-first ⇒ leftmost-longest
semantics); matching is a single linear scan per field over each payload.
Output is the long-form mentions table ``(doc_id, pred, obj)`` — `obj` is
the matched *surface form*; canonicalization happens in the linking stage.
No driver-side loops, no per-row Python UDF calls: one Arrow batch in,
one Arrow batch out.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from .. import vocab

MENTIONS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
    ]
)

#: modalities that imply DTI_study = yes
DIFFUSION_MODALITIES = {"dti", "diffusion mri", "diffusion weighted mri", "dmri"}

#: fields extracted by pure vocabulary match
_GAZETTEER_FIELDS = [
    "whitematter_tracts",
    "Disease_study",
    "patient_groups",
    "imaging_modalities",
    "subjects",
    "analysis_software",
    "diffusion_measures",
    "template_space",
    "results_method",
    "white_integrity",
]


def _compile_field_regexes() -> dict[str, re.Pattern]:
    """One alternation regex per field, longest surface first.

    Longest-first alternation gives leftmost-longest matching in Python's
    ``re`` (first alternative wins at each position), so
    "corpus callosum - genu" is matched whole rather than as
    "corpus callosum". Lookarounds enforce token boundaries without
    consuming, so adjacent matches still work.
    """
    by_field: dict[str, list[str]] = {f: [] for f in _GAZETTEER_FIELDS}
    for field, surface, _canon in vocab.gazetteer_rows():
        if field in by_field:
            by_field[field].append(surface)
    out = {}
    for field, surfaces in by_field.items():
        alts = sorted(set(surfaces), key=len, reverse=True)
        pattern = (
            r"(?<![a-z0-9])(?:" + "|".join(re.escape(s) for s in alts) + r")(?![a-z0-9])"
        )
        out[field] = re.compile(pattern)
    return out


@lru_cache(maxsize=1)
def _cached_regexes() -> dict[str, re.Pattern]:
    # compiled once per executor process, reused across tasks/batches
    return _compile_field_regexes()


_WS = re.compile(r"\s+")


def _normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalize_text parity (lower, strip, collapse ws)."""
    return (
        s.fillna("").astype(str).str.lower().str.strip().str.replace(_WS, " ", regex=True)
    )


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    regexes = _cached_regexes()
    texts = _normalize_series(pdf["payload"])
    doc_ids = pdf["doc_id"].astype(str)

    out_doc: list[str] = []
    out_pred: list[str] = []
    out_obj: list[str] = []

    # vectorized substring flags for rule fields
    def contains_any(markers: list[str]) -> pd.Series:
        flag = pd.Series(False, index=texts.index)
        for m in markers:
            flag |= texts.str.contains(m, regex=False)
        return flag

    is_animal = contains_any(vocab.ANIMAL_MARKERS)
    is_review = contains_any(vocab.REVIEW_MARKERS)
    is_single = texts.str.contains("single study", regex=False)

    # per-field gazetteer scans (pandas str.findall = one pass per field)
    matches: dict[str, pd.Series] = {
        field: texts.str.findall(rx) for field, rx in regexes.items()
    }

    for i in texts.index:
        doc = doc_ids[i]
        triples: set[tuple[str, str]] = set()

        def emit(pred: str, obj: str) -> None:
            triples.add((pred, obj))

        animal, review = bool(is_animal[i]), bool(is_review[i])
        for field in _GAZETTEER_FIELDS:
            vals = matches[field][i]
            if field == "whitematter_tracts" and (animal or review):
                continue  # pre-filter: MUST return [] (brain_extraction.py:35)
            for v in vals:
                emit(field, v)

        diseases = set(matches["Disease_study"][i])
        modalities = set(matches["imaging_modalities"][i])
        subjects = set(matches["subjects"][i])

        # yes/no fields — default ["no"] (brain_extraction.py:55)
        emit("DTI_study", "yes" if modalities & DIFFUSION_MODALITIES else "no")
        emit(
            "Human_study",
            "yes" if ("humans" in subjects and not animal) else "no",
        )
        emit("Dementia_study", "yes" if diseases else "no")

        if review:
            emit("study_type", "review")
        elif bool(is_single[i]):
            emit("study_type", "single study")

        text = texts[i]
        for d in diseases:
            phrase = f"{d} patients vs controls"
            if phrase in text:
                emit("question_of_study", phrase)

        for pred, obj in sorted(triples):
            out_doc.append(doc)
            out_pred.append(pred)
            out_obj.append(obj)

    return pd.DataFrame({"doc_id": out_doc, "pred": out_pred, "obj": out_obj})


def extract_triples(
    documents_with_payload: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """documents(doc_id, payload) → mentions(doc_id, pred, obj).

    ``obj`` is the raw matched surface form; run the linking stage
    (:mod:`..operators.linking`) to canonicalize.
    """
    src = documents_with_payload.select(
        "doc_id", documents_with_payload[payload_col].alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)
