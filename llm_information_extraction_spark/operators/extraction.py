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


def _trie_pattern(words: list[str]) -> str:
    """Compile a literal word list into a prefix-trie regex.

    A flat 300-alternative alternation makes ``re`` try each alternative
    at every position (O(vocab) per char); the trie form shares prefixes
    so the scan is near O(1) per char (a standard public technique).
    Longest-match-wins is preserved: continuations are emitted as GREEDY
    optional groups, so "corpus callosum - genu" is consumed whole and
    only backtracks to the shorter "corpus callosum" if the longer form
    fails.
    """
    trie: dict = {}
    for w in sorted(set(words)):
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node["\0"] = {}  # terminal marker

    def build(node: dict) -> str:
        has_end = "\0" in node
        alts = [
            re.escape(ch) + build(sub)
            for ch, sub in sorted(node.items())
            if ch != "\0"
        ]
        if not alts:
            return ""
        if has_end:
            # greedy '?': try the longer continuation first, fall back to
            # the terminal (shorter) match only if it fails
            return "(?:" + "|".join(alts) + ")?"
        return alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"

    return build(trie)


def _compile_field_regexes() -> dict[str, re.Pattern]:
    """One trie-compiled regex per field, with token-boundary lookarounds
    (non-consuming, so adjacent matches still work)."""
    by_field: dict[str, list[str]] = {f: [] for f in _GAZETTEER_FIELDS}
    for field, surface, _canon in vocab.extraction_rows():
        if field in by_field:
            by_field[field].append(surface)
    out = {}
    for field, surfaces in by_field.items():
        pattern = r"(?<![a-z0-9])" + _trie_pattern(surfaces) + r"(?![a-z0-9])"
        out[field] = re.compile(pattern)
    return out


@lru_cache(maxsize=1)
def _cached_regexes() -> dict[str, re.Pattern]:
    # compiled once per executor process, reused across tasks/batches
    return _compile_field_regexes()


@lru_cache(maxsize=16)
def _cached_combined(
    fields_key: tuple[str, ...] | None = None,
) -> tuple[re.Pattern, dict[str, tuple[str, ...]]]:
    """One union trie over the requested fields' vocabularies +
    surface→fields map. ``fields_key=None`` = every gazetteer field.

    A single linear scan replaces the 10 per-field scans. Equivalent to
    per-field scanning because :func:`vocab.extraction_rows` guarantees
    (and ``test_no_cross_field_surface_overlap`` asserts) that the only
    cross-field surface overlap is Disease_study ↔ patient_groups, which
    share the identical disease vocabulary — the union's longest match
    resolves to the same surface either way, and the map fans it out to
    both fields. Colliding eval aliases (e.g. 'ad') are excluded there.
    """
    wanted = set(_GAZETTEER_FIELDS if fields_key is None else fields_key)
    surf2fields: dict[str, list[str]] = {}
    for field, surface, _canon in vocab.extraction_rows():
        if field in wanted and field in _GAZETTEER_FIELDS:
            surf2fields.setdefault(surface, []).append(field)
    pattern = re.compile(
        r"(?<![a-z0-9])" + _trie_pattern(list(surf2fields)) + r"(?![a-z0-9])"
    )
    return pattern, {s: tuple(fs) for s, fs in surf2fields.items()}


def marker_patterns() -> dict[str, str]:
    """Marker pattern strings (animal / review / single-study), with the
    same token-boundary lookarounds as the gazetteer fields — without
    them substrings fire the doc-level rules ('this reviewer' would
    match 'this review' and force whitematter_tracts = []).

    The patterns use only constructs shared by Python ``re`` and Java
    regex (escapes, non-capturing groups, lookarounds), so the SAME
    string drives both the Arrow extractor and JVM-side ``rlike``
    doc-level flags (:func:`..operators.skew.extract_chunked`).
    """

    def bounded(words: list[str]) -> str:
        return r"(?<![a-z0-9])" + _trie_pattern(words) + r"(?![a-z0-9])"

    return {
        "animal": bounded(vocab.ANIMAL_MARKERS),
        "review": bounded(vocab.REVIEW_MARKERS),
        "single": bounded(["single study"]),
    }


@lru_cache(maxsize=1)
def _cached_rule_regexes() -> dict[str, re.Pattern]:
    return {k: re.compile(p) for k, p in marker_patterns().items()}


#: gazetteer fields a derived field's rule reads (the scan must include
#: them even when only the derived field is requested)
_DERIVED_TRIGGERS: dict[str, frozenset[str]] = {
    "DTI_study": frozenset({"imaging_modalities"}),
    "Human_study": frozenset({"subjects"}),
    "Dementia_study": frozenset({"Disease_study"}),
    "question_of_study": frozenset({"Disease_study"}),
}


def _field_matches(
    text: str, fields_key: tuple[str, ...] | None = None
) -> dict[str, list[str]]:
    """Per-field surface matches from ONE combined trie scan."""
    rx, surf2fields = _cached_combined(fields_key)
    out: dict[str, list[str]] = {}
    for m in rx.finditer(text):
        s = m.group(0)
        for field in surf2fields[s]:
            out.setdefault(field, []).append(s)
    return out


def _extract_batch(
    pdf: pd.DataFrame, fields: tuple[str, ...] | None = None
) -> pd.DataFrame:
    """Expects ``payload`` ALREADY normalized (lowercase, collapsed
    whitespace) — :func:`extract_triples` applies normalize_text
    JVM-side so Arrow batches arrive match-ready and the Python side
    never rescans for case/whitespace.

    ``fields`` restricts extraction (the no-LUT prompt mode,
    brain_extraction_no_LUT.py:1-33, is ``fields=('whitematter_tracts',)``):
    only requested fields are EMITTED; the scan additionally covers the
    trigger fields a requested derived field reads (_DERIVED_TRIGGERS).
    """
    want = None if fields is None else frozenset(fields)
    if want is None:
        gaz_key = None
    else:
        scan = set(want)
        for f in want:
            scan |= _DERIVED_TRIGGERS.get(f, frozenset())
        gaz_key = tuple(sorted(scan.intersection(_GAZETTEER_FIELDS)))

    def w(field: str) -> bool:
        return want is None or field in want

    rules = _cached_rule_regexes()
    texts = pdf["payload"].fillna("").tolist()
    doc_ids = pdf["doc_id"].astype(str).tolist()

    out_doc: list[str] = []
    out_pred: list[str] = []
    out_obj: list[str] = []

    # one combined trie scan + three rule scans per doc; the row loop
    # below never touches pandas
    matches = [_field_matches(t, gaz_key) for t in texts]
    is_animal = [rules["animal"].search(t) is not None for t in texts]
    is_review = [rules["review"].search(t) is not None for t in texts]
    is_single = [rules["single"].search(t) is not None for t in texts]

    _EMPTY: list[str] = []
    for i, (doc, text) in enumerate(zip(doc_ids, texts)):
        triples: set[tuple[str, str]] = set()
        emit = triples.add

        animal, review = is_animal[i], is_review[i]
        doc_matches = matches[i]
        for field, vals in doc_matches.items():
            if not w(field):
                continue  # trigger-only scan field (fields= restriction)
            if field == "whitematter_tracts" and (animal or review):
                continue  # pre-filter: MUST return [] (brain_extraction.py:35)
            for v in vals:
                emit((field, v))

        diseases = set(doc_matches.get("Disease_study", _EMPTY))
        modalities = set(doc_matches.get("imaging_modalities", _EMPTY))
        subjects = set(doc_matches.get("subjects", _EMPTY))

        # yes/no fields — default ["no"] (brain_extraction.py:55)
        if w("DTI_study"):
            emit(("DTI_study", "yes" if modalities & DIFFUSION_MODALITIES else "no"))
        if w("Human_study"):
            emit((
                "Human_study",
                "yes" if ("humans" in subjects and not animal) else "no",
            ))
        if w("Dementia_study"):
            emit(("Dementia_study", "yes" if diseases else "no"))

        if w("study_type"):
            if review:
                emit(("study_type", "review"))
            elif is_single[i]:
                emit(("study_type", "single study"))

        if w("question_of_study"):
            for d in diseases:
                phrase = f"{d} patients vs controls"
                if phrase in text:
                    emit(("question_of_study", phrase))

        for pred, obj in sorted(triples):
            out_doc.append(doc)
            out_pred.append(pred)
            out_obj.append(obj)

    return pd.DataFrame({"doc_id": out_doc, "pred": out_pred, "obj": out_obj})


def merge_binary_yes_wins(mentions: DataFrame) -> DataFrame:
    """Union-merge fixup for yes/no fields: a source (chunk / media item)
    without evidence defaults to "no" (brain_extraction.py:55), so after
    merging multiple sources a doc may hold both — keep "yes" when any
    source said yes, matching the single-payload path's semantics
    (_merge_chunk_results, main.py:168-175)."""
    from pyspark.sql import functions as F

    from ..vocab import BINARY_FIELDS

    yes = (
        mentions.filter(
            F.col("pred").isin(BINARY_FIELDS) & (F.col("obj") == "yes")
        )
        .select("doc_id", "pred")
        .withColumn("__has_yes", F.lit(True))
    )
    merged = mentions.join(yes, ["doc_id", "pred"], "left").filter(
        ~(
            F.col("pred").isin(BINARY_FIELDS)
            & (F.col("obj") == "no")
            & F.coalesce("__has_yes", F.lit(False))
        )
    )
    return merged.drop("__has_yes")


def extract_triples(
    documents_with_payload: DataFrame,
    payload_col: str = "payload",
    fields: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """documents(doc_id, payload) → mentions(doc_id, pred, obj).

    ``obj`` is the raw matched surface form; run the linking stage
    (:mod:`..operators.linking`) to canonicalize.

    ``fields`` restricts the output schema to a subset of
    :data:`..vocab.EXTRACTION_FIELDS` — the reference's no-LUT prompt
    (prompts/brain_extraction_no_LUT.py:1-33) is
    ``fields=['whitematter_tracts']``.
    """
    from ..functions.normalize import normalize_text

    if fields is not None:
        fields = tuple(sorted(set(fields)))
        unknown = set(fields) - set(vocab.EXTRACTION_FIELDS)
        if unknown:
            raise ValueError(f"unknown extraction fields: {sorted(unknown)}")

    # normalize in the JVM (codegen) so Python receives match-ready text
    src = documents_with_payload.select(
        "doc_id",
        normalize_text(documents_with_payload[payload_col]).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf, fields)

    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)
