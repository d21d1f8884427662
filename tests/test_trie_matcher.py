"""Trie-matcher equivalence: combined single-scan == per-field scans ==
flat longest-first alternation (the specification form)."""

import random
import re

from llm_information_extraction_spark import vocab
from llm_information_extraction_spark.operators.extraction import (
    _GAZETTEER_FIELDS,
    _compile_field_regexes,
    _field_matches,
    _trie_pattern,
)


def _by_field():
    out = {f: [] for f in _GAZETTEER_FIELDS}
    for field, surface, _ in vocab.extraction_rows():
        if field in out:
            out[field].append(surface)
    return out


def test_trie_equals_flat_alternation():
    rng = random.Random(7)
    for field, surfaces in _by_field().items():
        flat = re.compile(
            r"(?<![a-z0-9])(?:"
            + "|".join(
                re.escape(s)
                for s in sorted(set(surfaces), key=len, reverse=True)
            )
            + r")(?![a-z0-9])"
        )
        trie = re.compile(
            r"(?<![a-z0-9])" + _trie_pattern(surfaces) + r"(?![a-z0-9])"
        )
        pool = sorted(set(surfaces))
        for _ in range(150):
            parts = rng.choices(pool, k=rng.randint(1, 5)) + ["xyz filler"]
            rng.shuffle(parts)
            text = " and ".join(parts)
            assert flat.findall(text) == trie.findall(text), (field, text)


def test_combined_scan_equals_per_field_scans():
    rng = random.Random(11)
    per_field = _compile_field_regexes()
    all_surfaces = sorted({s for ss in _by_field().values() for s in ss})
    for _ in range(300):
        parts = rng.choices(all_surfaces, k=rng.randint(1, 8)) + ["plain text"]
        rng.shuffle(parts)
        text = ". ".join(parts)
        combined = {f: sorted(v) for f, v in _field_matches(text).items()}
        split = {
            f: sorted(rx.findall(text))
            for f, rx in per_field.items()
            if rx.findall(text)
        }
        assert combined == split, text


def test_longest_match_suppresses_nested_surface():
    got = _field_matches("we studied the corpus callosum - genu carefully")
    assert got["whitematter_tracts"] == ["corpus callosum - genu"]
    got2 = _field_matches("the corpus callosum and fornix were intact")
    assert sorted(got2["whitematter_tracts"]) == ["corpus callosum", "fornix"]


def test_shared_disease_vocab_fans_out_to_both_fields():
    got = _field_matches("patients with frontotemporal dementia enrolled")
    assert got["Disease_study"] == ["frontotemporal dementia"]
    assert got["patient_groups"] == ["frontotemporal dementia"]


def test_no_cross_field_surface_overlap():
    """The extraction vocabulary's only cross-field surface overlap is the
    sanctioned Disease_study ↔ patient_groups pair (shared disease list).
    Guards the single-combined-scan equivalence in _cached_combined."""
    surf_fields: dict[str, set[str]] = {}
    for field, surface, _ in vocab.extraction_rows():
        surf_fields.setdefault(surface, set()).add(field)
    for surface, fields in surf_fields.items():
        if len(fields) > 1:
            assert fields == set(vocab.SANCTIONED_OVERLAP), (surface, fields)


def test_ambiguous_eval_alias_is_not_an_extraction_trigger():
    """'ad' is both the Alzheimer eval alias and a diffusion measure: it
    must extract as the measure only, never as Disease_study (which would
    also flip Dementia_study to 'yes')."""
    got = _field_matches("we measured fa and ad in the corpus callosum")
    assert "ad" in got["diffusion_measures"]
    assert "ad" not in got.get("Disease_study", [])
    # the alias stays available to linking/entities (gazetteer dimension)
    assert ("Disease_study", "ad", "alzheimers disease") in vocab.gazetteer_rows()
    assert ("Disease_study", "ad", "alzheimers disease") not in vocab.extraction_rows()


def test_unambiguous_eval_aliases_still_extract():
    got = _field_matches("tbss revealed slf and ilf changes")
    assert sorted(got["whitematter_tracts"]) == ["ilf", "slf"]


def test_rule_markers_are_token_bounded():
    from llm_information_extraction_spark.operators.extraction import (
        _cached_rule_regexes,
    )

    rules = _cached_rule_regexes()
    assert rules["review"].search("this review covers dti methods")
    assert rules["review"].search("we review the evidence") is not None
    assert rules["review"].search("we reviewed the literature") is None
    assert rules["review"].search("this reviewer disagreed") is None
    assert rules["single"].search("a single study design")
    assert rules["single"].search("single studying habits") is None
    assert rules["animal"].search("lesions in mice were induced")
    assert rules["animal"].search("dominance in micellar solutions") is None


def test_ad_measure_does_not_flip_dementia_study():
    import pandas as pd

    from llm_information_extraction_spark.operators.extraction import (
        _extract_batch,
    )

    out = _extract_batch(
        pd.DataFrame(
            {
                "doc_id": ["d1"],
                "payload": ["we measured ad and rd in humans using dti"],
            }
        )
    )
    rows = set(zip(out["pred"], out["obj"]))
    assert ("diffusion_measures", "ad") in rows
    assert ("Dementia_study", "no") in rows
    assert ("Disease_study", "ad") not in rows
