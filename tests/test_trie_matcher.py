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
    for field, surface, _ in vocab.gazetteer_rows():
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
