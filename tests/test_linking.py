"""Entity-linking fixtures (FIXTURES.md T4): exact, fuzzy, threshold.

Checks difflib-parity scoring (seq_sim, evaluation_gpt4_vs_gpt5.py:72-78),
the SIM_THRESH=0.95 gate (:28), exact-match short-circuit (:88-90), and
LSH-blocked fuzzy linking of typo'd aliases onto the vocabulary.
"""

from difflib import SequenceMatcher

from pyspark.sql import functions as F

from llm_information_extraction_spark.operators.linking import (
    exact_canonicalize,
    fuzzy_link_surfaces,
    link_mentions,
    seq_sim_udf,
    vocabulary_df,
)


def test_seq_sim_parity(spark):
    pairs = [
        ("corpus callosum", "corpus callosum"),
        ("corpus callosum", "corpus calosum"),
        ("fornix", "cingulum"),
        ("", ""),
        ("", "fornix"),
        ("posteior arcuate fascisculus", "posterior arcuate fasciculus"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r[0] for r in df.select(seq_sim_udf("a", "b")).collect()]
    for (a, b), g in zip(pairs, got):
        if not a and not b:
            want = 1.0
        elif not a or not b:
            want = 0.0
        else:
            want = SequenceMatcher(None, a, b).ratio()
        assert abs(g - want) < 1e-12, (a, b, g, want)


def test_exact_canonicalize_maps(spark):
    mentions = spark.createDataFrame(
        [
            ("d1", "whitematter_tracts", "SLF"),
            ("d1", "whitematter_tracts", "cc"),
            ("d1", "Human_study", "human"),
            ("d1", "study_type", "single"),
            ("d1", "Disease_study", "AD"),
            ("d1", "imaging_modalities", "fMRI"),
        ],
        "doc_id string, pred string, obj string",
    )
    got = {
        (r["pred"], r["obj"]) for r in exact_canonicalize(mentions).collect()
    }
    assert ("whitematter_tracts", "superior longitudinal fasciculus") in got
    assert ("whitematter_tracts", "corpus callosum") in got
    assert ("Human_study", "yes") in got
    assert ("study_type", "single study") in got
    assert ("Disease_study", "alzheimers disease") in got
    assert ("imaging_modalities", "fmri") in got


def test_fuzzy_link_typos(spark):
    vdf = vocabulary_df(spark)
    unresolved = spark.createDataFrame(
        [
            # 1-char typo, ratio ≥ 0.95 → must link
            ("whitematter_tracts", "superior longitudinal fasciculuss"),
            # way below threshold → must NOT link
            ("whitematter_tracts", "zzzz qqqq xxxx"),
            # exact (after normalization) → short-circuit at 1.0
            ("whitematter_tracts", "  Corpus   Callosum "),
        ],
        "field string, surface string",
    )
    got = {r["surface"]: (r["canonical"], r["score"])
           for r in fuzzy_link_surfaces(unresolved, vdf).collect()}
    assert got["superior longitudinal fasciculuss"][0] == "superior longitudinal fasciculus"
    assert got["corpus callosum"] == ("corpus callosum", 1.0)
    assert "zzzz qqqq xxxx" not in got


def test_fuzzy_blocking_is_field_scoped(spark):
    """Cross-field candidates must never reach the difflib scorer: the
    shingles are field-prefixed, so two fields sharing the exact same
    surface text produce disjoint gram sets (Jaccard 1.0 distance) and
    the LSH join drops them before scoring."""
    from llm_information_extraction_spark.operators.linking import (
        _field_scoped_grams,
        lsh_candidate_pairs,
    )

    shared = ["corpus callosum", "fornix", "alzheimers disease", "cingulum"]
    left = spark.createDataFrame(
        [("field_a", s) for s in shared], "field string, surface string"
    )
    right = spark.createDataFrame(
        [("field_b", s) for s in shared] + [("field_a", s) for s in shared],
        "field string, vocab_surface string",
    )
    pairs = lsh_candidate_pairs(
        _field_scoped_grams(left, "surface"),
        _field_scoped_grams(right, "vocab_surface"),
    ).select(
        F.col("datasetA.field").alias("fa"),
        F.col("datasetB.field").alias("fb"),
    )
    cross = pairs.filter(F.col("fa") != F.col("fb")).count()
    same = pairs.filter(F.col("fa") == F.col("fb")).count()
    assert cross == 0
    assert same >= len(shared)  # identical in-field surfaces all block


def test_link_mentions_fuzzy_end_to_end(spark):
    mentions = spark.createDataFrame(
        [
            ("d1", "whitematter_tracts", "corpus callosum"),       # exact vocab
            ("d1", "whitematter_tracts", "corpus callosumm"),      # typo → fuzzy
            ("d1", "whitematter_tracts", "slf"),                   # alias map
            ("d2", "whitematter_tracts", "not a tract at all"),    # unlinked, kept
        ],
        "doc_id string, pred string, obj string",
    )
    out = link_mentions(mentions, vocabulary_df(spark), fuzzy=True)
    got = {(r["doc_id"], r["obj"]) for r in out.collect()}
    assert ("d1", "corpus callosum") in got
    assert ("d1", "superior longitudinal fasciculus") in got
    assert ("d2", "not a tract at all") in got
    # the typo must have been merged into the canonical (deduped with exact)
    assert ("d1", "corpus callosumm") not in got
    assert out.filter(
        (F.col("doc_id") == "d1") & (F.col("obj") == "corpus callosum")
    ).count() == 1
