"""Published-number parity: our Spark evaluation pipeline must reproduce
the reference's checked-in results EXACTLY.

The reference evaluated GPT-5-mini predictions (full-article and
abstract-only) against the 622-paper human gold CSV and committed the
per-field F1 table at data/processed/f1_comparison_gpt4_vs_gpt5.csv
(written by evaluation_full_vs_abstract.py:353-356). Running our
DataFrame re-implementation (plans/reference_eval.py) on the same input
CSVs must yield the same 12 (field, f1, model) rows to 3 decimals —
covering binary F1, clean_split/canonicalization, fuzzy semantic
matching at 0.95, SKIP_EMPTY_GOLD, and multilabel micro-F1 end to end.
"""

import csv
from pathlib import Path

import pytest

from llm_information_extraction_spark.plans.reference_eval import (
    evaluate_reference_csvs,
)

REF = Path("/root/reference")
GOLD = REF / "data/raw/WM_full_600.csv"
PRED_FULL = REF / "data/processed/whitematter_full_predicted_data_GPT_5_mini.csv"
PRED_ABS = REF / "data/processed/whitematter_abstract_predicted_data_GPT_5_mini.csv"
PUBLISHED = REF / "data/processed/f1_comparison_gpt4_vs_gpt5.csv"

pytestmark = pytest.mark.skipif(
    not PUBLISHED.exists(), reason="reference data not available"
)


def _published() -> dict[tuple[str, str], float]:
    with open(PUBLISHED) as f:
        return {
            (r["field"], r["model"]): float(r["f1"]) for r in csv.DictReader(f)
        }


@pytest.mark.parametrize(
    "pred_path,label",
    [(PRED_FULL, "full article"), (PRED_ABS, "abstract only")],
    ids=["full", "abstract"],
)
def test_reproduces_published_f1(spark, pred_path, label):
    want = _published()
    got = {
        (r["field"], r["model"]): r["f1"]
        for r in evaluate_reference_csvs(
            spark, str(GOLD), str(pred_path), model_label=label
        ).collect()
    }
    assert len(got) == 6
    for key, f1 in got.items():
        assert key in want, key
        assert f1 == pytest.approx(want[key], abs=5e-4), (key, f1, want[key])


def test_wmt_lut_comparison_bit_exact(spark):
    """All four conditions of evaluation_lut.py (GPT-4/5 × LUT/no-LUT)
    must reproduce data/processed/f1_wmt_lut_comparison.csv to full float
    precision — the strongest parity check we have."""
    from llm_information_extraction_spark.plans.reference_eval import (
        evaluate_wmt_only,
    )

    published = {}
    with open(REF / "data/processed/f1_wmt_lut_comparison.csv") as f:
        for r in csv.DictReader(f):
            published[(r["model"], r["condition"])] = float(r["wmt_f1"])

    files = {
        ("GPT-4", "No LUT"): "whitematter_no_lut_predicted_data_GPT_4o_mini.csv",
        ("GPT-4", "With LUT"): "whitematter_full_predicted_data_GPT_4o_mini_data.csv",
        ("GPT-5", "No LUT"): "whitematter_no_lut_predicted_data_GPT_5_mini.csv",
        ("GPT-5", "With LUT"): "whitematter_full_predicted_data_GPT_5_mini.csv",
    }
    for key, fname in files.items():
        got = evaluate_wmt_only(
            spark, str(GOLD), str(REF / "data/processed" / fname)
        )
        assert got == pytest.approx(published[key], abs=1e-12), (key, got)


def test_wmt_distribution_on_reference_predictions(spark):
    """A8 distribution over a real prediction CSV: categories are valid
    and percentages sum to 100 (the reference publishes only charts for
    this pipeline, so the check is structural)."""
    from llm_information_extraction_spark.plans.reference_eval import (
        wmt_category_distribution,
    )

    rows = wmt_category_distribution(spark, str(PRED_FULL)).collect()
    cats = {r["category"] for r in rows}
    assert cats <= {"NA", "Global", "Specific"}
    assert "Specific" in cats
    assert sum(r["pct"] for r in rows) == pytest.approx(100.0)
    assert sum(r["n"] for r in rows) == 622


def test_row_count_assertion(spark, tmp_path):
    short = tmp_path / "short.csv"
    short.write_text("PMID,whitematter_tracts\n1,corpus callosum\n")
    with pytest.raises(AssertionError, match="Row count mismatch"):
        evaluate_reference_csvs(spark, str(GOLD), str(short))
