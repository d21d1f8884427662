"""The reference's model-evaluation pipeline as a Spark job.

Re-implements ``evaluate_model`` (/root/reference/evaluation_gpt4_vs_gpt5.py
:228-352, identical in evaluation_full_vs_abstract.py) over DataFrames:
gold + prediction CSVs → positional alignment → rename → normalize +
canonicalize → binary F1 (3 yes/no fields) + multilabel micro-F1 with
fuzzy semantic matching (3 list fields) → (field, f1) rows.

This is the parity gate against the reference's *published* numbers: run
on its checked-in CSVs it must reproduce data/processed/
f1_comparison_gpt4_vs_gpt5.csv exactly (see tests/test_reference_parity).

Spark-isms vs the pandas original:
- positional ``pd.concat(axis=1)`` (:257-261) becomes a row_number join —
  both CSVs are read as one partition each, preserving file order, which
  is the alignment contract the reference relies on;
- the per-row iterrows loops (:303, :320) become column expressions +
  one Arrow-batched semantic-matching UDF;
- one-hot binarization (:162-169) never materializes — micro counts come
  from intra-row set ops (equivalent because binarize dedups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.normalize import (
    canonicalize_array,
    canonicalize_col,
    clean_split,
)
from ..operators.evaluation import (
    apply_semantic_matching,
    binary_metrics,
    multilabel_metrics,
)
from ..vocab import CANON_MAPS

#: gold-column → short name (evaluation_gpt4_vs_gpt5.py:263-287). The
#: dementia header embeds a literal trailing " \n" in the CSV.
GOLD_RENAME = {
    "Is this DTI?": "DTI_gt",
    "Is this a single study or a review?": "Study_type_gt",
    "Human study or not?": "Human_study_gt",
    "Does this study dementia, alzheimers, or related disease? \n": "Dementia_study_gt",
    "Which one?": "Disease_study_gt",
    "What tracts were studied?": "Whitematter_tracts_gt",
}

PRED_RENAME = {
    "DTI_study": "DTI_pred",
    "study_type": "Study_type_pred",
    "Human_study": "Human_study_pred",
    "Dementia_study": "Dementia_study_pred",
    "Disease_study": "Disease_study_pred",
    "whitematter_tracts": "Whitematter_tracts_pred",
}

#: (display name, gt col, pred col, canon map key, positive label)
BINARY_FIELDS = [
    ("Does it use DTI?", "DTI_gt", "DTI_pred", "DTI_study", "yes"),
    ("Human_vs_non_human_study", "Human_study_gt", "Human_study_pred",
     "Human_study", "yes"),
    ("Does it study dementia or related diseases?", "Dementia_study_gt",
     "Dementia_study_pred", "Dementia_study", "yes"),
]

MULTILABEL_FIELDS = [
    ("Review or single study?", "Study_type_gt", "Study_type_pred",
     "study_type"),
    ("Which diseases are studied", "Disease_study_gt", "Disease_study_pred",
     "Disease_study"),
    ("WM tracts studied", "Whitematter_tracts_gt", "Whitematter_tracts_pred",
     "whitematter_tracts"),
]


def _read_positional(spark: SparkSession, path: str) -> DataFrame:
    """CSV → single-partition DataFrame with a positional __rn column.

    multiLine + '"' escaping matches pandas' RFC-4180 parsing of the
    gold CSV (quoted cells contain newlines).
    """
    df = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
        .coalesce(1)
    )
    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn("__rn", F.row_number().over(w))


def evaluate_reference_csvs(
    spark: SparkSession,
    gold_path: str,
    pred_path: str,
    model_label: str = "model",
    use_semantic_matching: bool = True,
) -> DataFrame:
    """(field, f1, model) rows — parity with evaluate_model's output."""
    gold = _read_positional(spark, gold_path)
    pred = _read_positional(spark, pred_path)

    n_gold, n_pred = gold.count(), pred.count()
    if n_gold != n_pred:
        raise AssertionError(
            f"Row count mismatch: golden={n_gold}, predicted={n_pred}"
        )

    g_sel = [gold["__rn"]] + [
        gold[src].alias(dst)
        for src, dst in GOLD_RENAME.items()
        if src in gold.columns
    ]
    p_sel = [pred["__rn"].alias("__rn_p")] + [
        pred[src].alias(dst)
        for src, dst in PRED_RENAME.items()
        if src in pred.columns
    ]
    df = gold.select(*g_sel).join(
        pred.select(*p_sel), F.col("__rn") == F.col("__rn_p")
    )

    # normalization pass (:291-298): every field column → ", "-joined
    # canonicalized token list
    field_specs = [(gt, pr, key) for _, gt, pr, key, _pos in BINARY_FIELDS] + [
        (gt, pr, key) for _, gt, pr, key in MULTILABEL_FIELDS
    ]
    for gt, pr, key in field_specs:
        cmap = CANON_MAPS[key]
        for col in (gt, pr):
            if col in df.columns:
                df = df.withColumn(
                    col,
                    F.concat_ws(
                        ", ", canonicalize_array(clean_split(F.col(col)), cmap)
                    ),
                )

    rows: list[DataFrame] = []

    for name, gt, pr, key, pos in BINARY_FIELDS:
        cmap = CANON_MAPS[key]
        pair = df.select(
            canonicalize_col(F.col(gt), cmap).alias("gold"),
            canonicalize_col(F.col(pr), cmap).alias("pred"),
        )
        m = binary_metrics(pair, pos_label=pos)
        rows.append(
            m.select(
                F.lit(name).alias("field"),
                F.round("f1", 3).alias("f1"),
                F.lit(model_label).alias("model"),
            )
        )

    for name, gt, pr, key in MULTILABEL_FIELDS:
        cmap = CANON_MAPS[key]
        pair = df.select(
            canonicalize_array(clean_split(F.col(gt)), cmap).alias("gold"),
            clean_split(F.col(pr)).alias("pred"),
        )
        if use_semantic_matching:
            pair = apply_semantic_matching(pair)
        m = multilabel_metrics(pair, skip_empty_gold=True)
        rows.append(
            m.select(
                F.lit(name).alias("field"),
                F.round("micro_f1", 3).alias("f1"),
                F.lit(model_label).alias("model"),
            )
        )

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def wmt_category_distribution(
    spark: SparkSession, pred_path: str
) -> DataFrame:
    """NA/Global/Specific % breakdown of a prediction CSV's
    whitematter_tracts column (compute_distribution,
    whitematter_distributions.py:72-91)."""
    from ..operators.evaluation import category_distribution

    pred = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(pred_path)
    )
    return category_distribution(pred, "whitematter_tracts")


def evaluate_wmt_only(
    spark: SparkSession, gold_path: str, pred_path: str
) -> float:
    """WMT-only micro-F1 (evaluation_lut.py:130-198): no normalization
    pre-pass — raw gold column → clean_split + canonicalize, raw pred →
    clean_split, semantic matching at 0.95, SKIP_EMPTY_GOLD, micro-F1.

    Returns the float; the parity test compares it against the
    full-precision values in data/processed/f1_wmt_lut_comparison.csv.
    """
    gold = _read_positional(spark, gold_path)
    pred = _read_positional(spark, pred_path)
    if gold.count() != pred.count():
        raise AssertionError("Row count mismatch")
    cmap = CANON_MAPS["whitematter_tracts"]
    df = gold.select(
        "__rn", gold["What tracts were studied?"].alias("gt")
    ).join(
        pred.select(
            F.col("__rn").alias("__rn_p"),
            pred["whitematter_tracts"].alias("pr"),
        ),
        F.col("__rn") == F.col("__rn_p"),
    )
    pair = df.select(
        canonicalize_array(clean_split(F.col("gt")), cmap).alias("gold"),
        clean_split(F.col("pr")).alias("pred"),
    )
    pair = apply_semantic_matching(pair)
    m = multilabel_metrics(pair, skip_empty_gold=True).collect()[0]
    return float(m["micro_f1"])
