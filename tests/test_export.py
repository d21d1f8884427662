"""Edge-export tests: prediction-row CSV shape (E9) + id list (S7)."""

from pyspark.sql import functions as F

from llm_information_extraction_spark.plans.export import (
    triples_to_prediction_rows,
    write_id_list,
    write_prediction_csv,
)
from llm_information_extraction_spark.vocab import EXTRACTION_FIELDS


def test_prediction_rows_shape_and_join(spark):
    triples = spark.createDataFrame(
        [
            ("d1", "whitematter_tracts", "fornix"),
            ("d1", "whitematter_tracts", "cingulum"),
            ("d1", "DTI_study", "yes"),
            ("d2", "Human_study", "no"),
        ],
        "doc_id string, pred string, obj string",
    )
    rows = {r["PMID"]: r for r in triples_to_prediction_rows(triples).collect()}
    assert list(rows["d1"].asDict().keys()) == ["PMID", "title"] + EXTRACTION_FIELDS
    # ';'-joined, sorted within cell (deterministic vs reference's set())
    assert rows["d1"]["whitematter_tracts"] == "cingulum;fornix"
    assert rows["d1"]["DTI_study"] == "yes"
    assert rows["d1"]["imaging_modalities"] == ""  # unmentioned → empty
    assert rows["d2"]["Human_study"] == "no"


def test_csv_and_text_sinks(spark, tmp_path):
    triples = spark.createDataFrame(
        [("d1", "DTI_study", "yes")], "doc_id string, pred string, obj string"
    )
    rows = triples_to_prediction_rows(triples)
    out = str(tmp_path / "pred_csv")
    write_prediction_csv(rows, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 1
    assert back.columns == ["PMID", "title"] + EXTRACTION_FIELDS

    ids = str(tmp_path / "ids")
    write_id_list(triples, "doc_id", ids)
    assert [r[0] for r in spark.read.text(ids).collect()] == ["d1"]
