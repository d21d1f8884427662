"""Resume semantics: kill after stage-k snapshot, rerun, identical output.

BASELINE.md resumability target: a killed run resumes from the last
committed snapshot (catalog manifest commit is atomic) and the final
triples are identical to an uninterrupted run.
"""

import json
from pathlib import Path

from llm_information_extraction_spark.plans.pipeline import (
    KGPipeline,
    PipelineConfig,
)

CFG = PipelineConfig(n_docs=60, seed=11)


def _triples_set(df):
    return {(r["doc_id"], r["pred"], r["obj"]) for r in df.collect()}


def test_kill_and_resume_identical(spark, tmp_path):
    # uninterrupted run
    full = KGPipeline(spark, str(tmp_path / "w_full"), CFG)
    full.run()
    want = _triples_set(full.read("triples"))
    assert want

    # killed run: stop after mentions commit
    wh = str(tmp_path / "w_killed")
    killed = KGPipeline(spark, wh, CFG)
    killed.run(stop_after="mentions")
    assert killed.catalog.exists("mentions")
    assert not killed.catalog.exists("triples")
    mention_snap = killed.catalog.current_snapshot("mentions")

    # resume in a NEW pipeline object (fresh driver)
    resumed = KGPipeline(spark, wh, CFG)
    resumed.run(resume=True)
    got = _triples_set(resumed.read("triples"))
    assert got == want
    # committed stages were NOT recomputed (snapshot id unchanged)
    assert resumed.catalog.current_snapshot("mentions") == mention_snap


def test_pipeline_dedup_stage(spark, tmp_path):
    """Corpus dedup between ingest and extraction: duplicated docs are
    collapsed before the expensive stages; the stage is committed and
    resumable like any other."""
    from pyspark.sql import functions as F

    from llm_information_extraction_spark.sources.synthetic import (
        generate_documents,
    )

    docs = generate_documents(spark, 40, seed=77)
    dups = docs.limit(10).withColumn(
        "doc_id", F.concat(F.lit("copy_"), F.col("doc_id"))
    )
    corpus = docs.unionByName(dups).cache()

    for mode in ("exact", "minhash"):
        cfg = PipelineConfig(n_docs=50, seed=77, dedup=mode)
        pipe = KGPipeline(
            spark, str(tmp_path / f"w_{mode}"), cfg, documents=corpus
        )
        counts = pipe.run()
        assert counts["ingest"] == 50
        if mode == "exact":
            assert counts["unique_docs"] == 40
        else:  # minhash may additionally drop true near-dups
            assert counts["unique_docs"] <= 40
        kept_ids = {
            r["doc_id"]
            for r in pipe.read("unique_docs").select("doc_id").collect()
        }
        dup_ids = {r["doc_id"] for r in dups.select("doc_id").collect()}
        for cid in dup_ids:  # never keep both members of a dup pair
            assert not (cid in kept_ids and cid[len("copy_"):] in kept_ids)
        # one doc per duplicate pair survives; mentions computed on the
        # deduped corpus only
        mention_docs = {
            r["doc_id"]
            for r in pipe.read("mentions").select("doc_id").distinct().collect()
        }
        kept = {
            r["doc_id"] for r in pipe.read("unique_docs").select("doc_id").collect()
        }
        assert mention_docs <= kept
        # resume skips the committed dedup stage
        snap = pipe.catalog.current_snapshot("unique_docs")
        again = KGPipeline(
            spark, str(tmp_path / f"w_{mode}"), cfg, documents=corpus
        )
        again.run(resume=True)
        assert again.catalog.current_snapshot("unique_docs") == snap


def test_config_change_invalidates_snapshots(spark, tmp_path):
    wh = str(tmp_path / "w_cfg")
    p1 = KGPipeline(spark, wh, CFG)
    p1.run(stop_after="mentions")
    snap0 = p1.catalog.current_snapshot("mentions")

    p2 = KGPipeline(spark, wh, PipelineConfig(n_docs=60, seed=12))
    p2.run(stop_after="mentions")
    assert p2.catalog.current_snapshot("mentions") == snap0 + 1


def test_crash_mid_write_invisible(spark, tmp_path):
    """A snapshot dir without a manifest commit must be invisible."""
    wh = tmp_path / "w_crash"
    p = KGPipeline(spark, str(wh), CFG)
    p.run(stop_after="ingest")
    # simulate a crashed writer: orphan snapshot dir, manifest not updated
    orphan = wh / "mentions" / "snap_000099"
    orphan.mkdir(parents=True)
    (orphan / "part-00000.parquet").write_bytes(b"garbage")
    assert not p.catalog.exists("mentions")
    # resume runs mentions from scratch and commits cleanly
    p2 = KGPipeline(spark, str(wh), CFG)
    p2.run(stop_after="mentions")
    m = json.loads((wh / "mentions" / "_manifest.json").read_text())
    assert m["current"] == 0


def test_sql_views_over_pipeline(spark, tmp_path):
    from llm_information_extraction_spark.plans.sql_views import (
        doc_field_matrix,
        entity_mention_counts,
        register_views,
    )

    p = KGPipeline(spark, str(tmp_path / "w_sql"), CFG)
    p.run()
    views = register_views(p)
    assert {"kg_triples", "kg_entities", "kg_lineage"} <= set(views)
    top = entity_mention_counts(spark).first()
    assert top["n_mentions"] >= top["n_docs"] >= 1
    m = doc_field_matrix(spark)
    assert m.count() == CFG.n_docs
    assert m.filter("n_fields < 3").count() == 0  # binary defaults everywhere


def test_chunked_pipeline_matches_unchunked(spark, tmp_path):
    """chunk_max_spans bounds Arrow batches without changing triples."""
    base = KGPipeline(spark, str(tmp_path / "w_nochunk"), CFG)
    base.run(stop_after="triples")
    chunked_cfg = PipelineConfig(n_docs=60, seed=11, chunk_max_spans=16)
    chunked = KGPipeline(spark, str(tmp_path / "w_chunk"), chunked_cfg)
    chunked.run(stop_after="triples")
    assert _triples_set(chunked.read("triples")) == _triples_set(
        base.read("triples")
    )


def test_pipeline_with_table_media_mentions(spark, tmp_path):
    """Table media payloads contribute extra triples; binary defaults
    from media rows never overwrite a payload 'yes'."""
    media = spark.createDataFrame(
        [
            (
                "m1",
                "doc_000000000",
                "table",
                b"region,fa\ncorpus callosum,0.41\nfornix,0.38",
                0, 0, 1, "csv",
            )
        ],
        "media_id string, doc_id string, kind string, payload binary, "
        "width int, height int, n_frames int, codec string",
    )
    p = KGPipeline(spark, str(tmp_path / "w_media"), CFG, media=media)
    p.run(stop_after="mentions")
    got = _triples_set(p.read("mentions"))
    assert ("doc_000000000", "whitematter_tracts", "corpus callosum") in got
    assert ("doc_000000000", "whitematter_tracts", "fornix") in got
    # no doc holds both yes and no for a binary field
    from collections import defaultdict

    vals = defaultdict(set)
    for doc, pred, obj in got:
        if pred in ("DTI_study", "Human_study", "Dementia_study"):
            vals[(doc, pred)].add(obj)
    assert all(len(v) == 1 for v in vals.values())


def test_lineage_recorded_per_partition(spark, tmp_path):
    wh = str(tmp_path / "w_lin")
    p = KGPipeline(spark, wh, CFG)
    counts = p.run()
    lineage = p.read("lineage")
    stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
    assert {"ingest", "mentions", "triples", "entities"} <= stages
    # rows_out sums match stage counts
    agg = {
        r["stage"]: r["total"]
        for r in lineage.groupBy("stage").sum("rows_out")
        .withColumnRenamed("sum(rows_out)", "total").collect()
    }
    for stage in ("mentions", "triples", "entities"):
        assert agg[stage] == counts[stage]
    # stage-level metrics table exists with sane rollups
    metrics = {r["stage"]: r for r in p.read("metrics").collect()}
    for stage in ("mentions", "triples", "entities"):
        assert metrics[stage]["rows_out"] == counts[stage]
        assert metrics[stage]["n_partitions"] >= 1
        assert metrics[stage]["partition_skew"] >= 1.0
        assert metrics[stage]["wall_ms"] > 0
