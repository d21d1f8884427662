"""End-to-end KG-construction pipeline with lineage + snapshot resume.

Stage graph (each stage = one committed snapshot in the catalog):

    ingest       documents(doc_id, spans[])            [input or synthetic]
    unique_docs  deduplicated documents                [optional: exact | minhash]
    mentions     (doc_id, pred, obj) surface forms     [payload + extraction]
    triples      (doc_id, pred, obj) canonical         [linking]
    entities     (entity_id, field, canonical, aliases)[canonicalization]

Every stage commit also appends per-partition lineage rows
(stage, snapshot_id, partition_id, rows_out, wall_ms) to the ``lineage``
table — the north rule's "per-partition lineage and metrics". Resume:
``run(resume=True)`` skips any stage whose snapshot is already committed
*for the same config fingerprint*; a killed run therefore restarts from
the last committed snapshot and produces byte-identical output (the
parquet-manifest commit is atomic, see sources/catalog.py).

This mirrors the reference's single-script lifecycle (main.py:275-282)
split at its natural process boundaries (SURVEY §3.1), with the LLM call
replaced by the deterministic gazetteer stage.
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.canonicalize import build_entities
from ..operators.extraction import extract_triples
from ..operators.linking import (
    fuzzy_link_surfaces,
    link_mentions,
    vocabulary_df,
)
from ..operators.payload import build_payload
from ..sources.catalog import Catalog
from ..sources.synthetic import generate_documents


@dataclass(frozen=True)
class PipelineConfig:
    n_docs: int = 1000
    seed: int = 42
    mode: str = "full_text"  # or "abstract"
    fuzzy: bool = False
    hot_entity_skew: float = 1.1
    oversized_doc_pct: float = 0.01
    #: when set, documents are split into ≤N-span chunks before extraction
    #: (bounds Arrow batch memory for oversized docs; operators/skew.py)
    chunk_max_spans: int | None = None
    #: corpus dedup before extraction: 'none' | 'exact' (payload
    #: fingerprint, keep min doc_id) | 'minhash' (bucket-CC near-dup
    #: clusters with exact rep-verify ≥ minhash_threshold, keep the rep)
    dedup: str = "none"
    minhash_threshold: float = 0.8

    def fingerprint(self) -> str:
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True).encode()
        ).hexdigest()[:16]


STAGES = ["ingest", "unique_docs", "mentions", "triples", "entities"]


class KGPipeline:
    """Orchestrates the stage graph over a :class:`Catalog` warehouse."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        config: PipelineConfig | None = None,
        documents: DataFrame | None = None,
        media: DataFrame | None = None,
    ):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)
        self.config = config or PipelineConfig()
        self._documents = documents
        #: optional side table of media payloads (operators/multimodal
        #: MEDIA_SCHEMA); table media contributes mentions too
        self._media = media

    # -- lineage ------------------------------------------------------------
    def _record_lineage(
        self, stage: str, snap_id: int, df: DataFrame, wall_ms: float
    ) -> None:
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows_out"))
            .withColumn("stage", F.lit(stage))
            .withColumn("snapshot_id", F.lit(snap_id))
            .withColumn("wall_ms", F.lit(float(wall_ms)))
            .withColumn("config", F.lit(self.config.fingerprint()))
            .select(
                "stage", "snapshot_id", "partition_id", "rows_out",
                "wall_ms", "config",
            )
        )
        if self.catalog.exists("lineage"):
            prev = self.catalog.read("lineage")
            per_part = prev.unionByName(per_part)
        self.catalog.write("lineage", per_part)
        # stage-level metrics rollup (the north rule materializes lineage
        # AND metrics): rows, partitions, skew ratio, wall time per stage
        stage_metrics = (
            self.catalog.read("lineage")
            .groupBy("stage", "snapshot_id", "config")
            .agg(
                F.sum("rows_out").alias("rows_out"),
                F.count(F.lit(1)).alias("n_partitions"),
                F.max("rows_out").alias("max_partition_rows"),
                F.round(
                    F.max("rows_out")
                    / F.greatest(F.avg("rows_out"), F.lit(1.0)),
                    3,
                ).alias("partition_skew"),
                F.max("wall_ms").alias("wall_ms"),
            )
        )
        self.catalog.write("metrics", stage_metrics)

    def _stage_done(self, stage: str) -> bool:
        if not self.catalog.exists(stage):
            return False
        return (
            self.catalog.snapshot_meta(stage).get("config")
            == self.config.fingerprint()
        )

    def _commit(self, stage: str, df: DataFrame, t0: float) -> DataFrame:
        snap_id = self.catalog.write(
            stage, df, meta={"config": self.config.fingerprint()}
        )
        out = self.catalog.read(stage)
        self._record_lineage(stage, snap_id, out, (time.time() - t0) * 1e3)
        return out

    # -- stages ---------------------------------------------------------------
    def _run_ingest(self) -> DataFrame:
        t0 = time.time()
        docs = (
            self._documents
            if self._documents is not None
            else generate_documents(
                self.spark,
                self.config.n_docs,
                seed=self.config.seed,
                hot_entity_skew=self.config.hot_entity_skew,
                oversized_doc_pct=self.config.oversized_doc_pct,
            )
        )
        return self._commit("ingest", docs, t0)

    def _run_dedup(self, docs: DataFrame) -> DataFrame:
        """Corpus dedup between ingest and extraction — the stage a
        training-data pipeline always runs; extraction cost then scales
        with UNIQUE content. Committed like any stage (resumable).

        'minhash' composes exact-first-then-fuzzy (the production
        order): exact fingerprint dedup is cheap and CHAINING-PROOF —
        rep-verified near-dup removal alone can miss an exact duplicate
        pair whose members both sit far from their bucket-chained
        cluster representative.
        """
        t0 = time.time()
        from ..functions.textmetrics import doc_fingerprint

        if self.config.dedup not in ("exact", "minhash"):
            raise ValueError(f"unknown dedup mode {self.config.dedup!r}")

        payload = build_payload(docs, mode="full_text")
        with_fp = payload.withColumn("__fp", doc_fingerprint("payload"))
        keep = with_fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
        unique = with_fp.join(keep, ["__fp", "doc_id"]).select(*docs.columns)

        if self.config.dedup == "minhash":
            from ..operators.dedup import minhash_dedup_groups_fast

            groups = minhash_dedup_groups_fast(
                build_payload(unique, mode="full_text"),
                text_col="payload",
                verify_threshold=self.config.minhash_threshold,
            )
            drop = groups.filter(
                F.col("doc_id") != F.col("group_id")
            ).select("doc_id")
            unique = unique.join(drop, "doc_id", "left_anti")
        return self._commit("unique_docs", unique, t0)

    def _run_mentions(self, docs: DataFrame) -> DataFrame:
        t0 = time.time()
        if self.config.chunk_max_spans:
            from ..operators.skew import extract_chunked

            mentions = extract_chunked(
                docs, self.config.chunk_max_spans, mode=self.config.mode
            )
        else:
            mentions = extract_triples(
                build_payload(docs, mode=self.config.mode)
            )
        if self._media is not None:
            from ..operators.extraction import merge_binary_yes_wins
            from ..operators.multimodal import extract_from_table_media

            mentions = merge_binary_yes_wins(
                mentions.unionByName(
                    extract_from_table_media(self._media)
                ).dropDuplicates(["doc_id", "pred", "obj"])
            )
        return self._commit("mentions", mentions, t0)

    def _run_triples(self, mentions: DataFrame) -> DataFrame:
        t0 = time.time()
        triples = link_mentions(
            mentions, vocabulary_df(self.spark), fuzzy=self.config.fuzzy
        )
        return self._commit("triples", triples, t0)

    def _run_entities(self, triples: DataFrame) -> DataFrame:
        t0 = time.time()
        vdf = vocabulary_df(self.spark)
        fuzzy_links = None
        if self.config.fuzzy:
            from .. import vocab as _vocab
            from ..functions.normalize import normalize_text

            vocab_fields = list({f for f, _, _ in _vocab.gazetteer_rows()})
            known = vdf.select(
                F.col("field").alias("pred"),
                normalize_text("surface").alias("obj"),
            )
            unresolved = (
                triples.filter(F.col("pred").isin(vocab_fields))
                .select("pred", normalize_text("obj").alias("obj"))
                .dropDuplicates()
                .join(known, ["pred", "obj"], "left_anti")
                .select(F.col("pred").alias("field"), F.col("obj").alias("surface"))
            )
            fuzzy_links = fuzzy_link_surfaces(unresolved, vdf)
        entities = build_entities(vdf, fuzzy_links)
        return self._commit("entities", entities, t0)

    # -- driver ---------------------------------------------------------------
    def run(self, resume: bool = True, stop_after: str | None = None) -> dict:
        """Execute the stage graph; returns {stage: row_count}.

        ``resume=True`` reuses any committed snapshot with a matching
        config fingerprint. ``stop_after`` simulates a mid-run kill for
        the resume test.
        """
        counts: dict[str, int] = {}

        def maybe(stage: str, fn, *args) -> DataFrame:
            if resume and self._stage_done(stage):
                return self.catalog.read(stage)
            return fn(*args)

        docs = maybe("ingest", self._run_ingest)
        counts["ingest"] = docs.count()
        if stop_after == "ingest":
            return counts

        if self.config.dedup != "none":
            docs = maybe("unique_docs", self._run_dedup, docs)
            counts["unique_docs"] = docs.count()
            if stop_after == "unique_docs":
                return counts

        mentions = maybe("mentions", self._run_mentions, docs)
        counts["mentions"] = mentions.count()
        if stop_after == "mentions":
            return counts

        triples = maybe("triples", self._run_triples, mentions)
        counts["triples"] = triples.count()
        if stop_after == "triples":
            return counts

        entities = maybe("entities", self._run_entities, triples)
        counts["entities"] = entities.count()
        return counts

    def read(self, stage: str) -> DataFrame:
        return self.catalog.read(stage)
