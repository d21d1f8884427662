"""Evidence tool: shuffle volume of the MinHash verify stage, old vs new.

Round 1 verified banded candidates by joining each pair to BOTH docs'
full shingle ARRAYS (shuffling whole documents per candidate); round 2
ships only candidate-doc shingle tokens through an equi-join. This
script runs both shapes on the same corpus and reports total shuffle
write bytes per query, read from the Spark UI REST API (stage metrics
are exact regardless of machine load).

    python tools/measure_verify_shuffle.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from llm_information_extraction_spark.operators.dedup import (  # noqa: E402
    minhash_candidate_pairs,
    minhash_verified_pairs,
    word_shingles,
)
from llm_information_extraction_spark.session import get_spark  # noqa: E402


def _stage_shuffle_bytes(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def verify_old_shape(docs, threshold: float):
    """Round-1 verify: full shingle arrays joined per candidate pair."""
    cands = minhash_candidate_pairs(docs)
    sh = docs.select(
        F.col("doc_id").alias("id"), word_shingles("text", 3).alias("sh")
    ).cache()
    return (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="verify-shuffle",
        extra_conf={
            "spark.ui.enabled": "true",  # REST API is the metrics source
            "spark.ui.port": "4050",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    docs.count()

    results = {}
    for label, fn in (
        ("old_full_array_join", lambda: verify_old_shape(docs, 0.5).count()),
        (
            "new_token_semijoin",
            lambda: minhash_verified_pairs(docs, threshold=0.5).count(),
        ),
    ):
        w0, r0 = _stage_shuffle_bytes(ui)
        t0 = time.time()
        n = fn()
        wall = time.time() - t0
        w1, r1 = _stage_shuffle_bytes(ui)
        results[label] = {
            "pairs": n,
            "shuffle_write_bytes": w1 - w0,
            "shuffle_read_bytes": r1 - r0,
            "wall_sec": round(wall, 2),
        }
    old_w = results["old_full_array_join"]["shuffle_write_bytes"]
    new_w = results["new_token_semijoin"]["shuffle_write_bytes"]
    results["write_bytes_ratio_old_over_new"] = (
        round(old_w / new_w, 2) if new_w else None
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
