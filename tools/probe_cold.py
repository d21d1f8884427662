"""Throwaway probe: decompose the cold-vs-warm premium of one query.

Fresh session → bench-style sf0.001 warmup → run the query twice at the
target SF → print per-job wall times for both executions via the
status-tracker REST API, so the premium can be attributed to a stage.

Usage: python tools/probe_cold.py <query> [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entrymod
    from bench import CPUS
    from llm_information_extraction_spark.session import get_spark

    spark = get_spark(
        app_name="probe_cold",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for warm_q in ("kg_triples", "minhash_dedup", "simhash_pairs",
                   "ivf_topk_emb"):
        qs[warm_q](spark, "/root/testdata/sf0.001").count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(group: str):
        url = f"{ui}/api/v1/applications/{app_id}/jobs"
        data = json.load(urllib.request.urlopen(url))
        return [j for j in data if j.get("jobGroup") == group]

    results = {}
    for run in ("cold", "warm"):
        spark.sparkContext.setJobGroup(run, f"{name} {run}")
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        wall = time.time() - t0
        spark.sparkContext.setJobGroup("", "")
        results[run] = wall

    for run in ("cold", "warm"):
        print(f"== {run}: {results[run]:.3f}s")
        for j in sorted(jobs_after(run), key=lambda j: j["jobId"]):
            sub = j["submissionTime"]
            comp = j.get("completionTime", "?")
            print(
                f"  job {j['jobId']:>3} stages={j['stageIds']} "
                f"tasks={j['numTasks']:>4} {sub} -> {comp} | "
                f"{j['name'][:90]}"
            )
    # stage-level detail
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    print("== stages (completed), slowest 20:")
    rows = []
    for s in stages:
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t_sub = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t_cmp = datetime.strptime(s["completionTime"], fmt)
            dur = (t_cmp - t_sub).total_seconds()
        except Exception:
            dur = -1
        rows.append((dur, s["stageId"], s["numTasks"], s["name"][:70]))
    for dur, sid, nt, nm in sorted(rows, reverse=True)[:20]:
        print(f"  stage {sid:>3} {dur:7.3f}s tasks={nt:>4} {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
