"""Per-query isolation bench (guide §1.4): times each declared query
with the noop sink so the computation is measured, not the sink, and
optionally dumps .explain("formatted") per query.

NOT the driver's bench — bench.py stays frozen. Usage:

    python bench_extra.py [--sf-dir DIR] [--queries a,b,c] [--repeats N]
        [--plans-dir plans/r06 --plans-suffix before]

Prints one JSON line {"queries": {name: best_sec}, "sf_dir": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: bench HEADLINE)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    ap.add_argument("--count", action="store_true",
                    help="time .count() like the driver bench instead of noop")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import CPUS, HEADLINE
    from llm_information_extraction_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else HEADLINE
    # same warmup as bench.py
    for warm_q in ("kg_triples", "minhash_dedup", "simhash_pairs",
                   "ivf_topk_emb"):
        qs[warm_q](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in names:
        if args.plans_dir:
            pd = Path(args.plans_dir)
            pd.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (pd / f"{name}_{args.plans_suffix}.txt").write_text(plan)
        best = float("inf")
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"queries": timings, "sf_dir": args.sf_dir,
                      "mode": "count" if args.count else "noop",
                      "repeats": args.repeats}))


if __name__ == "__main__":
    main()
