"""One fresh-session cold timing of a query (bench-style warmup first).

Usage: python tools/probe_cold1.py <query> [sf_dir]
Prints one float (seconds).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/synthdata/sf1.0"
    import __spark_entry__ as entrymod
    from bench import CPUS
    from llm_information_extraction_spark.session import get_spark

    spark = get_spark(app_name="probe_cold1", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for warm_q in ("kg_triples", "minhash_dedup", "simhash_pairs",
                   "ivf_topk_emb"):
        qs[warm_q](spark, "/root/testdata/sf0.001").count()
    t0 = time.time()
    qs[name](spark, sf_dir).count()
    print(f"{time.time() - t0:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
