"""A/B timing harness for the dedup_clusters cost cuts (round 6).

Runs q38_dedup_clusters / q44_dedup_keep_best cold (fresh SparkSession,
cache released between trials) at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints per-trial seconds + round stats. Run it once on the old code
(git stash) and once on the new to get a like-for-like pair in the same
host window.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E
from forex_feature_generator_spark.ops import dedup as D
from forex_feature_generator_spark.ops.cache import release_all

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TRIALS = int(os.environ.get("AB_TRIALS", "3"))


def main():
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("ab_q38").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF_DIR, "cpus": CPUS, "trials": {}}
    # warm-up: JVM/codegen warm, then release so trials are cache-cold
    E.queries()["q38_dedup_clusters"](spark, SF_DIR).count()
    release_all()
    for name in ("q38_dedup_clusters", "q44_dedup_keep_best"):
        fn = E.queries()[name]
        secs = []
        for _ in range(TRIALS):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            secs.append(round(time.time() - t0, 2))
            release_all()
        out["trials"][name] = secs
    # convergence shape of the CC loop itself
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pairs = D.minhash_lsh_pairs(docs, num_hashes=16, bands=8, threshold=0.05)
    stats = []
    t0 = time.time()
    D.dedup_clusters(pairs, round_stats=stats).count()
    out["cc_total_sec"] = round(time.time() - t0, 2)
    out["cc_rounds"] = stats
    release_all()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
