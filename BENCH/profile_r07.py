"""Round-7 per-branch profiling of the composite entries (q15/q18/q19/q38).
Times each union branch / pipeline stage separately with the noop sink.
Usage: python BENCH/profile_r07.py q15 [q18 q38 q19]"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    from forex_feature_generator_spark.ops import cache as opcache
    t0 = time.time()
    fn()
    print(f"  {label:40s} {time.time() - t0:7.2f}s", flush=True)
    opcache.release_all()


def prof_q15(spark):
    from forex_feature_generator_spark.ops import dedup as D
    import __spark_entry__ as em
    docs = em._load(spark, SF_DIR, "documents")
    print("q15 branches:")
    timed("shingles scan (count only)",
          lambda: D.shingles(docs).write.format("noop")
          .mode("overwrite").save())
    sh = D.shingles(docs)
    timed("jaccard exact (own shingles)",
          lambda: noop(D.ngram_jaccard_pairs(docs, threshold=0.08,
                                             shingles_df=sh)))
    sh2 = D.shingles(docs)
    timed("minhash 16x8 (own shingles)",
          lambda: noop(D.minhash_lsh_pairs(docs, num_hashes=16, bands=8,
                                           threshold=0.05, shingles_df=sh2)))
    timed("simhash", lambda: noop(em.q17_simhash(spark, SF_DIR)))
    timed("embedding", lambda: noop(em.q28_embedding_dedup(spark, SF_DIR)))
    timed("FULL q15 entry",
          lambda: noop(em.q15_pair_similarity(spark, SF_DIR)))


def prof_q18(spark):
    import __spark_entry__ as em
    from forex_feature_generator_spark.ops import similarity as SIM
    emb = em._load(spark, SF_DIR, "embeddings")
    qdf = emb.filter(F.col("vec_id") < 10)
    print("q18 branches:")
    timed("brute", lambda: noop(em.q18_ann_cosine(spark, SF_DIR)))
    timed("lsh", lambda: noop(em.q29_ann_lsh(spark, SF_DIR)))
    timed("ivf(hash cents)", lambda: noop(em.q37_ann_ivf(spark, SF_DIR)))

    def ivfk():
        c = SIM.kmeans_centroids(emb, 16, iters=3)
        noop(SIM.ivf_topk(emb, qdf, k=5, n_cells=16, n_probe=2, centroids=c))
    timed("ivfk (kmeans + ivf)", ivfk)
    t0 = time.time()
    SIM.kmeans_centroids(emb, 16, iters=3)
    print(f"  {'kmeans_centroids alone':40s} {time.time() - t0:7.2f}s",
          flush=True)
    from forex_feature_generator_spark.ops import cache as opcache
    opcache.release_all()
    timed("FULL q18 entry", lambda: noop(em.q18_ann_methods(spark, SF_DIR)))


def prof_q19(spark):
    import __spark_entry__ as em
    from forex_feature_generator_spark.ops import classifier as CLF
    from forex_feature_generator_spark.ops import text as TXT
    docs = em._load(spark, SF_DIR, "documents")
    print("q19 branches:")
    timed("heuristic",
          lambda: noop(TXT.quality_score(TXT.token_counts(docs))))
    labeled = docs.withColumn("__is_ref",
                              (F.col("lang") == "en").cast("int"))

    def train():
        CLF.train_quality_classifier(labeled, "__is_ref",
                                     n_buckets=em.CLF_BUCKETS,
                                     epochs=em.CLF_EPOCHS, lr=em.CLF_LR)
    timed("classifier train (6 epochs)", train)
    timed("FULL q19 entry", lambda: noop(em.q19_text_quality(spark, SF_DIR)))


def prof_q38(spark):
    import __spark_entry__ as em
    from forex_feature_generator_spark.ops import dedup as D
    docs = em._load(spark, SF_DIR, "documents")
    print("q38 stages:")
    timed("minhash pairs alone",
          lambda: noop(D.minhash_lsh_pairs(docs, num_hashes=16, bands=8,
                                           threshold=0.05)))

    def cc():
        stats = []
        pairs = D.minhash_lsh_pairs(docs, num_hashes=16, bands=8,
                                    threshold=0.05)
        noop(D.dedup_clusters(pairs, round_stats=stats))
        for s in stats:
            print(f"    round {s['round']}: changed={s['changed']} "
                  f"{s['sec']}s", flush=True)
    timed("FULL q38 (with round stats)", cc)


def main():
    from forex_feature_generator_spark.engine.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile_r07", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    which = sys.argv[1:] or ["q15"]
    for w in which:
        {"q15": prof_q15, "q18": prof_q18, "q19": prof_q19,
         "q38": prof_q38}[w](spark)
    spark.stop()


if __name__ == "__main__":
    main()
