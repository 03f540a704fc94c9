"""Partitioning-invariance property tests for the round-6 ops (VERDICT r6
#9, SURVEY §5.4b): passage dedup, incremental near-dup and classifier
training must not change their answers when the input's physical layout
changes (1 vs 32 partitions).

passage_dedup / incremental_near_dedup are integer/hash algebra — their
results must be BIT-identical. The classifier's gradient is an F.sum over
doubles whose partial-combine order follows the partitioning, so raw
weights may drift at the ~1e-15/step float-reassociation level; the test
documents that tolerance (1e-9 on weights after 4 epochs) and asserts the
round(6) scores — the only surface any query exposes — are identical."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from forex_feature_generator_spark.ops import classifier as CLF
from forex_feature_generator_spark.ops import dedup as D
from forex_feature_generator_spark.ops.cache import release_all


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(60)]
    rows = []
    for i in range(60):
        words = list(rng.choice(vocab, size=25))
        if i % 3 == 0:                      # shared boilerplate passages
            words[:6] = ["common", "header", "block", "x", "y", "z"]
        rows.append((i, " ".join(words), "en" if i % 2 else "fr"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def _layouts(spark, pdf):
    df = spark.createDataFrame(pdf)
    return [df.coalesce(1), df.repartition(32, "doc_id"),
            df.repartition(7)]


def test_passage_dedup_invariant(spark, corpus):
    outs = []
    for df in _layouts(spark, corpus):
        out = (D.passage_dedup(df, passage_words=5)
               .orderBy("passage_hash").toPandas())
        release_all()
        outs.append(out)
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)   # bit-identical


def test_incremental_near_dedup_invariant(spark, corpus):
    new_pdf = corpus.iloc[:20].copy()
    seen_pdf = corpus.iloc[15:].copy()
    outs = []
    for new_df, seen_df in zip(_layouts(spark, new_pdf),
                               _layouts(spark, seen_pdf)):
        out = (D.incremental_near_dedup(new_df, seen_df, num_hashes=16,
                                        bands=8, threshold=0.05)
               .orderBy("doc_id").toPandas())
        release_all()
        outs.append(out)
    assert len(outs[0]) > 0
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o)   # bit-identical


def test_classifier_training_tolerance(spark, corpus):
    results = []
    for df in _layouts(spark, corpus):
        labeled = df.withColumn("__is_ref",
                                (F.col("lang") == "en").cast("int"))
        w, b = CLF.train_quality_classifier(labeled, "__is_ref",
                                            n_buckets=64, epochs=4, lr=0.5)
        release_all()
        results.append((np.asarray(w), b))
    w0, b0 = results[0]
    assert np.abs(w0).max() > 0                     # training moved
    for w, b in results[1:]:
        # float-sum reassociation across partitionings: documented 1e-9
        # tolerance on the raw parameters ...
        assert np.allclose(w0, w, rtol=0, atol=1e-9), float(np.abs(w0 - w).max())
        assert abs(b0 - b) < 1e-9
    # ... and the EXPOSED surface (round-6 scores) must be identical
    scores = []
    for (w, b), df in zip(results, _layouts(spark, corpus)):
        s = (CLF.classifier_score(df, list(w), b)
             .select("doc_id", "quality_prob").orderBy("doc_id").toPandas())
        release_all()
        scores.append(s)
    for s in scores[1:]:
        pd.testing.assert_frame_equal(scores[0], s)
