"""Distributed linear quality-classifier training + inference.

The GPT-3 / WebText-style curation step (Brown et al. 2020, appendix A —
public paper): train a logistic-regression classifier over hashed
bag-of-words features to score "does this page look like the high-quality
reference corpus", then keep/weight documents by the predicted probability.
fastText's supervised mode (Joulin et al. 2016) is the same model family:
a linear layer over averaged hashed n-gram features.

Spark-first shape (100 TB): the sparse feature table (doc, bucket, count)
is built ONCE (one tokenize scan, partial-agg shuffle on (doc, bucket))
and pinned. Each full-batch gradient-descent epoch is:

    margins:  feature table  ⋈  broadcast B-row weight table  →
              groupBy(doc) partial-agg  →  sigmoid
    gradient: (p - y) * count per (doc, bucket)  →
              groupBy(bucket) partial-agg  →  collect B rows

i.e. ONE bounded shuffle per epoch plus a B-row driver round-trip — the
classic distributed full-batch GD layout; nothing corpus-sized ever
reaches the driver, and the weight vector is re-broadcast per epoch.
Training is deterministic up to float summation order (w0 = 0, fixed lr,
fixed epoch count); tests verify against a numpy reference at 1e-6.

Reference parity note: the reference repo has no classifier training —
this is part of the LLM-training-data extension surface (SURVEY.md §6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import pin
from .dedup import normalize_text

DEFAULT_BUCKETS = 1024


def hashed_features(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Sparse hashed bag-of-words: (id, bucket, count) — one tokenize scan
    + one partial-aggregated shuffle on the (id, bucket) pair. The bucket
    is the shared md5-prefix hash (the engine-portable hash every oracle
    uses), so features are reproducible across engines."""
    w = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__w")
    d = docs.select(F.col(id_col).alias("id"), w).filter(F.col("__w") != "")
    bkt = (F.conv(F.substring(F.md5("__w"), 1, 8), 16, 10).cast("long")
           % F.lit(n_buckets))
    return (d.select("id", bkt.alias("bkt"))
            .groupBy("id", "bkt")
            .agg(F.count(F.lit(1)).cast("double").alias("cnt")))


def _score_frame(feats: DataFrame, wtable: DataFrame, bias: float):
    """p = sigmoid(sum_b w_b * cnt_b + bias) per id; the weight table is
    B rows, always broadcast."""
    lin = (feats.join(F.broadcast(wtable), "bkt")
           .groupBy("id")
           .agg(F.sum(F.col("cnt") * F.col("w")).alias("__lin")))
    return lin.select(
        "id", (F.lit(1.0) / (F.lit(1.0)
                             + F.exp(-(F.col("__lin") + F.lit(bias)))))
        .alias("__p"))


def train_quality_classifier(docs: DataFrame, label_col: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             n_buckets: int = DEFAULT_BUCKETS,
                             epochs: int = 20,
                             lr: float = 1.0) -> tuple[list[float], float]:
    """Full-batch logistic regression by distributed gradient descent.
    Returns (weights[n_buckets], bias). `label_col` is 0/1 (1 = the
    high-quality class).

    Per epoch: one broadcast join + two partial-aggregated shuffles
    (doc margins, bucket gradients) + a B-row collect. The feature table
    and the (id, y) labels are pinned once — the epoch loop re-reads the
    cache, never the corpus. Gradients are mean-normalized (lr is per-doc),
    so the same hyper-parameters transfer across corpus sizes."""
    spark = docs.sparkSession
    feats = pin(hashed_features(docs, text_col, id_col, n_buckets))
    labels = pin(docs.select(F.col(id_col).alias("id"),
                             F.col(label_col).cast("double").alias("__y")))
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("empty training frame")
    w = [0.0] * n_buckets
    bias = 0.0
    for _ in range(int(epochs)):
        wtable = spark.createDataFrame(
            [(int(b), float(wb)) for b, wb in enumerate(w)], "bkt long, w double")
        resid = (_score_frame(feats, wtable, bias)
                 .join(labels, "id")
                 .select("id", (F.col("__p") - F.col("__y")).alias("__r")))
        # bias gradient rides along as virtual bucket -1 (cnt ≡ 1), so the
        # whole epoch is ONE action: margins + residuals + all B+1 partial
        # sums in a single job instead of two (halves per-epoch latency —
        # at scale the epoch is latency-bound on job setup, not data).
        grads = (feats.join(resid, "id")
                 .select("bkt", (F.col("cnt") * F.col("__r")).alias("__gx"))
                 .unionByName(resid.select(F.lit(-1).alias("bkt"),
                                           F.col("__r").alias("__gx")))
                 .groupBy("bkt")
                 .agg(F.sum("__gx").alias("__g"))
                 .collect())
        for row in grads:
            if row["bkt"] < 0:
                bias -= lr * row["__g"] / n_docs
            else:
                w[row["bkt"]] -= lr * row["__g"] / n_docs
    # unlike ops returning lazy frames, training consumes its pins HERE
    # (the last epoch's collect) — release them instead of deferring to
    # the caller's release_all()
    feats.unpersist()
    labels.unpersist()
    return w, bias


def classifier_score(docs: DataFrame, weights: list[float], bias: float,
                     text_col: str = "text", id_col: str = "doc_id",
                     out_col: str = "quality_prob") -> DataFrame:
    """Score documents with a trained linear classifier: input columns +
    `out_col` (rounded to 6). Docs with no in-vocabulary tokens score
    sigmoid(bias). One tokenize scan + one broadcast join — no corpus
    shuffle beyond the per-doc partial agg."""
    spark = docs.sparkSession
    wtable = spark.createDataFrame(
        [(int(b), float(wb)) for b, wb in enumerate(weights)],
        "bkt long, w double")
    feats = hashed_features(docs, text_col, id_col, len(weights))
    scores = (_score_frame(feats, wtable, bias)
              .select("id", F.round("__p", 6).alias(out_col)))
    empty_p = round(1.0 / (1.0 + math.exp(-bias)), 6)
    return (docs.join(scores, docs[id_col] == scores["id"], "left")
            .drop("id")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(empty_p))))
