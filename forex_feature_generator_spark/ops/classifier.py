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
from .similarity import lit_doubles

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
    so the same hyper-parameters transfer across corpus sizes.

    r7 epoch-loop restructure (identical trained model up to float-sum
    order, verified EXACT vs the DuckDB recursive-CTE oracle):
      * the pinned frame packs each doc's sparse features into ONE row
        (id, fs: array<(bkt, cnt)>, y) — bounded by min(doc len,
        n_buckets) <= B entries, so nothing unbounded sits in a row;
        the label is folded in once at pin time (the old margins⋈labels
        sort-merge join ran in every epoch; inner-join semantics — only
        docs with >= 1 token train — are preserved because only such
        docs have feature rows);
      * the B-row weight table becomes a constant-folded LITERAL array
        indexed by bucket (w_arr[bkt]) — no per-epoch createDataFrame,
        no broadcast build, no join (guide §4.1: prefer expressions);
      * an epoch is then ONE pass over the pinned rows: margin + sigmoid
        + residual as row-local array expressions, gradient contributions
        exploded and partial-aggregated into the B+1-row bucket shuffle —
        per epoch: one cache scan, one tiny exchange, zero joins (r6
        shape: broadcast build + 2 corpus-keyed joins + 2 corpus
        exchanges per epoch; guide §2.3/2.4)."""
    feats_rows = hashed_features(docs, text_col, id_col, n_buckets)
    packed = pin(feats_rows.groupBy("id")
                 .agg(F.collect_list(F.struct("bkt", "cnt")).alias("fs"))
                 .join(docs.select(F.col(id_col).alias("id"),
                                   F.col(label_col).cast("double")
                                   .alias("__y")), "id"))
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("empty training frame")
    w = [0.0] * n_buckets
    bias = 0.0
    for _ in range(int(epochs)):
        w_arr = lit_doubles(w)
        lin = F.aggregate(
            "fs", F.lit(0.0),
            lambda acc, s: acc + s["cnt"] * F.get(w_arr,
                                                  s["bkt"].cast("int")))
        r = (F.lit(1.0) / (F.lit(1.0) + F.exp(-(lin + F.lit(bias))))
             - F.col("__y"))
        # bias gradient rides along as virtual bucket -1 (cnt ≡ 1), so the
        # whole epoch is ONE action: margins + residuals + all B+1 partial
        # sums in a single job (at scale the epoch is latency-bound on job
        # setup, not data).
        contrib = F.concat(
            F.transform("fs", lambda s: F.struct(
                s["bkt"].alias("bkt"),
                (s["cnt"] * r).alias("__gx"))),
            F.array(F.struct(F.lit(-1).cast("long").alias("bkt"),
                             r.alias("__gx"))))
        grads = (packed.select(F.explode(contrib).alias("g"))
                 .groupBy(F.col("g.bkt").alias("bkt"))
                 .agg(F.sum("g.__gx").alias("__g"))
                 .collect())
        for row in grads:
            if row["bkt"] < 0:
                bias -= lr * row["__g"] / n_docs
            else:
                w[row["bkt"]] -= lr * row["__g"] / n_docs
    # unlike ops returning lazy frames, training consumes its pins HERE
    # (the last epoch's collect) — release them instead of deferring to
    # the caller's release_all()
    packed.unpersist()
    return w, bias


def classifier_score(docs: DataFrame, weights: list[float], bias: float,
                     text_col: str = "text", id_col: str = "doc_id",
                     out_col: str = "quality_prob") -> DataFrame:
    """Score documents with a trained linear classifier: input columns +
    `out_col` (rounded to 6). Docs with no in-vocabulary tokens score
    sigmoid(bias).

    r7: fully ROW-LOCAL — the weights are a constant-folded literal array
    and the margin is a per-row fold over the tokenized words, so scoring
    is one narrow projection: no hashed-features shuffle, no score⋈docs
    join, no broadcast (r6 shape: tokenize + groupBy(id,bkt) exchange +
    margin exchange + corpus-keyed left join; guide §2.4). Identical up
    to float-sum order, absorbed by the round-6 output (verified exact
    vs the oracle)."""
    b_count = len(weights)
    w_arr = lit_doubles(weights)
    words = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                     lambda x: x != "")
    bkt = lambda x: (F.conv(F.substring(F.md5(x), 1, 8), 16, 10)  # noqa: E731
                     .cast("long") % F.lit(b_count)).cast("int")
    lin = F.aggregate(words, F.lit(0.0),
                      lambda acc, x: acc + F.get(w_arr, bkt(x)))
    p = F.round(F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(lin + F.lit(bias)))), 6)
    empty_p = round(1.0 / (1.0 + math.exp(-bias)), 6)
    return docs.withColumn(out_col, F.when(F.size(words) > 0, p)
                           .otherwise(F.lit(empty_p)))
