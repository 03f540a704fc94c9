"""Deterministic sampling/splitting, PII scrub, and sequence packing."""

import pandas as pd
from pyspark.sql import functions as F

from forex_feature_generator_spark.engine.tokens import pack_sequences
from forex_feature_generator_spark.ops import sampling as SMP
from forex_feature_generator_spark.ops import text as TXT


def _docs(spark, n=400):
    rows = [(i, f"doc number {i} body text", ["en", "de", "fr"][i % 3], f"s{i % 4}",
             50 + (i * 37) % 400) for i in range(n)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]))


def test_hash_split_stable_and_proportional(spark):
    docs = _docs(spark)
    a = SMP.hash_split(docs).select("doc_id", "split").toPandas()
    counts = a["split"].value_counts()
    assert set(counts.index) <= {"train", "val", "test"}
    assert counts["train"] > 0.8 * len(a)
    # stability: assignments are a pure function of (seed, id) — adding new
    # rows must not move old ones
    b = SMP.hash_split(docs.filter(F.col("doc_id") < 100)).select(
        "doc_id", "split").toPandas()
    merged = a.merge(b, on="doc_id", suffixes=("_full", "_subset"))
    assert (merged["split_full"] == merged["split_subset"]).all()


def test_deterministic_sample_nests(spark):
    docs = _docs(spark)
    s10 = {r.doc_id for r in SMP.deterministic_sample(docs, 0.1).collect()}
    s30 = {r.doc_id for r in SMP.deterministic_sample(docs, 0.3).collect()}
    assert s10 <= s30                       # supersets nest by construction
    assert 0.03 < len(s10) / 400 < 0.2
    assert 0.18 < len(s30) / 400 < 0.45


def test_stratified_sample_rates(spark):
    docs = _docs(spark, n=900)
    out = SMP.stratified_sample(docs, "lang", {"en": 1.0, "de": 0.5}).toPandas()
    assert set(out["lang"]) <= {"en", "de"}     # fr dropped (rate 0)
    n_en = (out["lang"] == "en").sum()
    n_de = (out["lang"] == "de").sum()
    assert n_en == 300                          # rate 1.0 keeps everything
    assert 90 < n_de < 210                      # ~150 of 300


def test_pii_scrub_planted(spark):
    rows = [
        (0, "contact alice.smith@example.com or visit https://example.com/x?a=1 now"),
        (1, "no pii here at all"),
        (2, "two mails: a@b.co and c.d@e.org plus http://plain.url"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TXT.pii_scrub(docs).orderBy("doc_id").toPandas()
    assert list(out["n_emails"]) == [1, 0, 2]
    assert list(out["n_urls"]) == [1, 0, 1]
    assert out.loc[0, "text_clean"] == "contact <EMAIL> or visit <URL> now"
    assert out.loc[2, "text_clean"] == "two mails: <EMAIL> and <EMAIL> plus <URL>"


def test_top_ngrams_deterministic(spark):
    docs = spark.createDataFrame(pd.DataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)]
        + [(10, "the quick brown cat sits")],
        columns=["doc_id", "text"]))
    out = TXT.top_ngrams(docs, n=3, k=2).toPandas()
    assert out.iloc[0]["shingle"] == "the quick brown"
    assert out.iloc[0]["n_docs"] == 6


def test_repetition_stats_planted(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),       # no repetition
        (1, "spam spam spam spam spam spam"),             # total repetition
        (2, "one two one two one two three"),             # heavy 2-gram reuse
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = TXT.repetition_stats(docs).orderBy("doc_id").toPandas()
    assert out.loc[0, "dup_word_frac"] == 0.0
    assert abs(out.loc[1, "dup_word_frac"] - 5 / 6) < 1e-6  # rounded to 6dp
    assert out.loc[1, "top2_frac"] == 1.0         # "spam spam" is every 2-gram
    # doc 2: 2-grams = [one two, two one, one two, two one, one two, two three]
    assert abs(out.loc[2, "top2_frac"] - 3 / 6) < 1e-9


def test_pack_sequences_arithmetic(spark):
    rows = [(0, "s", 600), (1, "s", 600), (2, "s", 600), (3, "s", 600),
            (10, "t", 1500)]
    seqs = spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "source", "n_tok"]))
    out = (pack_sequences(seqs, seq_len=1024)
           .orderBy("source", "doc_id").toPandas())
    # source s offsets: 0, 600, 1200, 1800 -> packs 0, 0, 1, 1
    assert list(out[out.source == "s"]["pack_id"]) == [0, 0, 1, 1]
    assert list(out[out.source == "s"]["pack_offset"]) == [0, 600, 176, 776]
    # each source starts its own packing at offset 0
    assert list(out[out.source == "t"]["pack_id"]) == [0]
    assert list(out[out.source == "t"]["pack_offset"]) == [0]


def test_chunk_sequences(spark):
    """Chunking edge cases: short doc -> itself; exact multiple; overlap
    windows; empty doc -> no chunks; reconstruction of the original ids."""
    from forex_feature_generator_spark.engine.tokens import chunk_sequences
    rows = [
        ("a", list(range(5)), 5, "s"),      # < max_len -> 1 chunk
        ("b", list(range(8)), 8, "s"),      # == max_len -> 1 chunk
        ("c", list(range(20)), 20, "s"),    # multi-chunk with overlap
        ("d", [], 0, "s"),                  # empty -> 0 chunks
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    got = {}
    for r in chunk_sequences(df, max_len=8, overlap=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_tokens"], r["chunk_len"]))
    for v in got.values():
        v.sort()
    assert got["a"] == [(0, list(range(5)), 5)]
    assert got["b"] == [(0, list(range(8)), 8)]
    # stride 6: starts 0, 6, 12 -> ceil((20-2)/6) = 3 chunks
    assert got["c"] == [(0, list(range(0, 8)), 8),
                        (1, list(range(6, 14)), 8),
                        (2, list(range(12, 20)), 8)]
    assert "d" not in got
    # consecutive chunks overlap by exactly 2 and cover all ids
    covered = sorted({t for _, toks, _ in got["c"] for t in toks})
    assert covered == list(range(20))

def _py_dsir_scores(pool_texts, target_texts, n_buckets=4096, alpha=1.0):
    """Hand-rolled reference for dsir_select's hashed-unigram LLR."""
    import hashlib
    import math

    def words(t):
        import re
        return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]

    def bkt(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets

    tc, rc = {}, {}
    for t in target_texts:
        for w in words(t):
            tc[bkt(w)] = tc.get(bkt(w), 0) + 1
    for _id, t in pool_texts:
        for w in words(t):
            rc[bkt(w)] = rc.get(bkt(w), 0) + 1
    T, R = sum(tc.values()), sum(rc.values())
    aB = alpha * n_buckets
    scores = {}
    for _id, t in pool_texts:
        s = 0.0
        for w in words(t):
            b = bkt(w)
            s += (math.log((tc.get(b, 0) + alpha) / (T + aB))
                  - math.log((rc[b] + alpha) / (R + aB)))
        scores[_id] = round(s, 6)
    return scores


def test_dsir_select_matches_reference(spark):
    # target domain speaks "wiki"; half the pool does too, half speaks "web"
    target = spark.createDataFrame(pd.DataFrame(
        [(1000 + i, "wiki article history science reference citation")
         for i in range(5)], columns=["doc_id", "text"]))
    pool_rows = ([(i, "wiki science reference history notes") for i in range(6)]
                 + [(10 + i, "click buy now cheap deal offer spam") for i in range(6)])
    pool = spark.createDataFrame(pd.DataFrame(pool_rows, columns=["doc_id", "text"]))
    out = (SMP.dsir_select(pool, target, k=6)
           .select("doc_id", "dsir_score").toPandas())
    got = dict(zip(out["doc_id"], out["dsir_score"]))
    ref = _py_dsir_scores(
        pool_rows, ["wiki article history science reference citation"] * 5)
    # top-6 must be exactly the wiki-like docs, scores matching the reference
    assert set(got) == set(range(6))
    for i in range(6):
        assert abs(got[i] - ref[i]) < 2e-6
    # wiki-like docs outscore web-spam docs in the reference too
    assert min(ref[i] for i in range(6)) > max(ref[10 + i] for i in range(6))


def test_domain_cap_paths(spark):
    rows = [
        # domain A total 900 <= cap -> bypass, all selected
        (0, "a", "en", "A", 400), (1, "a", "en", "A", 500),
        # domain B total 1400 > cap: longest-first 700 kept; 400 would put
        # the running total at 1100 > cap -> dropped, as is the 300
        (10, "b", "en", "B", 700), (11, "b", "en", "B", 400),
        (12, "b", "en", "B", 300),
        # domain C: first doc exactly == cap -> kept; second dropped
        (20, "c", "en", "C", 1000), (21, "c", "en", "C", 1),
    ]
    docs = spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]))
    out = SMP.domain_cap(docs, cap=1000).toPandas().set_index("doc_id")
    assert len(out) == len(rows)                     # all rows, flag column
    sel = set(out[out["selected"]].index)
    assert sel == {0, 1, 10, 20}
    # ties inside a domain break by doc_id: equal weights keep the lower id
    tie = spark.createDataFrame(pd.DataFrame(
        [(0, "t", "en", "D", 600), (1, "t", "en", "D", 600)],
        columns=["doc_id", "text", "lang", "source", "n_chars"]))
    tsel = set(SMP.domain_cap(tie, cap=600).toPandas()
               .query("selected")["doc_id"])
    assert tsel == {0}


def test_weighted_sample_reference_and_nesting(spark):
    """Efraimidis-Spirakis by deterministic hash: top-k set must equal a
    hand-rolled md5 reference; top-k sets nest; heavier rows win more."""
    import hashlib
    import math
    rows = [(i, "t", "en", "S", (1 if i < 200 else 100)) for i in range(400)]
    docs = spark.createDataFrame(pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]))

    def key(i, w):
        h = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16) % 1_000_000
        return math.log((h + 0.5) / 1_000_000) / w

    ref = sorted(rows, key=lambda r: (-key(r[0], r[4]), r[0]))
    got20 = [r.doc_id for r in SMP.weighted_sample(docs, k=20).collect()]
    assert set(got20) == {r[0] for r in ref[:20]}
    got50 = {r.doc_id for r in SMP.weighted_sample(docs, k=50).collect()}
    assert set(got20) <= got50                    # fixed keys -> supersets nest
    # weight-100 rows (ids 200+) should dominate a weight-1 population
    assert sum(1 for i in got50 if i >= 200) >= 45


def test_fim_transform_reference(spark):
    """PSM layout vs a hand-rolled md5 reference: span reconstruction,
    sentinel placement, rate gating, and the n<4 guard."""
    import hashlib

    def h(i, seed):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15],
                   16) % 1_000_000

    from forex_feature_generator_spark.engine.tokens import fim_transform
    rows = [(i, list(range(10 * i, 10 * i + 3 + i % 9)), 3 + i % 9, "s")
            for i in range(60)]
    seqs = spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, n_tok int, source string")
    got = {r.doc_id: r for r in fim_transform(seqs, rate=0.5).collect()}
    n_applied = 0
    for i, toks, n, _ in rows:
        r = got[i]
        should = h(i, 101) < 500_000 and n >= 4
        assert r.fim_applied == should
        if not should:
            assert list(r.fim_tokens) == toks and r.fim_len == n
            continue
        n_applied += 1
        p1 = 1 + h(i, 102) % (n - 2)
        p2 = p1 + 1 + h(i, 103) % (n - 1 - p1)
        assert 1 <= p1 < p2 < n
        ref = ([-1] + toks[:p1] + [-3] + toks[p2:] + [-2] + toks[p1:p2])
        assert list(r.fim_tokens) == ref
        assert r.fim_len == n + 3
    assert n_applied >= 15          # the 50% gate actually fires
