"""spark_submit_main --mode curate: end-to-end CLI run + independent
DuckDB recompute of the exact-dup canonical flags and verdict algebra."""

import json
import os
import subprocess
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001/documents.parquet"


def test_cli_curate(tmp_path):
    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "spark_submit_main.py", "--mode", "curate",
         "--input", SRC, "--output", out, "--min-words", "5"],
        capture_output=True, text=True, cwd=ROOT, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(ln) for ln in r.stdout.splitlines()
             if ln.startswith("{")]
    summary = next(ln for ln in lines if "curate" in ln)["curate"]

    con = duckdb.connect()
    got = con.execute(f"SELECT * FROM '{out}/*.parquet'").df()
    src = con.execute(f"SELECT count(*) FROM '{SRC}'").fetchone()[0]
    assert len(got) == src                       # every doc gets a verdict

    # canonical flags == DuckDB's earliest-doc-per-normalized-hash
    ref = con.execute(f"""
        SELECT doc_id,
               doc_id = min(doc_id) OVER (
                 PARTITION BY md5(trim(regexp_replace(lower(text),
                                       '[^a-z0-9]+', ' ', 'g')))) AS canon
        FROM '{SRC}'""").df().set_index("doc_id")["canon"]
    got_canon = got.set_index("doc_id")["is_canonical"]
    assert (got_canon == ref[got_canon.index]).all()

    # verdict algebra + summary consistency
    assert (got["curated"] == (got["is_canonical"] & got["keep"])).all()
    assert summary["curated"] == int(got["curated"].sum())
    assert summary["exact_dupes"] == int((~got["is_canonical"]).sum())
    assert summary["gopher_dropped"] == int(
        (got["is_canonical"] & ~got["keep"]).sum())
    assert summary["curated"] > 0                # floor=5 keeps real docs


def test_cli_curate_null_text(tmp_path):
    """Dirty shard: NULL-text docs must still get a verdict row (r7 fix —
    md5(normalize(NULL)) is NULL and the null-unsafe keeper join silently
    dropped them). A NULL-text doc behaves like an empty-text doc: the two
    share one normalized-hash group, exactly one of them is canonical."""
    import pandas as pd
    src = str(tmp_path / "dirty.parquet")
    pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox jumps over the lazy dog today",
                 None, "", "the quick brown fox jumps over the lazy dog today"],
        "source": ["a", "a", "b", "b"],
        "lang": ["en"] * 4,
    }).to_parquet(src)
    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "spark_submit_main.py", "--mode", "curate",
         "--input", src, "--output", out, "--min-words", "5"],
        capture_output=True, text=True, cwd=ROOT, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT * FROM '{out}/*.parquet' ORDER BY doc_id").df()
    assert len(got) == 4                         # nothing vanishes
    assert set(got["doc_id"]) == {1, 2, 3, 4}
    # NULL text normalizes like '' -> docs 2 and 3 share one hash group,
    # the earliest (2) is canonical; the later duplicate of doc 1 is not
    by_id = got.set_index("doc_id")
    assert bool(by_id.loc[2, "is_canonical"]) is True
    assert bool(by_id.loc[3, "is_canonical"]) is False
    assert bool(by_id.loc[1, "is_canonical"]) is True
    assert bool(by_id.loc[4, "is_canonical"]) is False
