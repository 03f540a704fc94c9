"""Strict oracle parity checker for the round-7 optimization pass.

Mimics the driver's CORRECTNESS gate more strictly than
tests/test_entry_queries.py: EXACT value equality (no float tolerance)
after canonicalization, at sf0.001 AND sf0.01 — a rewrite that shifts any
rounded value fails here before it can fail the driver's hash check.

  python verify_extra.py q10_norm_binning q06_fill
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as em


def _duck(sql, sf_dir):
    con = duckdb.connect()
    for t in em.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    names = sys.argv[1:]
    if not names:
        print("usage: python verify_extra.py <query> [...]")
        return 1
    from forex_feature_generator_spark.ops import cache as opcache
    if "--vanilla" in names:
        # the driver's CORRECTNESS gate runs a VANILLA session (ANSI on,
        # default confs) — replicate it so ANSI-only failures surface here
        names.remove("--vanilla")
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[8]")
                 .appName("verify_extra_vanilla").getOrCreate())
    else:
        from forex_feature_generator_spark.engine.session import get_spark
        spark = get_spark("verify_extra", master="local[8]",
                          shuffle_partitions=8)
    qs, oracles = em.queries(), em.oracle_sql()
    rc = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            got = _canon(qs[name](spark, sf_dir).toPandas())
            opcache.release_all()
            exp = _canon(_duck(oracles[name], sf_dir))
            ok = (list(got.columns) == list(exp.columns)
                  and len(got) == len(exp))
            if ok:
                for c in got.columns:
                    gv, ev = got[c].to_numpy(), exp[c].to_numpy()
                    same = (pd.isna(gv) == pd.isna(ev)).all() and (
                        (gv[~pd.isna(gv)] == ev[~pd.isna(ev)]).all())
                    if not same:
                        ok = False
                        bad = np.flatnonzero(~(pd.Series(gv).eq(pd.Series(ev))
                                               | (pd.isna(gv)
                                                  & pd.isna(ev))))[:5]
                        print(f"  {name}.{c} EXACT mismatch at {bad}: "
                              f"spark={gv[bad]} duck={ev[bad]}")
            print(f"{sf_dir.split('/')[-1]:8s} {name:24s} "
                  f"{'OK' if ok else 'FAIL'} rows={len(got)}/{len(exp)}")
            rc |= 0 if ok else 1
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
