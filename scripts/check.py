#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, registers each /root/testdata parquet as a view,
runs every oracle SQL, and compares against the Spark parquet dump in
<out>/<name>/ — columns sorted by name, rows sorted by all columns, exact
value compare (with a tiny float report if mismatched).
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort", na_position="first")
    return df

def canon_type(t):
    """Driver-hash equivalence classes for duckdb types: pandas widens all
    int widths <= 64 to int64, so those hash alike — but HUGEINT (int128,
    what DuckDB widens integer SUMs to) does NOT, and is exactly the
    round-3 h12 failure mode this check exists to catch before the driver.
    """
    t = str(t).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "INT8", "INT16", "INT32", "INT64"):
        return "INT"
    if t == "INT128":
        return "HUGEINT"
    if t in ("STRING", "TEXT"):
        return "VARCHAR"
    if t in ("TIMESTAMP_NS", "TIMESTAMP_US", "DATETIME"):
        return "TIMESTAMP"
    return t


def main(out, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0

    def check_one(name, sql):
        """Returns True on pass; raises or returns False otherwise."""
        orel = con.sql(sql)
        otypes = dict(zip(orel.columns, [str(t) for t in orel.types]))
        exp = orel.df()
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            return False
        # physical type drift (the driver hashes value ENCODINGS, so a
        # value-equal frame can still hash-fail on e.g. HUGEINT vs BIGINT)
        srel = con.sql(f"SELECT * FROM '{files[0]}'")
        stypes = dict(zip(srel.columns, [str(t) for t in srel.types]))
        drift = [f"{c}: spark={stypes[c]} oracle={otypes[c]}"
                 for c in stypes if c in otypes
                 and canon_type(stypes[c]) != canon_type(otypes[c])]
        if drift:
            print(f"FAIL {name}: TYPE drift — " + "; ".join(drift))
            return False
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        e, g = canon(exp), canon(got)
        if list(e.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(e.columns)}\n  spark : {list(g.columns)}")
            return False
        if len(e) != len(g):
            print(f"FAIL {name}: row counts differ oracle={len(e)} spark={len(g)}")
            return False
        ok = True
        for c in e.columns:
            ec, gc = e[c], g[c]
            if ec.dtype.kind == "f" or gc.dtype.kind == "f":
                same = ((ec.isna() & gc.isna()) | (ec == gc)).all()
                if not same:
                    d = (ec - gc).abs().max()
                    print(f"FAIL {name}: col {c} float mismatch, max|diff|={d}")
                    ok = False
            else:
                eq = (ec.astype(object).where(~ec.isna(), None) == gc.astype(object).where(~gc.isna(), None))
                both_na = ec.isna() & gc.isna()
                if not (eq | both_na).all():
                    bad = (~(eq | both_na)).idxmax()
                    print(f"FAIL {name}: col {c} mismatch at row {bad}: oracle={ec[bad]!r} spark={gc[bad]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(e)} rows)")
        return ok

    for name, sql in sorted(oracle.items()):
        # one malformed dump (truncated part-file, mid-write crash) must
        # FAIL that query and keep checking — an unguarded traceback here
        # would zero the whole round's correctness report
        try:
            ok = check_one(name, sql)
        except Exception as e:
            print(f"FAIL {name}: check error: {e}")
            ok = False
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    # queries with no oracle: rows-only
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
