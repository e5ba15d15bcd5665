#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs DuckDB on each
oracle_sql.json entry against the sf tables, loads the Verify parquet dump,
sorts columns by name, and compares values. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: timestamps -> iso strings, floats kept
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        out[c] = s
    return pd.DataFrame(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.scala records every query that threw during execution here;
    # surface the actual exception instead of a bare "no spark output".
    errs = {}
    if os.path.exists(f"{out_dir}/errors.json"):
        errs = json.load(open(f"{out_dir}/errors.json"))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        sql = oracle[name]
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            why = errs.get(name, "no spark output")
            print(f"FAIL {name}: {why}"); n_fail += 1; fails.append(name); continue
        try:
            got = canon(pd.read_parquet(pq))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; fails.append(name); continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; fails.append(name); continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1; fails.append(name); continue
        diff_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                import numpy as np
                ok = ((a.isna() & b.isna()) | (np.isclose(a, b, rtol=0, atol=1e-9, equal_nan=True))).all()
            else:
                ok = a.astype(str).equals(b.astype(str))
            if not ok:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                m = got[c].astype(str) != want[c].astype(str)
                idx = m[m].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} duck={want[c][i]!r}")
            n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # q123 has no DuckDB oracle (no deflate function), but the whole query
    # is recomputable here: python's zlib and java.util.zip link the same
    # zlib format at the same level (Deflater(6, nowrap=false) ==
    # zlib.compress(b, 6)), so the per-source aggregates must match
    # EXACTLY — a full independent-engine content check, not rows-only.
    # (Caveat from DeflateLen's scaladoc: a zlib library-version skew
    # between the JVM and CPython could legitimately change compressed
    # lengths; if this ever fires with plausible sums, compare zlib
    # versions before suspecting the engine.)
    name = "q123_compression_ratio"
    pq = f"{out_dir}/{name}"
    if glob.glob(f"{pq}/*.parquet"):
        import zlib
        try:
            got = pd.read_parquet(pq).sort_values("source").reset_index(drop=True)
            docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
            docs["raw"] = docs["text"].str.len().astype("int64")
            docs["comp"] = docs["text"].map(
                lambda t: len(zlib.compress(t.encode("utf-8"), 6))).astype("int64")
            docs["hi"] = (docs["comp"] * 3 < docs["raw"]).astype("int64")
            want = (docs.groupby("source")
                    .agg(n_docs=("text", "size"), sum_raw=("raw", "sum"),
                         sum_deflated=("comp", "sum"), n_high_redundancy=("hi", "sum"))
                    .reset_index().sort_values("source").reset_index(drop=True))
            want = want[["source", "n_docs", "sum_raw", "sum_deflated", "n_high_redundancy"]]
            got = got[["source", "n_docs", "sum_raw", "sum_deflated", "n_high_redundancy"]]
            if got.astype(str).equals(want.astype(str)):
                print(f"PASS {name} ({len(got)} rows, python-zlib content check)")
                n_pass += 1
            else:
                bad = [c for c in got.columns if not got[c].astype(str).equals(want[c].astype(str))]
                print(f"FAIL {name}: python-zlib mismatch in {bad}")
                n_fail += 1; fails.append(name)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; fails.append(name)
    # queries without oracle: rows-only check
    for pq in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(pq)
        if name in oracle or name == "q123_compression_ratio" or not os.path.isdir(pq):
            continue
        try:
            n = len(pd.read_parquet(pq))
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        except Exception as e:
            print(f"ROWS {name}: unreadable: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
