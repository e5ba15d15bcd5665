#!/usr/bin/env python3
"""Suite-wide sf10 correctness (VERDICT r16 task 1): produce a
CORRECTNESS_sf10.json with one row PER QUERY, none reading "it
finished".

Per query with an oracle_sql.json entry, a SUBPROCESS runs the oracle
in DuckDB (memory_limit + temp_directory pinned so one runaway CTE
cannot take the box down — the r15/r16 lesson) and exact-compares the
Verify parquet dump, with a wall-clock timeout enforced by the parent.
Outcomes:
  pass            - full oracle hash-green at sf10
  fail            - real mismatch (investigate!)
  oracle_wall     - DuckDB hit the timeout / resource cap; the query is
                    then expected to carry a sampled/collapsed twin in
                    check_sf10.py (q204/q225/q129/q238 precedents) or a
                    documented reason
  spark_error     - Verify recorded an execution error (errors.json)
  no_output       - no parquet dump present
Special paths: q123 has no DuckDB-expressible oracle on the perturbed
replica corpus; it is recomputed with CPython zlib (full content
check). Queries with no oracle at all take the driver's rows-only
check, labeled rows_only.

Usage:
  check_suite_sf10.py <sfDir> <verifyOutDir> <jsonOut>
      [--timeout SEC] [--mem GB] [--only substr,substr]
  check_suite_sf10.py --one <name> <sfDir> <verifyOutDir>   (internal)
"""
import sys, os, json, glob, subprocess, time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def connect(sf_dir, mem_gb):
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    os.makedirs("/tmp/duck_sf10_tmp", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_sf10_tmp'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        out[c] = s
    return pd.DataFrame(out)


def compare_one(name, sf_dir, out_dir, mem_gb):
    """Exit code: 0 pass, 1 fail (prints reason)."""
    import pandas as pd
    if name == "q123_compression_ratio":
        import zlib
        got = pd.read_parquet(f"{out_dir}/{name}").sort_values("source").reset_index(drop=True)
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        docs["raw"] = docs["text"].str.len().astype("int64")
        docs["comp"] = docs["text"].map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))).astype("int64")
        docs["hi"] = (docs["comp"] * 3 < docs["raw"]).astype("int64")
        want = (docs.groupby("source")
                .agg(n_docs=("text", "size"), sum_raw=("raw", "sum"),
                     sum_deflated=("comp", "sum"), n_high_redundancy=("hi", "sum"))
                .reset_index().sort_values("source").reset_index(drop=True))
        cols = ["source", "n_docs", "sum_raw", "sum_deflated", "n_high_redundancy"]
        if got[cols].astype(str).equals(want[cols].astype(str)):
            print(f"PASS {name} (zlib content check, {len(got)} rows)")
            return 0
        print(f"FAIL {name}: zlib recompute mismatch")
        return 1
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracle[name]
    con = connect(sf_dir, mem_gb)
    want = canon(con.execute(sql).fetchdf())
    got = canon(pd.read_parquet(f"{out_dir}/{name}"))
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        return 1
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        return 1
    sk = list(got.columns)
    got = got.sort_values(sk, kind="mergesort").reset_index(drop=True)
    want = want.sort_values(sk, kind="mergesort").reset_index(drop=True)
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            import numpy as np
            if not np.allclose(g.astype(float), w.astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True):
                print(f"FAIL {name}: float col {c}")
                return 1
        elif not g.astype(str).equals(w.astype(str)):
            print(f"FAIL {name}: col {c}")
            return 1
    print(f"PASS {name} ({len(got)} rows)")
    return 0


def main():
    if sys.argv[1] == "--one":
        name, sf_dir, out_dir = sys.argv[2], sys.argv[3], sys.argv[4]
        mem_gb = int(sys.argv[5]) if len(sys.argv) > 5 else 24
        sys.exit(compare_one(name, sf_dir, out_dir, mem_gb))

    sf_dir, out_dir, json_out = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = 900
    mem_gb = 24
    only = None
    args = sys.argv[4:]
    while args:
        a = args.pop(0)
        if a == "--timeout": timeout = int(args.pop(0))
        elif a == "--mem": mem_gb = int(args.pop(0))
        elif a == "--only": only = args.pop(0).split(",")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    errs = {}
    if os.path.exists(f"{out_dir}/errors.json"):
        errs = json.load(open(f"{out_dir}/errors.json"))
    results = {}
    if os.path.exists(json_out):
        results = json.load(open(json_out))  # resume support
    names = sorted(set(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/q*") if os.path.isdir(p))
        | set(oracle) | set(errs))
    for name in names:
        if only and not any(s in name for s in only):
            continue
        if name in results and results[name].get("status") in ("pass", "rows_only"):
            continue
        if name in errs:
            results[name] = {"status": "spark_error", "err": errs[name]}
        elif not glob.glob(f"{out_dir}/{name}/*.parquet"):
            results[name] = {"status": "no_output"}
        elif name not in oracle and name != "q123_compression_ratio":
            import pandas as pd
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            results[name] = {"status": "rows_only" if n > 0 else "fail", "rows": n}
        else:
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "--one", name, sf_dir, out_dir, str(mem_gb)],
                    capture_output=True, text=True, timeout=timeout)
                out = (p.stdout + p.stderr).strip()
                status = ("pass" if p.returncode == 0 else
                          "oracle_wall" if ("OutOfMemory" in out or "No space" in out
                                            or "disk" in out.lower()) else "fail")
                results[name] = {"status": status, "sec": round(time.time() - t0, 1),
                                 "detail": out.splitlines()[-1] if out else ""}
            except subprocess.TimeoutExpired:
                results[name] = {"status": "oracle_wall",
                                 "sec": timeout, "detail": f"timeout {timeout}s"}
        print(name, results[name]["status"], flush=True)
        json.dump(results, open(json_out, "w"), indent=1)
    counts = {}
    for v in results.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    print("SUMMARY", counts)


if __name__ == "__main__":
    main()
