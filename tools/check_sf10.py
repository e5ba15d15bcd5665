#!/usr/bin/env python3
"""Independent sf10 correctness checks for the two queries whose FULL
DuckDB oracle hits single-node resource walls at the 100x replica
(SCALE.md r15 smoke: q204_pq_recall ran out of temp disk >54G, and
q225_mutual_nn out of memory — both on the qs x corpus pair CTE). The
engine's output at sf10 was previously unverified beyond "it completed"
(VERDICT r15 "What's missing" #3).

Method (the r15 verdict's prescribed fix): run the SAME oracle SQL
restricted to a deterministic md5 sample of the OUTPUT KEYS, which
turns the oracle's quadratic pair frame linear-in-corpus while checking
every sampled output row exactly (values, not just counts):

 - q204: per-qid rows are independent (per-qid top-5 windows over the
   full coded corpus), so sampling qids post-hoc is sound. The sampled
   oracle is the committed q204 SQL with the qs CTE narrowed to
   md5(qid) % 20 == 0 (~5% of qids); the recon/codebook CTEs still run
   over the FULL corpus, so the PQ assignment and reconstruction are
   verified at full sf10 density.

 - q225: mutual-NN is NOT per-row independent — b's best-a ranges over
   ALL probes — so the sample applies only to the a1/a2 (per-aid) side
   while b1 re-ranks each candidate bid against the FULL probe set.
   For every sampled aid this verifies BOTH directions exactly: the
   row appears iff aid's best bid chose aid back, with exact cosine
   and runner-up margin. Absence is checked too (set compare).

 - q238: the committed naive-theta-join oracle enumerates the overlap
   PAIRS, which the time-densified replica multiplies x10^4 — DuckDB
   would churn ~1e10 pairs. The check instead runs the VALUE-GRAIN
   collapsed form (distinct timestamps with multiplicities) in DuckDB:
   collapsed == naive is hash-proven at sf0.01/sf0.1/sf1 where the
   naive oracle runs, so this compares the two ENGINES' independent
   executions of the proven-equivalent algebra at sf10.

Usage: check_sf10.py <sfDir> <verifyOutDir>   # exit 0 = all green
"""
import sys, os, glob, json, hashlib
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def md5bucket(key: int, m: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % m


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def compare(name, got: pd.DataFrame, want: pd.DataFrame, sort_keys):
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        return False
    got = got.sort_values(sort_keys).reset_index(drop=True)
    want = want.sort_values(sort_keys).reset_index(drop=True)
    if len(got) != len(want):
        print(f"FAIL {name}: {len(got)} rows != oracle {len(want)}")
        return False
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            bad = (g.astype(float) - w.astype(float)).abs() > 1e-9
        elif pd.api.types.is_object_dtype(g) or pd.api.types.is_object_dtype(w):
            bad = g.astype(str) != w.astype(str)
        else:
            bad = g.astype("int64") != w.astype("int64")
        if bad.any():
            i = bad.idxmax()
            print(f"FAIL {name}: col {c} row {i}: {g[i]} != {w[i]}")
            return False
    print(f"PASS {name} ({len(got)} sampled rows)")
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = True

    # ---- q204: inject the qid sample into the committed oracle SQL.
    if not glob.glob(f"{out_dir}/q204_pq_recall"):
        print("SKIP q204 (no dump)")
        q204 = None
    else:
        q204 = oracle["q204_pq_recall"]
    if q204 is not None:
        anchor = "FROM e WHERE vec_id % 100 = 0)"
        assert anchor in q204, "q204 oracle changed; update check_sf10.py anchor"
        sampled = q204.replace(
            anchor,
            "FROM e WHERE vec_id % 100 = 0 AND "
            "('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 20 = 0)")
        want = con.execute(sampled).df()
        got = pd.read_parquet(glob.glob(f"{out_dir}/q204_pq_recall")[0])
        got = got[got["qid"].map(lambda q: md5bucket(int(q), 20) == 0)]
        ok &= compare("q204_pq_recall@sf10 (md5 1/20 qid sample)", got, want, ["qid"])

    # ---- q129: same per-qid independence as q204 (the SQ codes build on
    # the FULL corpus; only the probe set narrows), same md5 qid sample.
    # Its full oracle hit DuckDB's temp-disk wall at sf10 exactly like
    # q204's (the qs x corpus pair CTE).
    if not glob.glob(f"{out_dir}/q129_sq_ann_recall"):
        print("SKIP q129 (no dump)")
    else:
        q129 = oracle["q129_sq_ann_recall"]
        anchor129 = "WHERE e.vec_id % 100 = 0)"
        assert anchor129 in q129, "q129 oracle changed; update check_sf10.py anchor"
        sampled129 = q129.replace(
            anchor129,
            "WHERE e.vec_id % 100 = 0 AND "
            "('0x' || substr(md5(e.vec_id::VARCHAR), 1, 8))::BIGINT % 20 = 0)")
        want = con.execute(sampled129).df()
        got = pd.read_parquet(glob.glob(f"{out_dir}/q129_sq_ann_recall")[0])
        got = got[got["qid"].map(lambda q: md5bucket(int(q), 20) == 0)]
        ok &= compare("q129_sq_ann_recall@sf10 (md5 1/20 qid sample)",
                      got, want, ["qid"])

    # ---- q225: reuse the committed oracle's vector-normalization CTE
    # verbatim (textual split keeps the two in sync), then rebuild the
    # pair frames so only the a-side is sampled while b's argmax ranges
    # over the FULL probe set.
    if not glob.glob(f"{out_dir}/q225_mutual_nn"):
        print("SKIP q225 (no dump)")
        q225 = None
    else:
        q225 = oracle["q225_mutual_nn"]
    if q225 is None:
        sql = None
    else:
        split_at = q225.index("p AS (SELECT")
        n_cte = q225[:split_at].rstrip()          # "WITH n AS (...),"
        assert n_cte.endswith(","), "q225 oracle changed; update check_sf10.py split"
        dot = "list_aggregate(list_transform(list_zip({l}.v, {r}.v), z -> z[1]*z[2]), 'sum')"
        sql = f"""{n_cte}
a AS (SELECT vec_id, v, nrm FROM n WHERE label <= 4 AND vec_id % 10 = 0),
s AS (SELECT * FROM a
  WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT % 25 = 0),
b AS (SELECT vec_id, v, nrm FROM n WHERE label >= 5),
ps AS (SELECT s.vec_id AS aid, b.vec_id AS bid,
   round({dot.format(l='s', r='b')} / (s.nrm * b.nrm), 6) AS cosine
  FROM s CROSS JOIN b),
ra AS (SELECT *, row_number() OVER (PARTITION BY aid
    ORDER BY cosine DESC, bid) AS rn FROM ps),
a1 AS (SELECT aid, bid, cosine FROM ra WHERE rn = 1),
a2 AS (SELECT aid, cosine AS cos2 FROM ra WHERE rn = 2),
cb AS (SELECT DISTINCT bid FROM a1),
pb AS (SELECT a.vec_id AS aid2, b.vec_id AS bid2,
   round({dot.format(l='a', r='b')} / (a.nrm * b.nrm), 6) AS cosine
  FROM a CROSS JOIN b JOIN cb ON cb.bid = b.vec_id),
b1 AS (SELECT bid2, aid2 FROM (
  SELECT *, row_number() OVER (PARTITION BY bid2
     ORDER BY cosine DESC, aid2) AS rn FROM pb) WHERE rn = 1)
SELECT a1.aid, a1.bid, a1.cosine,
 CAST(round((a1.cosine - coalesce(a2.cos2, -1.0)) * 1000000) AS BIGINT)
   AS margin_micro
FROM a1 JOIN b1 ON a1.aid = b1.aid2 AND a1.bid = b1.bid2
LEFT JOIN a2 ON a2.aid = a1.aid
ORDER BY a1.aid"""
    if sql is not None:
        want = con.execute(sql).df()
        got = pd.read_parquet(glob.glob(f"{out_dir}/q225_mutual_nn")[0])
        got = got[got["aid"].map(lambda a: md5bucket(int(a), 25) == 0)]
        ok &= compare("q225_mutual_nn@sf10 (md5 1/25 probe sample, full-b argmax)",
                      got, want, ["aid"])

    # ---- q238: the value-grain collapsed form (== naive, hash-proven at
    # three smaller SFs) runs the theta join at distinct-timestamp grain.
    if glob.glob(f"{out_dir}/q238_interval_overlap_join"):
        q238 = """WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
sp AS (SELECT us AS ss, CAST(count(*) AS BIGINT) AS ms, us + 600000000 AS se
  FROM ev WHERE event_type IN ('view', 'click') GROUP BY 1, 3),
inc AS (SELECT us AS i_s, CAST(count(*) AS BIGINT) AS mi, us + 1800000000 AS ie
  FROM ev WHERE event_type = 'error' GROUP BY 1, 3),
pairs AS (SELECT i_s, mi, ms, least(se, ie) - greatest(ss, i_s) AS ov_us
  FROM sp JOIN inc ON ss < ie AND i_s < se),
per_inc AS (SELECT i_s, mi, CAST(sum(ms) AS BIGINT) AS n_spans,
  CAST(sum(ms * ov_us) AS BIGINT) AS ov_us FROM pairs GROUP BY 1, 2)
SELECT CAST(CAST(make_timestamp(i_s) AS DATE) AS VARCHAR) AS day,
 CAST(sum(mi) AS BIGINT) AS n_incidents,
 CAST(sum(mi * n_spans) AS BIGINT) AS spans_total,
 CAST(sum(mi * (ov_us // 1000000)) AS BIGINT) AS overlap_seconds,
 CAST(max(n_spans) AS BIGINT) AS max_spans_per_incident
FROM per_inc GROUP BY 1 ORDER BY day"""
        want = con.execute(q238).df()
        got = pd.read_parquet(glob.glob(f"{out_dir}/q238_interval_overlap_join")[0])
        ok &= compare("q238_interval_overlap_join@sf10 (collapsed-form twin)",
                      got, want, ["day"])

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
