#!/usr/bin/env python3
"""Build an N-times replica of a driver testdata scale-factor dir, for
local scale smokes (VERDICT r10 task 7: validate capBuckets economics and
the heavy-query spread at ~10x bench scale before the driver does).

Replication is key-shifted, distribution-preserving:
  - every key column gets `+ i * OFF` in replica i (joins stay 1:1 with the
    original fan-out: each replica is a disjoint, referentially-intact copy);
  - region/nation stay as-is (true dimensions -- TPC-H holds them constant
    across SF too);
  - documents.text is perturbed per replica (a marker token spliced after
    every 5th word) so cross-replica shingle Jaccard lands ~0.2-0.4: BELOW
    q41's 0.5 dup bar but INSIDE the LSH/fuzzy candidate range -- the
    worst realistic case for the capped pair joins, which is the point;
  - embeddings get a small per-replica shift so ANN/SemDeDup sees dense
    near-dup clusters of size N (again: the stress case for bucket caps).

Usage: python3 tools/make_sfN.py <srcDir> <dstDir> [N=10]
"""
import sys, os
import duckdb

def main():
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    OFF = 100_000_000
    rep = f"(SELECT unnest(range({n})) AS i) r"

    # Small row groups on the text/vector tables: a single-row-group file
    # caps every scan at ONE task no matter the cluster (the row group is
    # parquet's atomic split unit), which serializes the explode-heavy
    # stages. 2048 rows ≈ 25 groups at N=10 — enough grain for local[32].
    # (The driver's own testdata ships documents.parquet as one row group;
    # at its 5k-row scale that is irrelevant, at 10x it dominates.)
    rg = {"documents": 2048, "embeddings": 2048}

    def copy(table, select):
        opts = f", ROW_GROUP_SIZE {rg[table]}" if table in rg else ""
        con.execute(
            f"COPY ({select}) TO '{dst}/{table}.parquet' (FORMAT PARQUET{opts})")
        cnt = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {cnt} rows")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

    copy("customer", f"""
      SELECT c_custkey + i*{OFF} AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment
      FROM read_parquet('{src}/customer.parquet'), {rep}""")
    copy("supplier", f"""
      SELECT s_suppkey + i*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
      FROM read_parquet('{src}/supplier.parquet'), {rep}""")
    copy("part", f"""
      SELECT p_partkey + i*{OFF} AS p_partkey, p_name, p_brand, p_type,
             p_size, p_retailprice
      FROM read_parquet('{src}/part.parquet'), {rep}""")
    copy("orders", f"""
      SELECT o_orderkey + i*{OFF} AS o_orderkey, o_custkey + i*{OFF} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet'), {rep}""")
    copy("lineitem", f"""
      SELECT l_orderkey + i*{OFF} AS l_orderkey, l_partkey + i*{OFF} AS l_partkey,
             l_suppkey + i*{OFF} AS l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
             l_shipdate
      FROM read_parquet('{src}/lineitem.parquet'), {rep}""")
    copy("events", f"""
      SELECT event_id + i*{OFF} AS event_id, ts, user_id + i*{OFF} AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet'), {rep}""")
    # marker token after every 5th word; replica 0 byte-identical to source
    copy("documents", f"""
      SELECT doc_id + i*{OFF} AS doc_id,
             CASE WHEN i = 0 THEN text
                  ELSE regexp_replace(text, '((\\S+\\s+){{5}})', '\\1r' || i || 'x ', 'g')
             END AS text,
             lang, source,
             CASE WHEN i = 0 THEN n_chars
                  ELSE length(regexp_replace(text, '((\\S+\\s+){{5}})', '\\1r' || i || 'x ', 'g'))
             END AS n_chars
      FROM read_parquet('{src}/documents.parquet'), {rep}""")
    copy("embeddings", f"""
      SELECT vec_id + i*{OFF} AS vec_id,
             list_transform(embedding, x -> CAST(x + 0.003*i AS FLOAT)) AS embedding,
             label
      FROM read_parquet('{src}/embeddings.parquet'), {rep}""")

if __name__ == "__main__":
    main()
