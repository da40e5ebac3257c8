#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Mimics the driver: for each query dir in verify_out, load the Spark
parquet result and run the oracle SQL from oracle_sql.json in DuckDB
(tables = parquet files in sf_dir), sort columns by name, sort rows,
and compare schema + values exactly.
"""
import json, sys, glob
import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q_*")):
        name = qdir.split("/")[-1]
        sp = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        sp_cols, sp_rows = canon(sp.fetchall(), [d[0] for d in sp.description])
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows={len(sp_rows)})")
            continue
        try:
            du = con.sql(oracle[name])
            du_cols, du_rows = canon(du.fetchall(), [d[0] for d in du.description])
        except Exception as e:
            print(f"  X {name}: oracle SQL failed: {e}")
            n_fail += 1
            continue
        if sp_cols != du_cols:
            print(f"  X {name}: columns differ spark={sp_cols} duck={du_cols}")
            n_fail += 1
            continue
        if len(sp_rows) != len(du_rows):
            print(f"  X {name}: rowcount spark={len(sp_rows)} duck={len(du_rows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sp_rows, du_rows) if a != b]
        if bad:
            print(f"  X {name}: {len(bad)}/{len(sp_rows)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
            continue
        # order-sensitive re-check: every query ORDERs BY a unique key,
        # so the raw (unsorted) row sequences must also match — guards
        # against a driver compare that hashes in row order.
        sp_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        sp_cols_orig = [d[0] for d in sp_rel.description]
        sp2 = sp_rel.fetchall()
        du_rel = con.sql(oracle[name])
        du_order = {c: i for i, c in enumerate(d[0] for d in du_rel.description)}
        proj = [du_order[c] for c in sp_cols_orig]
        du2_proj = [tuple(r[i] for i in proj) for r in du_rel.fetchall()]
        mismatch = next((i for i, (a, b) in enumerate(zip(sp2, du2_proj)) if tuple(a) != b), None)
        if mismatch is not None:
            print(f"  X {name}: ROW-ORDER mismatch at row {mismatch}: spark={sp2[mismatch]} duck={du2_proj[mismatch]}")
            n_fail += 1
        else:
            print(f"  ok {name} ({len(sp_rows)} rows, ordered)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
