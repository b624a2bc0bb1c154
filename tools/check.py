#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads Verify output (outDir/<name>/ parquet + outDir/oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf dir, and compares
(sorted columns-by-name, sorted rows, exact values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    return con, oracle

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def df_key(cols, types, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    sorted_types = [str(types[i]) for i in order]
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return sorted_cols, sorted_types, out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con, oracle = load(sf_dir, out_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            g_cols, g_types, g_rows = df_key(got.columns, got.types, got.fetchall())
            exp = con.sql(sql)
            e_cols, e_types, e_rows = df_key(exp.columns, exp.types, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: error {e}"); n_fail += 1; continue
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} != {e_cols}"); n_fail += 1; continue
        # The driver's hasher is type-sensitive: a HUGEINT oracle column
        # (DuckDB widens SUM(BIGINT) / window sums) mismatches Spark's
        # BIGINT even when every value is equal. Compare typed.
        if g_types != e_types:
            diff = [(c, gt, et) for c, gt, et in zip(g_cols, g_types, e_types) if gt != et]
            print(f"FAIL {name}: column types differ {diff}"); n_fail += 1; continue
        if len(g_rows) != len(e_rows):
            print(f"FAIL {name}: rowcount {len(g_rows)} != {len(e_rows)}"); n_fail += 1; continue
        if g_rows != e_rows:
            bad = next(i for i,(a,b) in enumerate(zip(g_rows,e_rows)) if a!=b)
            print(f"FAIL {name}: first mismatch row {bad}:\n  spark={g_rows[bad]}\n  duck ={e_rows[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(g_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
