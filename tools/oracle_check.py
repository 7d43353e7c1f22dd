#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
  where <verifyOutDir> was produced by `runMain graft.Verify <sfDir> <dir>`.

For every query in oracle_sql.json: register the sf tables as DuckDB views,
run the oracle SQL, load the Spark parquet result, and compare row counts,
column names, and sorted cell values (exact; floats via bit pattern after
round-trip through float64). Prints one PASS/FAIL line per query.
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    def key(r):
        return tuple((str(type(v)), str(v)) for v in r)
    return sorted([tuple(r) for r in rows], key=key)

def eq_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "documents", "events",
              "embeddings", "part", "supplier", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            got_rel = duckdb.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            got = got_rel.fetchall()
            gcols = got_rel.columns
            ok = True
            why = ""
            if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
                ok, why = False, f"cols {gcols} vs {wcols}"
            elif len(got) != len(want):
                ok, why = False, f"rows {len(got)} vs {len(want)}"
            else:
                gs, ws = canon(got, gcols), canon(want, wcols)
                for i, (gr, wr) in enumerate(zip(gs, ws)):
                    if not all(eq_cell(a, b) for a, b in zip(gr, wr)):
                        ok, why = False, f"row {i}: {gr} vs {wr}"
                        break
            if ok:
                n_pass += 1
                print(f"PASS {name} ({len(got)} rows)")
            else:
                n_fail += 1
                print(f"FAIL {name}: {why[:300]}")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: EXC {str(e)[:300]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
