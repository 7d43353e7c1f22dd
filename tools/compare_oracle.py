#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare: for each query with
oracle SQL, run the SQL on the sf parquet tables and compare to the Spark
result parquet (columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, hashlib
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # full precision
    return str(v)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}")
            fail += 1
            continue
        sq = con.execute(f"SELECT * FROM read_parquet({spark_files!r})")
        scols = [d[0] for d in sq.description]
        srows = sq.fetchall()
        try:
            dq = con.execute(sql)
            dcols = [d[0] for d in dq.description]
            drows = dq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            fail += 1
            continue
        hs, hd = table_hash(srows, scols), table_hash(drows, dcols)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
            # show first differing line
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(norm(r[i]) for i in order_d) for r in drows)
            for a, b in zip(ls, ld):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            fail += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
