#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential check.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet dir, executes oracle_sql.json[name] in
DuckDB over the same sf tables, then compares row counts, schemas
(column names sorted), and a hash of all values with columns sorted by
name and rows sorted canonically.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(val):
    import decimal, datetime
    if val is None: return "NULL"
    if isinstance(val, float): return repr(round(val, 9))
    # Deliberately NOT normalized: the driver's canonicalization of
    # DECIMAL/HUGEINT values differs from DuckDB's textual form, so any
    # Decimal reaching an output schema must FAIL locally too (round-1
    # lesson: normalize() here hid 7 driver hash mismatches). Queries must
    # emit bigint/strings/rounded doubles instead.
    if isinstance(val, decimal.Decimal): return "DECIMAL:" + str(val)
    if isinstance(val, (datetime.datetime, datetime.date)): return val.isoformat()
    if isinstance(val, list): return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        tbl = ds.dataset(d, format="parquet").to_table()
        cols = tbl.column_names
        rows = [tuple(r[c] for c in cols) for r in tbl.to_pylist()]
        if name not in oracle:
            print(f"  {name}: rows={len(rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracle[name])
            ocols = [dd[0] for dd in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        ok_rows = len(rows) == len(orows)
        ok_schema = sorted(cols) == sorted(ocols)
        ok_hash = ok_schema and table_hash(cols, rows) == table_hash(ocols, orows)
        if ok_rows and ok_schema and ok_hash:
            print(f"✓ {name}: rows={len(rows)}"); n_pass += 1
        else:
            print(f"✗ {name}: rows {len(rows)} vs {len(orows)}, schema {sorted(cols)} vs {sorted(ocols)}, hash_ok={ok_hash}")
            n_fail += 1
            if ok_schema and ok_rows:
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                a = sorted("|".join(canon(r[i]) for i in order) for r in rows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                b = sorted("|".join(canon(r[i]) for i in oorder) for r in orows)
                for x, y in zip(a, b):
                    if x != y:
                        print(f"    spark:  {x[:200]}\n    duckdb: {y[:200]}"); break
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
