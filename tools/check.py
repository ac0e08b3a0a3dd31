#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare row counts + value hashes
(columns sorted by name, rows sorted by all columns, values normalized)."""
import sys, json, glob, hashlib
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    except Exception:
        pass

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if v != v: return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool): return str(int(v))
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (bytes, bytearray)): return v.hex()
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

fails = 0
for name in sorted(oracle):
    pq = f"{outdir}/{name}"
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}"); fails += 1; continue
    try:
        exp = con.execute(oracle[name])
        ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}"); fails += 1; continue
    if len(grows) != len(erows):
        print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}"); fails += 1; continue
    gh, eh = table_hash(gcols, grows), table_hash(ecols, erows)
    if gh != eh:
        print(f"FAIL {name}: hash mismatch ({len(grows)} rows)")
        order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
        order_e = sorted(range(len(ecols)), key=lambda i: ecols[i])
        gl = sorted("|".join(norm(r[i]) for i in order_g) for r in grows)
        el = sorted("|".join(norm(r[i]) for i in order_e) for r in erows)
        shown = 0
        for a, b in zip(gl, el):
            if a != b:
                print(f"  spark : {a[:300]}")
                print(f"  oracle: {b[:300]}")
                shown += 1
                if shown >= 3: break
        fails += 1
    else:
        print(f"OK   {name} ({len(grows)} rows)")
sys.exit(1 if fails else 0)
