#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare row counts + value hashes
(columns sorted by name, rows sorted by all columns, values normalized).

IMPORTANT (round-1 lesson): fetch BOTH sides via .df() (pandas/arrow), the
way the driver does. duckdb fetchall() returns Python ints for HUGEINT and
hides the HUGEINT->float64 normalization that made 8 round-1 queries fail
the real gate ("3" vs "3.0")."""
import sys, json, hashlib
import duckdb
import pandas as pd

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
    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return "NULL" if not isinstance(v, float) else "nan"
    if isinstance(v, float):
        # repr keeps "3.0" distinct from int "3" — the exact round-1 driver
        # divergence (HUGEINT -> float64). Do NOT collapse to %g.
        return repr(float(v))
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def df_lines(df):
    # per-column tolist: df.values would upcast int64 columns to float64
    # whenever any other column is float, corrupting the int-vs-float signal
    cols = sorted(df.columns)
    colvals = [df[c].tolist() for c in cols]
    return sorted("|".join(norm(v) for v in r) for r in zip(*colvals))

def table_hash(lines):
    h = hashlib.sha256()
    for l in lines:
        h.update(l.encode()); h.update(b"\n")
    return h.hexdigest()

fails = 0
for name in sorted(oracle):
    pq = f"{outdir}/{name}"
    try:
        gdf = con.execute(f"SELECT * FROM '{pq}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable: {e}"); fails += 1; continue
    try:
        edf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    if sorted(gdf.columns) != sorted(edf.columns):
        print(f"FAIL {name}: cols spark={sorted(gdf.columns)} oracle={sorted(edf.columns)}"); fails += 1; continue
    if len(gdf) != len(edf):
        print(f"FAIL {name}: rows spark={len(gdf)} oracle={len(edf)}"); fails += 1; continue
    kinds_mismatch = [c for c in gdf.columns
                      if gdf[c].dtype.kind != edf[c].dtype.kind]
    if kinds_mismatch:
        # FAIL, not WARN: pandas renders both SQL NULL and NaN as NaN in
        # float64 columns, and nullable int64 upcasts to float64 on .df() —
        # a dtype-kind divergence can mask an int-vs-float or NULL-vs-NaN
        # difference while the value hashes still agree.
        print(f"FAIL {name}: dtype-kind mismatch on {[(c, str(gdf[c].dtype), str(edf[c].dtype)) for c in kinds_mismatch]}")
        fails += 1
        continue
    gl, el = df_lines(gdf), df_lines(edf)
    if table_hash(gl) != table_hash(el):
        print(f"FAIL {name}: hash mismatch ({len(gdf)} rows)")
        shown = 0
        for a, b in zip(gl, el):
            if a != b:
                print(f"  spark : {a[:300]}")
                print(f"  oracle: {b[:300]}")
                shown += 1
                if shown >= 3: break
        fails += 1
    else:
        print(f"OK   {name} ({len(gdf)} rows)")
sys.exit(1 if fails else 0)
