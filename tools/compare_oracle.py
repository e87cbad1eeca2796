#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over the sfDir tables,
and compares: row count, column-name set, and a hash over the values
with columns sorted by name (rows sorted by their stringified tuple) --
the strictest plausible interpretation of the driver's check.
"""
import sys, json, glob, os
import duckdb
from decimal import Decimal

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, Decimal):
        # Preserve scale: the driver's hash is representation-sensitive
        # (DECIMAL(28,2) vs DECIMAL(38,2) mismatch in r01), so normalize()
        # here would mask real gate failures.
        return str(v)
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional 3rd arg: comma-separated query-name filter (the sf1
    # sweep runs one query per subprocess so a heavy oracle can be
    # timed out without losing the rest of the sweep)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (e.g. scaledata/sf1): directory of parts
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        rdir = f"{out_dir}/{name}"
        files = glob.glob(f"{rdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sres = con.execute(f"SELECT * FROM read_parquet('{rdir}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # Driver-hash risk gate (r02 judge finding): the driver's hash
        # serializes DECIMAL through a representation that drops
        # trailing zeros on one side, so ANY decimal column in a result
        # schema hash-fails even with bit-identical values. Flag it as
        # a hard FAIL here so the class of failure can't recur silently.
        dec_cols = [d[0] for d in sres.description
                    if "DECIMAL" in str(d[1]).upper()]
        if dec_cols:
            print(f"FAIL {name}: DECIMAL output columns {dec_cols} — "
                  f"driver-hash risk; cast final outputs to DOUBLE/BIGINT")
            n_fail += 1
            continue
        # softer warning: NULL values in a result risk a different
        # serializer round-trip on the driver side (nullable ints
        # through pandas become float64). Not a proven failure like
        # DECIMAL, so warn only.
        if any(v is None for r in srows for v in r):
            print(f"WARN {name}: result contains NULLs — "
                  f"driver-hash serializer risk (nullable int -> float)")
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: cols {sc} vs {oc}"); n_fail += 1; continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}"); n_fail += 1; continue
        if sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs {diff}"); n_fail += 1; continue
        print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
