#!/usr/bin/env python3
"""Chunked exact-kNN oracle for the quadratic similarity gates at
LARGE scale factors.

At sf0.01/sf0.1 `compare_oracle.py` runs the committed oracle SQL
directly. At sf1 (20k vectors) the single-query form materializes the
full 4e8-pair stream inside DuckDB's window sort and needs >80 GB of
spill — the exact asymmetry the Spark side avoids via WindowGroupLimit
(per-task truncation to k before any exchange). This runner computes
the SAME oracle in a-side chunks: row_number partitions by a.vec_id,
so restricting the probe side per chunk is result-identical while
bounding the sort to chunk_size x N pairs. Same engine, same SQL
semantics, bounded memory — the standard "shard the ground-truth
computation" move for verifying an ANN system at scale.

Usage: knn_oracle_chunked.py <sfDir> <verifyOutDir> <name> [chunk]
  name in {sim4_knn_join, sim5_knn_blocked, sim6_knn_capped}
"""
import sys, glob, os
import duckdb
from decimal import Decimal

ED = "ed AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
CL = """seeds AS (SELECT vec_id AS c, v AS cv FROM ed WHERE vec_id < 20),
cl AS (
  SELECT e.vec_id,
    list_transform(list_zip(s.cv, e.v), p -> p[1] + 0.15 * p[2]) AS v
  FROM ed e JOIN seeds s ON e.vec_id % 20 = s.c)"""

BASE_OF = {"sim4_knn_join": ("ed", f"WITH {ED}"),
           "sim5_knn_blocked": ("cl", f"WITH {ED},\n{CL}"),
           "sim6_knn_capped": ("cl", f"WITH {ED},\n{CL}")}

def chunk_sql(name, i, n_chunks, k=5):
    # a-side restricted by vec_id MODULUS (ScaleUp's replica key
    # offsets make the id space sparse, so range chunking would not
    # balance); row_number partitions by a.vec_id, so any a-side
    # restriction is result-identical on the covered partitions.
    tbl, cte = BASE_OF[name]
    return f"""{cte}
SELECT a_id, CAST(rnk AS BIGINT) AS rnk, b_id, round(cos_sim, 4) AS cos_sim
FROM (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
    list_dot_product(a.v, b.v) /
    (sqrt(list_dot_product(a.v, a.v)) *
     sqrt(list_dot_product(b.v, b.v))) AS cos_sim,
    row_number() OVER (
      PARTITION BY a.vec_id
      ORDER BY list_dot_product(a.v, b.v) /
    (sqrt(list_dot_product(a.v, a.v)) *
     sqrt(list_dot_product(b.v, b.v))) DESC,
        b.vec_id) AS rnk
  FROM {tbl} a, {tbl} b
  WHERE a.vec_id <> b.vec_id
    AND a.vec_id % {n_chunks} = {i})
WHERE rnk <= {k}"""

def norm(v):
    if isinstance(v, Decimal):
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

def drift_guard(out_dir, name):
    """This tool re-derives the oracle SQL (it must inject the chunk
    predicate, so it cannot run oracle_sql.json verbatim). Guard
    against silent drift from the Scala-owned oracle: the committed
    oracle text must contain the load-bearing fragments of our
    template (fixture constants, cosine expression, tie-break). A
    mismatch means Similarity.scala changed and this template must be
    updated — fail LOUDLY instead of validating a stale contract."""
    import json
    path = os.path.join(out_dir, "oracle_sql.json")
    committed = json.load(open(path)).get(name)
    if committed is None:
        sys.exit(f"DRIFT {name}: not present in {path}")
    frags = ["list_dot_product(a.v, b.v)", "row_number() OVER",
             "PARTITION BY a.vec_id", "b.vec_id) AS rnk",
             "WHERE rnk <= 5", "round(cos_sim, 4)"]
    if BASE_OF[name][0] == "cl":
        frags += ["vec_id < 20", "0.15 * p[2]", "e.vec_id % 20 = s.c"]
    missing = [f for f in frags if f not in committed]
    if missing:
        sys.exit(f"DRIFT {name}: committed oracle no longer contains "
                 f"{missing} — update knn_oracle_chunked.py's template "
                 f"to match Similarity.scala before trusting it")

def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    n_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    drift_guard(out_dir, name)
    if name == "sim6_knn_capped":
        print("NOTE sim6_knn_capped: at large SF the per-bucket cap "
              "ENGAGES and this exact oracle legitimately diverges "
              "(near-tie slots only; see SCALE.md) — a value mismatch "
              "here exits 3 (engaged-regime divergence), NOT 1, so an "
              "automated caller can tell it from a real regression",
              flush=True)
    con = duckdb.connect()
    p = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    orows = []
    ocols = None
    for i in range(n_chunks):
        res = con.execute(chunk_sql(name, i, n_chunks))
        ocols = [d[0] for d in res.description]
        part = res.fetchall()
        orows.extend(part)
        print(f"  chunk {i + 1}/{n_chunks}: {len(part)} rows "
              f"(total {len(orows)})", flush=True)
    sres = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    scols = [d[0] for d in sres.description]
    srows = sres.fetchall()
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: cols {sorted(scols)} vs {sorted(ocols)}")
        sys.exit(1)
    if len(srows) != len(orows):
        print(f"FAIL {name}: rows {len(srows)} vs {len(orows)}")
        sys.exit(1)
    _, sc = canon(scols, srows)
    _, oc = canon(ocols, orows)
    if sc != oc:
        bad = sum(1 for a, b in zip(sc, oc) if a != b)
        print(f"FAIL {name}: value mismatch on {bad} of {len(sc)} rows")
        for a, b in list(zip(sc, oc))[:5]:
            if a != b:
                print(f"  spark={a} oracle={b}")
        # Near-tie audit (SCALE.md's engaged-cap contract): join the
        # two results on the (a_id, rnk) SLOT key and measure the
        # cosine each differing slot trades — oracle_cos - spark_cos.
        # The claim worth pinning in an artifact is "near-ties only":
        # max gap small, avg tiny, all gaps >= 0 (the cap may only
        # DEMOTE to a slightly-worse partner, never invent a better
        # one). Printed here so the committed log IS the evidence.
        def slot_map(cols, rows):
            ia, ir = cols.index("a_id"), cols.index("rnk")
            ib, ic = cols.index("b_id"), cols.index("cos_sim")
            return {(r[ia], r[ir]): (r[ib], float(r[ic])) for r in rows}
        sm, om = slot_map(scols, srows), slot_map(ocols, orows)
        gaps = []
        for key, (ob, ocos) in om.items():
            sb_, scos = sm.get(key, (None, None))
            if sb_ is not None and sb_ != ob:
                gaps.append(ocos - scos)
        if gaps:
            gaps.sort()
            n = len(gaps)
            buckets = [0.0005, 0.001, 0.002, 0.005, 0.01]
            hist = []
            lo = 0.0
            for hi in buckets:
                c = sum(1 for g in gaps if lo <= g < hi)
                hist.append(f"[{lo:.4f},{hi:.4f}): {c}")
                lo = hi
            hist.append(f"[{lo:.4f},inf): {sum(1 for g in gaps if g >= lo)}")
            print(f"  near-tie histogram over {n} differing slots "
                  f"(gap = oracle_cos - spark_cos):")
            for h in hist:
                print(f"    {h}")
            print(f"  gap max={max(gaps):.6f} avg={sum(gaps)/n:.6f} "
                  f"min={min(gaps):.6f} "
                  f"(negative min would mean the capped result found a "
                  f"BETTER partner than the exact oracle — impossible, "
                  f"i.e. a real bug)")
        # sim6's cap legitimately diverges from the exact oracle once
        # it engages (documented regime, SCALE.md): distinct exit code
        # so callers can separate it from a genuine regression.
        # Structural failures (cols/rows) above still exit 1 — the
        # engaged cap changes VALUES in near-tie slots, never the
        # result shape.
        sys.exit(3 if name == "sim6_knn_capped" else 1)
    print(f"PASS {name} ({len(sc)} rows, chunked exact oracle)")

if __name__ == "__main__":
    main()
