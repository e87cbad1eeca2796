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
import json, sys, glob, os
from decimal import Decimal

# sim6's engaged-cap contract (r14 verdict #1: ASSERTED, not printed).
# The per-bucket cap may only DEMOTE a slot to a slightly-worse
# partner, never invent a better one and never change the score of an
# unchanged partner. The bounds are COMMITTED DATA (r14 verdict #8) —
# tools/sweep_contracts.json is the single source, pinned by
# ToolsContractSpec, so a sweep cannot silently loosen them; a missing
# or malformed file fails loudly rather than falling back to defaults.
_CONTRACTS = json.load(open(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sweep_contracts.json")))
GAP_MIN = float(_CONTRACTS["sim6_knn_capped"]["gap_min"])
GAP_MAX = float(_CONTRACTS["sim6_knn_capped"]["gap_max"])


def slot_contract(sm, om):
    """Assert the engaged-cap divergence contract between the spark
    slot map and the oracle slot map (each {(a_id, rnk): (b_id, cos)}).
    Returns (ok, contract_dict); `contract_dict` is serialized into the
    sweep artifact either way, so a FAIL carries its evidence too."""
    contract = {"gap_min_bound": GAP_MIN, "gap_max_bound": GAP_MAX}
    violations = []
    if set(sm.keys()) != set(om.keys()):
        violations.append(
            f"slot-shape mismatch: {len(sm)} spark vs {len(om)} oracle "
            f"slots, {len(set(sm) ^ set(om))} differing keys")
        contract["shape_equal"] = False
    else:
        contract["shape_equal"] = True
    gaps = []
    same_partner_cos_mismatch = 0
    for key, (ob, ocos) in om.items():
        got = sm.get(key)
        if got is None:
            continue
        sb, scos = got
        if sb != ob:
            gaps.append(ocos - scos)
        elif scos != ocos:
            # same partner, different score: a scoring bug, not a
            # legitimate cap demotion
            same_partner_cos_mismatch += 1
    contract["n_slots"] = len(om)
    contract["n_differing_slots"] = len(gaps)
    contract["same_partner_cos_mismatch"] = same_partner_cos_mismatch
    if same_partner_cos_mismatch:
        violations.append(
            f"{same_partner_cos_mismatch} slots kept the oracle's "
            "partner but changed its cosine")
    if gaps:
        gaps.sort()
        n = len(gaps)
        edges = [0.0005, 0.001, 0.002, 0.005, 0.01]
        hist = {}
        lo = 0.0
        for hi in edges:
            hist[f"[{lo:.4f},{hi:.4f})"] = sum(1 for g in gaps if lo <= g < hi)
            lo = hi
        hist[f"[{lo:.4f},inf)"] = sum(1 for g in gaps if g >= lo)
        contract["gap_histogram"] = hist
        contract["gap_max"] = max(gaps)
        contract["gap_avg"] = sum(gaps) / n
        contract["gap_min"] = min(gaps)
        if min(gaps) < GAP_MIN:
            violations.append(
                f"negative gap {min(gaps):.6f}: the capped result found "
                "a BETTER partner than the exact oracle — impossible, "
                "i.e. a real bug")
        if max(gaps) > GAP_MAX:
            violations.append(
                f"gap max {max(gaps):.6f} exceeds the declared near-tie "
                f"ceiling {GAP_MAX} — not an engaged-cap demotion")
    contract["violations"] = violations
    return (not violations, contract)


def selftest():
    """Feed synthetic slot maps through the contract classifier and
    verify it accepts exactly the legitimate engaged-cap shape —
    including the negative-gap case the r14 sweep would have recorded
    as pass. Exit 0 iff the classifier behaves."""
    oracle = {(1, 1): (10, 0.95), (1, 2): (11, 0.90), (2, 1): (12, 0.80)}
    cases = [
        # (name, spark_map, want_ok)
        ("identical", dict(oracle), True),
        ("legit demotion", {**oracle, (1, 2): (99, 0.8990)}, True),
        ("negative gap (capped BETTER than exact = bug)",
         {**oracle, (1, 2): (99, 0.92)}, False),
        ("gap over ceiling",
         {**oracle, (1, 2): (99, 0.60)}, False),
        ("same partner, changed cosine",
         {**oracle, (1, 2): (11, 0.89)}, False),
        ("shape mismatch", {(1, 1): (10, 0.95)}, False),
    ]
    bad = 0
    for name, sm, want in cases:
        ok, contract = slot_contract(sm, oracle)
        status = "ok" if ok == want else "MISCLASSIFIED"
        if ok != want:
            bad += 1
        print(f"  selftest [{status}] {name}: ok={ok} want={want} "
              f"violations={contract['violations']}")
    print(f"SELFTEST {'PASS' if bad == 0 else f'FAIL ({bad} misclassified)'}")
    sys.exit(0 if bad == 0 else 1)

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

def budgeted_connect():
    """A DuckDB connection with an explicit DISK BUDGET (r17 verdict
    #4: an unbounded oracle spill filled local disk past 78 GB and
    killed a concurrently-running timed main). The spill goes to a
    dedicated temp dir and is CAPPED — exceeding the budget fails THIS
    oracle with a clean out-of-temp error instead of taking the box's
    root filesystem (and everything sharing it) down. Knobs:
    GRAFT_ORACLE_TMP (default /tmp/graft_oracle_tmp),
    GRAFT_ORACLE_MAX_TEMP (default 32GiB),
    GRAFT_ORACLE_MEM (default 16GB)."""
    import duckdb
    tmp = os.environ.get("GRAFT_ORACLE_TMP", "/tmp/graft_oracle_tmp")
    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("GRAFT_ORACLE_MAX_TEMP", "32GiB"))
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_ORACLE_MEM", "16GB"))
    return con


def main():
    sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    n_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    # SAMPLED-PROBE mode (sf10 spot-certification): process only the
    # first `sample_chunks` of the a-side chunks and grade the Spark
    # rows of those same probes. row_number partitions by a.vec_id,
    # so any a-side restriction is result-identical on the covered
    # partitions — the contract is asserted on a uniform probe sample
    # instead of all n probes (at sf10 the full exact oracle is ~4e10
    # pairs; a sampled one is the standard way to verify an ANN system
    # whose ground truth is too big to recompute in full).
    sample_chunks = int(sys.argv[5]) if len(sys.argv) > 5 else n_chunks
    drift_guard(out_dir, name)
    if name == "sim6_knn_capped":
        print("NOTE sim6_knn_capped: at large SF the per-bucket cap "
              "ENGAGES and this exact oracle legitimately diverges "
              "(near-tie slots only; see SCALE.md) — a value mismatch "
              "here exits 3 (engaged-regime divergence), NOT 1, so an "
              "automated caller can tell it from a real regression",
              flush=True)
    con = budgeted_connect()
    p = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{p}')")
    orows = []
    ocols = None
    for i in range(sample_chunks):
        res = con.execute(chunk_sql(name, i, n_chunks))
        ocols = [d[0] for d in res.description]
        part = res.fetchall()
        orows.extend(part)
        print(f"  chunk {i + 1}/{sample_chunks} (of {n_chunks}): "
              f"{len(part)} rows (total {len(orows)})", flush=True)
    spark_filter = ""
    if sample_chunks < n_chunks:
        print(f"NOTE sampled-probe mode: grading a_id % {n_chunks} < "
              f"{sample_chunks} (a uniform {sample_chunks}/{n_chunks} "
              "probe sample; result-identical on covered partitions)",
              flush=True)
        spark_filter = f" WHERE a_id % {n_chunks} < {sample_chunks}"
    sres = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        + spark_filter)
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
        if name != "sim6_knn_capped":
            sys.exit(1)
        # sim6's cap legitimately diverges from the exact oracle once
        # it engages (documented regime, SCALE.md) — but ONLY within
        # the near-tie demotion contract, which is ASSERTED here
        # (r14 verdict #1: the histogram used to be printed and then
        # any mismatch exited 3 regardless, so a negative gap — the
        # capped result "beating" the exact oracle, a real bug — or a
        # 0.2-magnitude gap was still recorded as pass). Contract
        # holds -> exit 3 (engaged-regime divergence, callers record
        # pass + the contract JSON); any violation -> exit 1 like a
        # genuine regression. Structural failures (cols/rows) above
        # always exit 1 — the cap changes VALUES in near-tie slots,
        # never the result shape.
        def slot_map(cols, rows):
            ia, ir = cols.index("a_id"), cols.index("rnk")
            ib, ic = cols.index("b_id"), cols.index("cos_sim")
            return {(r[ia], r[ir]): (r[ib], float(r[ic])) for r in rows}
        ok, contract = slot_contract(slot_map(scols, srows),
                                     slot_map(ocols, orows))
        contract["n_mismatch_rows_positional"] = bad
        print(f"CONTRACT {json.dumps(contract, sort_keys=True)}")
        if not ok:
            print(f"FAIL {name}: engaged-cap contract VIOLATED: "
                  f"{'; '.join(contract['violations'])}")
            sys.exit(1)
        print(f"DIVERGED-OK {name}: {contract['n_differing_slots']} "
              f"near-tie slots, gap max={contract['gap_max']:.6f} "
              f"avg={contract['gap_avg']:.6f} min={contract['gap_min']:.6f} "
              f"— engaged-cap demotion contract asserted")
        sys.exit(3)
    print(f"PASS {name} ({len(sc)} rows, chunked exact oracle)")

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    main()
