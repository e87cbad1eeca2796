#!/usr/bin/env python3
"""Full-suite sf1 HASH sweep (r13 verdict #3): every gate's DuckDB
oracle re-run and value-compared at the 10x ScaleUp corpus, one query
per subprocess so a heavy oracle can be timed out without losing the
sweep. The kNN gates route through knn_oracle_chunked.py (the
single-query oracle needs >80 GB of window spill at sf1; the chunked
runner computes the identical result in bounded memory). Exit-code 3
from the chunked runner is sim6's DOCUMENTED engaged-cap divergence
(values in near-tie slots only), recorded as pass with a note.

Usage: sf1_sweep.py <sfDir> <verifyOutDir> <outJson> [timeoutSec]
"""
import json, os, subprocess, sys, time

KNN_CHUNKED = {"sim4_knn_join", "sim5_knn_blocked", "sim6_knn_capped"}

# Contract parameters are COMMITTED DATA (r14 verdict #8):
# tools/sweep_contracts.json is the single source for every
# approximate-path bound this sweep grades against, pinned by
# ToolsContractSpec. A missing/malformed file aborts the sweep —
# no in-script fallback values to drift toward.
_CONTRACTS = json.load(open(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "sweep_contracts.json")))

# dd5_blocked_neardup is the banded-LSH production path graded against
# the EXACT all-pairs oracle; its banding is derived for miss
# probability <= 1e-4 PER qualifying pair AT cosine == tau
# (HyperplaneBands.params(tau, 1e-4)), so once the corpus carries ~1e5
# qualifying pairs (sf1: 95,212) a single-digit number of just-above-tau
# pairs is EXPECTED to slip the bands (Binomial(n, 1e-4): mean ~9.5).
# The r14 sweep measured exactly that regime: 7 misses, every one at
# cos in [0.4017, 0.4282] (tau = 0.4), ZERO false pairs, ZERO value
# mismatches among matched pairs. The structural check below verifies
# the declared contract instead of raw row equality: spark SUBSET of
# oracle, misses <= mean + 5 sigma (25), every missed pair within the
# near-tau band, matched values identical.
DD5_BLOCKED = "dd5_blocked_neardup"
DD5_MAX_MISSES = int(_CONTRACTS[DD5_BLOCKED]["max_misses"])
DD5_MISS_COS_CEIL = float(_CONTRACTS[DD5_BLOCKED]["miss_cos_ceil"])

# sim3_ann_ivf is a DECLARED approximate index with an ADAPTIVE grid
# (r14 verdict #4): cells = max(16, ceil(sqrt(n))), nprobe =
# min(cells, max(12, ceil(0.75*cells))), both re-derived from count(*)
# and riding in the output columns. The small-SF gates pass
# exact-equality on recall headroom; at sf1 (20k vectors -> 142 cells,
# 107 probed) a true top-10 member can still land in an unprobed cell,
# so the sf1 check grades the ANN contract: recall@10 >= 0.9 (the r15
# bar; the fixed 16-cell grid measured 0.80 in r14), result is exactly
# TopK rows, EVERY returned row a true member of the exact top-50 with
# its exact rounded cosine (no fabricated values, no deep-rank junk),
# and the adaptivity decision columns equal the oracle's re-derivation.
SIM3 = "sim3_ann_ivf"
SIM3_MIN_RECALL = float(_CONTRACTS[SIM3]["min_recall"])
SIM3_TOP_POOL = int(_CONTRACTS[SIM3]["top_pool"])


def sim3_check(sf_dir, out_dir):
    import duckdb, os
    con = duckdb.connect()
    p = f"{sf_dir}/embeddings.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{src}')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[SIM3]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    exact10 = [dict(zip(ocols, r)) for r in res.fetchall()]
    # widen the exact pool to top-50: same SQL, raised LIMIT
    import re
    sql50 = re.sub(r"LIMIT \d+\s*$", f"LIMIT {SIM3_TOP_POOL}", sql.strip())
    pres = con.execute(sql50)
    pcols = [d[0] for d in pres.description]
    pool = {row[pcols.index("vec_id")]: row[pcols.index("cos_sim")]
            for row in pres.fetchall()}
    sres = con.execute("SELECT * FROM "
                       f"read_parquet('{out_dir}/{SIM3}/*.parquet')")
    scols = [d[0] for d in sres.description]
    spark = [dict(zip(scols, r)) for r in sres.fetchall()]
    k = len(exact10)
    oids = {r["vec_id"] for r in exact10}
    sids = [r["vec_id"] for r in spark]
    recall = len(oids & set(sids)) / k if k else 0.0
    shape_ok = len(spark) == k and len(set(sids)) == k
    member_ok = all(r["vec_id"] in pool and
                    float(pool[r["vec_id"]]) == float(r["cos_sim"])
                    for r in spark)
    plan_ok = bool(exact10) and all(
        r.get("cells") == exact10[0]["cells"] and
        r.get("nprobe") == exact10[0]["nprobe"] for r in spark)
    ok = shape_ok and member_ok and plan_ok and recall >= SIM3_MIN_RECALL
    detail = (f"ANN contract: recall@{k}={recall:.2f} "
              f"(floor {SIM3_MIN_RECALL}), rows={len(spark)}/{k}, "
              f"all returned ids in exact top-{SIM3_TOP_POOL} with exact "
              f"cosines={member_ok}, adaptive plan "
              f"(cells={exact10[0]['cells'] if exact10 else '?'}, "
              f"nprobe={exact10[0]['nprobe'] if exact10 else '?'}) "
              f"matches={plan_ok}")
    return ok, detail


def dd5_blocked_check(sf_dir, out_dir):
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
                if __import__("os").path.isdir(f"{sf_dir}/embeddings.parquet")
                else "CREATE VIEW embeddings AS SELECT * FROM "
                     f"read_parquet('{sf_dir}/embeddings.parquet')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[DD5_BLOCKED]
    con.execute(f"CREATE TABLE oracle AS {sql}")
    con.execute("CREATE TABLE spark AS SELECT * FROM "
                f"read_parquet('{out_dir}/{DD5_BLOCKED}/*.parquet')")
    fp = con.execute("SELECT count(*) FROM spark s ANTI JOIN oracle o "
                     "ON s.a_id=o.a_id AND s.b_id=o.b_id").fetchone()[0]
    misses = con.execute(
        "SELECT o.cos_sim FROM oracle o ANTI JOIN spark s "
        "ON s.a_id=o.a_id AND s.b_id=o.b_id").fetchall()
    bad_vals = con.execute(
        "SELECT count(*) FROM spark s JOIN oracle o "
        "ON s.a_id=o.a_id AND s.b_id=o.b_id "
        "WHERE s.cos_sim <> o.cos_sim").fetchone()[0]
    n_oracle = con.execute("SELECT count(*) FROM oracle").fetchone()[0]
    ok = (fp == 0 and bad_vals == 0 and len(misses) <= DD5_MAX_MISSES and
          all(float(m[0]) <= DD5_MISS_COS_CEIL for m in misses))
    detail = (f"banded-recall contract: {len(misses)} near-tau misses of "
              f"{n_oracle} oracle pairs (expected ~{n_oracle * 1e-4:.1f} "
              f"at delta=1e-4), 0 required: false_pairs={fp} "
              f"value_mismatches={bad_vals} "
              f"miss_cos_max={max((float(m[0]) for m in misses), default=0)}")
    return ok, detail


# er4_er_short_mixed is EXACT (hash-equal to the FastSS-shape oracle),
# but it is also the suite's most expensive query, and its cost
# justification was prose until r16: the dense zero-padded fixture's
# true lev<=2 ball is the information floor. This check makes the
# floor mechanical — it re-derives the single viable del+wildcard arm
# in DuckDB and asserts the scheme sits AT the floor (distinct
# candidates == qualifying pairs exactly; raw join multiplicity and
# fixture density within the committed bounds) on top of the standard
# exact value compare.
ER4 = "er4_er_short_mixed"
ER4_MAX_MULT = float(_CONTRACTS[ER4]["max_arm_multiplicity"])
ER4_MIN_QPD = float(_CONTRACTS[ER4]["min_qualifying_per_dirty"])

ER4_VOLUME_SQL = """
WITH cust AS (
  SELECT c_custkey, 'K#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS c_name
  FROM customer),
dirty AS (
  SELECT c_custkey + 4000000 AS dirty_id,
    (WITH t AS (SELECT
        'K#' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS k,
        c_custkey % 9 AS p1,
        (c_custkey % 9 + 1 + c_custkey % 8) % 9 AS pd)
     SELECT concat(substr(b, 1, CAST(2 + pd AS INT)),
                   substr(b, CAST(4 + pd AS INT)))
     FROM (SELECT concat(substr(k, 1, CAST(2 + p1 AS INT)),
             CAST((CAST(substr(k, CAST(3 + p1 AS INT), 1) AS INT) + 1) % 10
                  AS VARCHAR),
             substr(k, CAST(4 + p1 AS INT))) AS b, pd FROM t)
    ) AS dirty_name
  FROM customer
  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')),
dkeys AS (
  SELECT dirty_id,
    concat(substr(dirty_name, 1, i - 1), '*', substr(dirty_name, i + 1)) AS k
  FROM dirty, generate_series(1, 10) AS g(i)),
cdel AS (
  SELECT DISTINCT c_custkey,
    concat(substr(c_name, 1, i - 1), substr(c_name, i + 1)) AS v
  FROM cust, generate_series(1, 11) AS g(i)),
ckeys AS (
  SELECT DISTINCT c_custkey,
    concat(substr(v, 1, q - 1), '*', substr(v, q + 1)) AS k
  FROM cdel, generate_series(1, 10) AS g(q)),
arm AS (SELECT dk.dirty_id, ck.c_custkey
        FROM dkeys dk JOIN ckeys ck ON dk.k = ck.k),
cand AS (SELECT DISTINCT dirty_id, c_custkey FROM arm)
SELECT
  (SELECT count(*) FROM dirty) AS n_dirty,
  (SELECT count(*) FROM arm) AS arm_rows,
  (SELECT count(*) FROM cand) AS cand_pairs,
  (SELECT count(*) FROM cand c
     JOIN dirty d USING (dirty_id) JOIN cust t USING (c_custkey)
   WHERE levenshtein(d.dirty_name, t.c_name) <= 2) AS qualifying
"""


def er4_check(sf_dir, out_dir, out_json):
    # (1) the standard exact value compare, timed — er4 is NOT
    # approximate; the contract rides ON TOP of hash equality
    t0 = time.time()
    p = subprocess.run(["python3", "tools/compare_oracle.py",
                        sf_dir, out_dir, ER4],
                       capture_output=True, text=True)
    oracle_sec = round(time.time() - t0, 1)
    hash_ok = p.returncode == 0
    # (2) the volume contract: re-derive the viable arm in DuckDB
    import duckdb
    con = duckdb.connect()
    src = f"{sf_dir}/customer.parquet"
    src = f"{src}/*.parquet" if os.path.isdir(src) else src
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{src}')")
    n_dirty, arm_rows, cand_pairs, qualifying = \
        con.execute(ER4_VOLUME_SQL).fetchone()
    mult = arm_rows / qualifying if qualifying else float("inf")
    qpd = qualifying / n_dirty if n_dirty else 0.0
    at_floor = cand_pairs == qualifying
    vol_ok = at_floor and mult <= ER4_MAX_MULT and qpd >= ER4_MIN_QPD
    # (3) spark wall seconds from the sibling sf1 bench artifact, if
    # recorded — embeds the oracle-vs-spark cost parity in the sweep
    spark_sec = None
    bench_path = os.path.join(os.path.dirname(os.path.abspath(out_json)),
                              "bench_sf1.json")
    if os.path.exists(bench_path):
        try:
            spark_sec = json.load(open(bench_path))["queries"].get(ER4)
        except Exception:
            pass
    ok = hash_ok and vol_ok
    detail = (f"exact hash={'ok' if hash_ok else 'FAIL'}; floor contract: "
              f"distinct candidates == lev<=2 ball: {at_floor} "
              f"({cand_pairs} vs {qualifying}), arm multiplicity "
              f"{mult:.4f} (<= {ER4_MAX_MULT}), qualifying/dirty "
              f"{qpd:.0f} (>= {ER4_MIN_QPD:.0f}), oracle {oracle_sec}s"
              + (f", spark cold {spark_sec}s" if spark_sec is not None
                 else ""))
    contract = {"n_dirty": n_dirty, "arm_rows": arm_rows,
                "cand_pairs": cand_pairs, "qualifying": qualifying,
                "arm_multiplicity": round(mult, 4),
                "qualifying_per_dirty": round(qpd, 1),
                "oracle_sec": oracle_sec, "spark_cold_sec": spark_sec}
    return ok, detail, contract


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 1800
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # precondition: the engaged-cap contract classifier must itself
    # pass its synthetic cases (incl. rejecting a negative-gap result)
    # before any verdict that relies on it is recorded
    st = subprocess.run(["python3", "tools/knn_oracle_chunked.py",
                         "--selftest"], capture_output=True, text=True)
    print(st.stdout, end="")
    if st.returncode != 0:
        sys.exit("ABORT: knn_oracle_chunked.py --selftest failed — "
                 "the sim6 contract classifier is broken")
    results = {}
    n_pass = n_fail = n_to = 0
    special = {DD5_BLOCKED: dd5_blocked_check, SIM3: sim3_check}
    for name in sorted(oracle):
        if name == ER4:
            t0 = time.time()
            ok, detail, contract = er4_check(sf_dir, out_dir, out_json)
            sec = round(time.time() - t0, 1)
            results[name] = {"pass": ok, "sec": sec, "detail": detail,
                             "contract": contract,
                             "note": "exact hash + volume-floor contract "
                                     "(see tool header)"}
            n_pass += ok
            n_fail += not ok
            print(f"{'PASS' if ok else 'FAIL'} {name} ({sec}s) {detail}")
            continue
        if name in special:
            t0 = time.time()
            ok, detail = special[name](sf_dir, out_dir)
            sec = round(time.time() - t0, 1)
            results[name] = {"pass": ok, "sec": sec, "detail": detail,
                             "note": "approximate-path contract check "
                                     "(see tool header)"}
            n_pass += ok
            n_fail += not ok
            print(f"{'PASS' if ok else 'FAIL'} {name} ({sec}s) {detail}")
            continue
        if name in KNN_CHUNKED:
            cmd = ["python3", "tools/knn_oracle_chunked.py", sf_dir, out_dir, name]
        else:
            cmd = ["python3", "tools/compare_oracle.py", sf_dir, out_dir, name]
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
            sec = round(time.time() - t0, 1)
            lines = [l for l in p.stdout.strip().splitlines()
                     if l.startswith(("PASS", "FAIL", "WARN", "DIVERGED-OK"))]
            detail = lines[-1] if lines else p.stdout.strip()[-200:]
            ok = p.returncode == 0
            note = ""
            contract = None
            for l in p.stdout.splitlines():
                if l.startswith("CONTRACT "):
                    contract = json.loads(l[len("CONTRACT "):])
            if p.returncode == 3 and name == "sim6_knn_capped":
                # exit 3 is only reachable AFTER the chunked runner
                # asserted the engaged-cap demotion contract (all gaps
                # >= 0, max <= declared ceiling, shape equal, no
                # same-partner score drift) — a violation exits 1 and
                # is recorded as a genuine FAIL here
                ok = True
                note = ("engaged-cap near-tie divergence, demotion "
                        "contract asserted by knn_oracle_chunked.py")
            results[name] = {"pass": ok, "sec": sec, "detail": detail}
            if contract is not None:
                results[name]["contract"] = contract
            if note:
                results[name]["note"] = note
            if ok:
                n_pass += 1
            else:
                n_fail += 1
            print(f"{'PASS' if ok else 'FAIL'} {name} ({sec}s) {note}")
        except subprocess.TimeoutExpired:
            sec = round(time.time() - t0, 1)
            results[name] = {"pass": False, "timeout": True, "sec": sec,
                             "detail": f"oracle exceeded {timeout}s in DuckDB"}
            n_to += 1
            print(f"TIMEOUT {name} ({timeout}s)")
    summary = {"sf_dir": sf_dir, "n": len(oracle), "pass": n_pass,
               "fail": n_fail, "timeout": n_to, "timeout_sec": timeout,
               # the bounds this sweep was graded against, verbatim
               # from the committed contract file (minus prose keys)
               "contract_params": {
                   k: {pk: pv for pk, pv in v.items()
                       if not pk.startswith("_")}
                   for k, v in _CONTRACTS.items() if not k.startswith("_")},
               "results": results}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"== {n_pass} pass / {n_fail} fail / {n_to} timeout "
          f"-> {out_json} ==")
    sys.exit(1 if (n_fail or n_to) else 0)


if __name__ == "__main__":
    main()
