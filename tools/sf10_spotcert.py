#!/usr/bin/env python3
"""sf10 SPOT-CERTIFICATION of the scale-path contracts (r16 verdict
#3): the 100 TB claims previously topped out at sf1. This runner
re-asserts the committed approximate-path bounds
(tools/sweep_contracts.json — the same single source the sf1 sweep
loads; no bound is redefined here) at the 100x ScaleUp corpus, using
SAMPLED ground truth where the exact oracle is computationally
infeasible at this scale:

  io6_dpp_join       full DuckDB hash compare (oracle is cheap at any SF)
  dd10               planted-pair recall + adaptive banding plan
                     re-derivation (bits/bands must match the n-derived
                     values; the planted duplicate must be recovered
                     with cos_sim 1.0)
  dd5_blocked        (a) EVERY emitted pair exactly re-verified in
                     DuckDB — zero false pairs, zero value drift —
                     this side is complete, not sampled;
                     (b) misses graded on a uniform 1/SAMPLE_MOD pair
                     sample (pairs whose smaller id ≡ 0 mod M): bound
                     re-derived from the committed per_pair_miss_prob
                     over the sampled qualifying count, every miss
                     within the committed near-tau ceiling
  sim6_knn_capped    knn_oracle_chunked.py in sampled-probe mode —
                     the engaged-cap demotion contract (committed
                     gap_min/gap_max) asserted on a uniform probe
                     sample
  er4                the volume-floor contract re-derived in DuckDB on
                     a uniform dirty-name sample facing the FULL
                     customer key space (exactly the density-growth
                     question: multiplicity and qualifying/dirty must
                     hold as every name's lev<=2 ball grows 10x);
                     materializing the full sf10 candidate set
                     (~1.7e10 pairs) is the floor's own cost, so the
                     Spark-parity half of er4 stays certified at sf1
  clu1_kmeans        output-shape sanity (one row per vector, cluster
                     ids within the n-derived k) — the chunked-driver
                     contract itself is spec-pinned
                     (ClusteringChunkedSpec / CurationSpec) and
                     measured in results/r16_kernel/

Usage: sf10_spotcert.py <sf10Dir> <verifyOutDir> <outJson>
"""
import json, math, os, subprocess, sys, time

HERE = os.path.dirname(os.path.abspath(__file__))
_CONTRACTS = json.load(open(os.path.join(HERE, "sweep_contracts.json")))

# sampling moduli: chosen so each sampled ground-truth computation is
# ~sf1-sweep-sized; recorded in the artifact so the evidence scope is
# explicit. Env overrides exist for smoke-testing the runner at tiny
# SFs (GRAFT_SPOT_*) — the committed defaults are the sf10 protocol.
DD5_SAMPLE_MOD = int(os.environ.get("GRAFT_SPOT_DD5_MOD", "100"))
SIM6_CHUNKS = int(os.environ.get("GRAFT_SPOT_SIM6_CHUNKS", "200"))
SIM6_SAMPLE_CHUNKS = int(os.environ.get("GRAFT_SPOT_SIM6_SAMPLE", "2"))
ER4_SAMPLE_MOD = int(os.environ.get("GRAFT_SPOT_ER4_MOD", "997"))

DD5 = "dd5_blocked_neardup"
ER4 = "er4_er_short_mixed"


def duck():
    # disk-budgeted connection (r17 verdict #4: an unbounded oracle
    # spill filled local disk and killed a concurrent timed run) —
    # shared knobs with knn_oracle_chunked.budgeted_connect
    sys.path.insert(0, HERE)
    from knn_oracle_chunked import budgeted_connect
    con = budgeted_connect()
    # bounded parallelism: the spot-cert may share the box with timed
    # pipeline runs; 8 threads keeps each block minutes-scale without
    # monopolizing the machine
    con.execute(f"SET threads={int(os.environ.get('GRAFT_SPOT_THREADS', '8'))}")
    return con


def view(con, sf_dir, table):
    p = f"{sf_dir}/{table}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE OR REPLACE VIEW {table} AS "
                f"SELECT * FROM read_parquet('{src}')")


def check_io6(sf_dir, out_dir):
    p = subprocess.run(["python3", os.path.join(HERE, "compare_oracle.py"),
                        sf_dir, out_dir, "io6_dpp_join"],
                       capture_output=True, text=True)
    ok = p.returncode == 0
    tail = (p.stdout.strip().splitlines() or ["(no output)"])[-1]
    return ok, f"full hash compare: {tail}"


def check_dd10(sf_dir, out_dir):
    con = duck()
    view(con, sf_dir, "embeddings")
    n = con.execute("SELECT count(*) + 1 FROM embeddings").fetchone()[0]
    bits = next(b for b in range(4, 25) if (1 << b) * 16 >= n)
    bands_of = {4: 9, 5: 12, 6: 14, 7: 17, 8: 21, 9: 25, 10: 29, 11: 35,
                12: 41, 13: 49, 14: 57, 15: 68, 16: 79, 17: 93, 18: 109,
                19: 128, 20: 150, 21: 176, 22: 206, 23: 241, 24: 282}
    rows = con.execute(
        "SELECT a_id, b_id, cos_sim, bits, bands FROM "
        f"read_parquet('{out_dir}/dd10_adaptive_neardup/*.parquet')"
    ).fetchall()
    planted = [r for r in rows if r[0] == 0 and r[1] == 1000000]
    plan_ok = all(r[3] == bits and r[4] == bands_of[bits] for r in rows)
    planted_ok = len(planted) == 1 and float(planted[0][2]) == 1.0
    ok = bool(rows) and plan_ok and planted_ok
    detail = (f"adaptive plan: n={n} -> bits={bits} bands={bands_of[bits]} "
              f"(all {len(rows)} rows match={plan_ok}); planted pair "
              f"(0, 1000000) recovered at cos 1.0: {planted_ok}")
    return ok, detail


def check_dd5(sf_dir, out_dir, name=DD5, tau=0.4):
    miss_prob = float(_CONTRACTS[DD5]["per_pair_miss_prob"])
    cos_ceil = float(_CONTRACTS[DD5]["miss_cos_ceil"]) if tau == 0.4 \
        else tau + 0.05  # same near-tau headroom shape as the committed 0.45
    con = duck()
    view(con, sf_dir, "embeddings")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    anchor = "WHERE a.vec_id < b.vec_id"
    if sql.count(anchor) != 1:
        return False, (f"DRIFT: committed {name} oracle no longer contains "
                       f"exactly one '{anchor}' — update the sampler")
    # corpus CTEs + alias come from the committed SQL itself (dd5's
    # plain corpus is `ed`; the planted tau09 twin joins `edp`) so this
    # check can never silently diverge from the oracle's corpus
    import re
    m = re.search(r"FROM (\w+) a, \1 b", sql)
    if not m:
        return False, f"DRIFT: cannot find 'FROM <t> a, <t> b' in {name}"
    tbl = m.group(1)
    with_clause = sql[:sql.index("SELECT a.vec_id")]
    con.execute("CREATE TABLE spark AS SELECT * FROM "
                f"read_parquet('{out_dir}/{name}/*.parquet')")
    # (a) COMPLETE false-pair + value check: re-derive the exact cosine
    # for every emitted pair (linear in emitted pairs, not all-pairs)
    bad = con.execute(f"""
      {with_clause}
      SELECT count(*) FROM spark s
      JOIN {tbl} a ON a.vec_id = s.a_id JOIN {tbl} b ON b.vec_id = s.b_id
      WHERE round(list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))), 4) <> s.cos_sim
         OR list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) *
               sqrt(list_dot_product(b.v, b.v))) < {tau}
    """).fetchone()[0]
    n_spark = con.execute("SELECT count(*) FROM spark").fetchone()[0]
    # (b) SAMPLED miss check: exact oracle restricted to pairs whose
    # smaller id is in the 1/M residue class — a uniform pair sample
    sampled_sql = sql.replace(
        anchor, anchor + f" AND a.vec_id % {DD5_SAMPLE_MOD} = 0")
    con.execute(f"CREATE TABLE osample AS {sampled_sql}")
    n_osample = con.execute("SELECT count(*) FROM osample").fetchone()[0]
    misses = con.execute(
        "SELECT o.cos_sim FROM osample o ANTI JOIN spark s "
        "ON s.a_id = o.a_id AND s.b_id = o.b_id").fetchall()
    mean = n_osample * miss_prob
    miss_bound = max(2, math.ceil(mean + 5 * math.sqrt(max(mean, 1.0))))
    ok = (bad == 0 and n_osample > 0 and len(misses) <= miss_bound and
          all(float(m[0]) <= cos_ceil for m in misses))
    detail = (f"complete emitted-pair check: {n_spark} pairs, "
              f"{bad} false/value-drifted (0 required); sampled misses "
              f"(1/{DD5_SAMPLE_MOD} of pairs, {n_osample} qualifying): "
              f"{len(misses)} <= bound {miss_bound} "
              f"(per-pair p={miss_prob}), miss_cos_max="
              f"{max((float(m[0]) for m in misses), default=0)} "
              f"(ceil {cos_ceil}) [tau={tau}]")
    return ok, detail


def check_sim6(sf_dir, out_dir):
    p = subprocess.run(
        ["python3", os.path.join(HERE, "knn_oracle_chunked.py"),
         sf_dir, out_dir, "sim6_knn_capped",
         str(SIM6_CHUNKS), str(SIM6_SAMPLE_CHUNKS)],
        capture_output=True, text=True)
    ok = p.returncode in (0, 3)
    lines = [l for l in p.stdout.strip().splitlines()
             if l.startswith(("PASS", "FAIL", "DIVERGED-OK", "CONTRACT"))]
    note = "engaged-cap divergence (exit 3)" if p.returncode == 3 else \
           f"exit {p.returncode}"
    return ok, (f"sampled-probe chunked oracle "
                f"({SIM6_SAMPLE_CHUNKS}/{SIM6_CHUNKS} of probes), {note}: "
                + " | ".join(lines[-2:]))


# the sf1 sweep's ER4 volume derivation with the dirty side restricted
# to a uniform custkey residue sample — the candidate/qualifying RATIO
# and per-dirty density are per-dirty quantities, so a dirty sample
# facing the FULL customer key space measures exactly the judge's
# density-growth question without materializing ~1.7e10 pairs
ER4_SAMPLED_VOLUME_SQL = """
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
  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    AND c_custkey % {mod} = 0),
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


def check_er4(sf_dir):
    max_mult = float(_CONTRACTS[ER4]["max_arm_multiplicity"])
    min_qpd = float(_CONTRACTS[ER4]["min_qualifying_per_dirty"])
    con = duck()
    view(con, sf_dir, "customer")
    n_dirty, arm_rows, cand_pairs, qualifying = con.execute(
        ER4_SAMPLED_VOLUME_SQL.format(mod=ER4_SAMPLE_MOD)).fetchone()
    mult = arm_rows / qualifying if qualifying else float("inf")
    qpd = qualifying / n_dirty if n_dirty else 0.0
    at_floor = cand_pairs == qualifying
    ok = at_floor and mult <= max_mult and qpd >= min_qpd and n_dirty > 0
    detail = (f"sampled dirty (1/{ER4_SAMPLE_MOD}, n={n_dirty}) vs FULL "
              f"customer space: candidates == lev<=2 ball: {at_floor} "
              f"({cand_pairs} vs {qualifying}), arm multiplicity "
              f"{mult:.4f} (<= {max_mult}), qualifying/dirty {qpd:.0f} "
              f"(>= {min_qpd:.0f})")
    contract = {"n_dirty": n_dirty, "arm_rows": arm_rows,
                "cand_pairs": cand_pairs, "qualifying": qualifying,
                "arm_multiplicity": round(mult, 4),
                "qualifying_per_dirty": round(qpd, 1),
                "dirty_sample_mod": ER4_SAMPLE_MOD}
    return ok, detail, contract


# ---- r18 widening (r17 verdict #6): pr2 round-count + delta-agg
# bound, dd6 full-compare + CC-bound evidence, io3 full-compare +
# partition-pruning proof ----

PR2_SCALE = 1000000000000      # Graph.Scale
PR2_DAMP = 50                  # Graph.ConvDamp
PR2_MAX_ROUNDS = 24            # Graph.ConvMaxRounds
PR2_DENOM = 1000               # Graph.ConvDenom


def check_pr2(sf_dir, out_dir):
    """pr2 at sf10: (a) the emitted round count is CONSTANT, >=2 and
    strictly under the hard cap (converged, not capped); (b) one row
    per graph node, node set re-derived exactly in DuckDB; (c) rank
    mass conserved within integer-truncation slack; (d) the DELTA-AGG
    BOUND — re-run ONE exact PageRank round in DuckDB from the emitted
    ranks and assert the next delta still satisfies the committed stop
    criterion (denom*delta <= scale): the emitted state is a verified
    fixed point of the exact integer recurrence, not just 'some ranks'.
    The full recursive-CTE hash compare stays certified at sf1."""
    con = duck()
    view(con, sf_dir, "orders")
    view(con, sf_dir, "lineitem")
    out = f"{out_dir}/pr2_pagerank_converged/*.parquet"
    rmin, rmax, nrows, mass = con.execute(
        f"SELECT min(rounds), max(rounds), count(*), sum(rank) "
        f"FROM read_parquet('{out}')").fetchone()
    rounds_ok = rmin == rmax and 2 <= rmin < PR2_MAX_ROUNDS
    n_nodes, next_delta = con.execute(f"""
      WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
                         l_partkey * 2 + 1 AS dst
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
      n AS (SELECT count(*) AS n FROM deg),
      r AS (SELECT node, rank FROM read_parquet('{out}')),
      contrib AS (SELECT s.dst, sum(r.rank // d.outdeg) AS c
                  FROM sym s JOIN deg d ON d.src = s.src
                  JOIN r ON r.node = s.src GROUP BY s.dst),
      nxt AS (SELECT d.src AS node,
                CAST({(100 - PR2_DAMP) * PR2_SCALE} // (100 * (SELECT n FROM n))
                  + {PR2_DAMP} * COALESCE(c.c, 0) // 100 AS BIGINT) AS rank
              FROM deg d LEFT JOIN contrib c ON c.dst = d.src)
      SELECT (SELECT n FROM n) AS n_nodes,
             (SELECT sum(abs(nxt.rank - r.rank))
              FROM nxt JOIN r USING (node)) AS next_delta
    """).fetchone()
    shape_ok = nrows == n_nodes
    mass_ok = 0.98 * PR2_SCALE <= mass <= PR2_SCALE
    delta_ok = PR2_DENOM * next_delta <= PR2_SCALE
    ok = rounds_ok and shape_ok and mass_ok and delta_ok
    detail = (f"rounds={rmin} (constant={rmin == rmax}, 2<=r<{PR2_MAX_ROUNDS}:"
              f" {rounds_ok}); one row per node: {nrows}/{n_nodes}"
              f" ({shape_ok}); rank mass {mass}/{PR2_SCALE}"
              f" ({mass / PR2_SCALE:.6f}, >=0.98: {mass_ok}); delta-agg"
              f" bound: one more exact round moves sum|drank|={next_delta}"
              f" ({PR2_DENOM}*delta<=scale: {delta_ok})")
    return ok, detail


def check_dd6(sf_dir, out_dir):
    """dd6 at sf10: FULL hash compare against the committed
    recursive-CTE connected-components oracle (the pair graph is
    dup-pair sized — ScaleUp's alphabet permutation keeps duplicates
    within-replica, so it grows linearly, and the exact oracle stays
    cheap at 100x) plus the CC-round evidence: the widest cluster
    diameter d observed, whose O(log2 d) bound is the committed
    round discipline (spec-pinned live in the Spark loop)."""
    p = subprocess.run(["python3", os.path.join(HERE, "compare_oracle.py"),
                        sf_dir, out_dir, "dd6_dup_clusters"],
                       capture_output=True, text=True)
    hash_ok = p.returncode == 0
    tail = (p.stdout.strip().splitlines() or ["(no output)"])[-1]
    con = duck()
    n_cl, max_sz, n_rows = con.execute(
        "SELECT count(DISTINCT canon_id), max(cluster_size), count(*) FROM "
        f"read_parquet('{out_dir}/dd6_dup_clusters/*.parquet')").fetchone()
    cc_bound = math.ceil(math.log2(max(max_sz, 2)))
    return hash_ok, (f"full hash compare: {tail}; {n_rows} members in "
                     f"{n_cl} clusters, max size {max_sz} -> CC round "
                     f"bound ceil(log2 d)={cc_bound} (loop discipline "
                     "spec-pinned)")


def check_io3(sf_dir, out_dir):
    """io3 at sf10, both halves of the layout claim: (a) CONTENT —
    full hash compare of the corpus fingerprint read back through the
    lang-partitioned layout; (b) PRUNING — PruneProofMain plans the
    one-language slice against the layout it wrote at this SF and
    reports, from the scan's own catalog listing under its partition
    filters, partitions/files read vs existing (the 1/N-scan property
    that matters at 100 TB)."""
    p = subprocess.run(["python3", os.path.join(HERE, "compare_oracle.py"),
                        sf_dir, out_dir, "io3_partitioned_prune"],
                       capture_output=True, text=True)
    hash_ok = p.returncode == 0
    tail = (p.stdout.strip().splitlines() or ["(no output)"])[-1]
    pp = subprocess.run(["bash", os.path.join(HERE, "run-class.sh"),
                         "graft.tools.PruneProofMain", sf_dir],
                        capture_output=True, text=True)
    jline = next((l for l in reversed(pp.stdout.strip().splitlines())
                  if l.startswith("{")), None)
    if pp.returncode != 0 or jline is None:
        return False, (f"hash: {tail}; prune proof FAILED to run "
                       f"(exit {pp.returncode}): "
                       f"{(pp.stderr or pp.stdout)[-300:]}")
    j = json.loads(jline)
    prune_ok = (0 < j["partitions_read"] < j["partitions_total"] and
                j["files_read"] < j["files_total"] and j["rows"] > 0)
    ok = hash_ok and prune_ok
    detail = (f"full hash compare through the layout: {tail}; pruning "
              f"proof: scan touches {j['partitions_read']}/"
              f"{j['partitions_total']} partitions, {j['files_read']}/"
              f"{j['files_total']} files for [{j['partition_filters']}] "
              f"({j['rows']} rows)")
    return ok, detail, {"prune_proof": j}


def check_clu1(sf_dir, out_dir):
    con = duck()
    view(con, sf_dir, "embeddings")
    n = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    nrows, nclusters, maxc = con.execute(
        "SELECT count(*), count(DISTINCT cluster), max(cluster) FROM "
        f"read_parquet('{out_dir}/clu1_kmeans/*.parquet')").fetchone()
    k = max(8, n // 625)  # Clustering.kFor: max(MinK=8, n/RowsPerCluster=625)
    ok = nrows == n and maxc <= k
    detail = (f"one row per vector: {nrows}/{n}; clusters used "
              f"{nclusters} (k={k}, max id {maxc} <= k: {maxc <= k}); "
              "chunked-driver contract spec-pinned "
              "(ClusteringChunkedSpec), engaged-k measurement in "
              "results/r16_kernel/refit_scale.json")
    return ok, detail


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    results = {}
    blocks = [
        ("io6_dpp_join", lambda: check_io6(sf_dir, out_dir)),
        ("dd10_adaptive_neardup", lambda: check_dd10(sf_dir, out_dir)),
        # the PRODUCTION-tau banded twin carries the sf10 recall/
        # exactness contract. The tau=0.4 dd5_blocked fixture is the
        # DELIBERATELY PERMISSIVE contract corpus (SCALE.md): its
        # candidate volume is ~quadratic by design (that is what the
        # permissive banding demonstrates), so at sf10 its candidate
        # shuffle exceeds local disk — the measured cliff is the
        # fixture's point, and its scale path IS dd10's adaptive
        # banding (certified above) + the tau09 twin (certified here).
        ("dd5_blocked_tau09",
         lambda: check_dd5(sf_dir, out_dir, "dd5_blocked_tau09", tau=0.9)),
        ("sim6_knn_capped", lambda: check_sim6(sf_dir, out_dir)),
        ("clu1_kmeans", lambda: check_clu1(sf_dir, out_dir)),
        # r18 widening (r17 verdict #6)
        ("pr2_pagerank_converged", lambda: check_pr2(sf_dir, out_dir)),
        ("dd6_dup_clusters", lambda: check_dd6(sf_dir, out_dir)),
        ("io3_partitioned_prune", lambda: check_io3(sf_dir, out_dir)),
    ]
    n_fail = 0
    for name, fn in blocks:
        t0 = time.time()
        try:
            r = fn()
            ok, detail = r[0], r[1]
            extra = r[2] if len(r) > 2 else None
        except Exception as e:
            ok, detail, extra = False, f"EXCEPTION: {e}", None
        sec = round(time.time() - t0, 1)
        results[name] = {"pass": bool(ok), "sec": sec, "detail": detail}
        if extra:
            results[name]["contract"] = extra
        n_fail += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name} ({sec}s): {detail}",
              flush=True)
    t0 = time.time()
    try:
        ok, detail, contract = check_er4(sf_dir)
    except Exception as e:
        ok, detail, contract = False, f"EXCEPTION: {e}", None
    sec = round(time.time() - t0, 1)
    results[ER4] = {"pass": bool(ok), "sec": sec, "detail": detail,
                    "contract": contract,
                    "note": "volume-floor contract on a dirty sample; "
                            "Spark-parity half certified at sf1"}
    n_fail += 0 if ok else 1
    print(f"{'PASS' if ok else 'FAIL'} {ER4} ({sec}s): {detail}", flush=True)
    out = {"sf_dir": sf_dir, "n_blocks": len(results), "n_fail": n_fail,
           "sampling": {"dd5_pair_sample_mod": DD5_SAMPLE_MOD,
                        "sim6_probe_sample": f"{SIM6_SAMPLE_CHUNKS}/{SIM6_CHUNKS}",
                        "er4_dirty_sample_mod": ER4_SAMPLE_MOD},
           "results": results}
    os.makedirs(os.path.dirname(os.path.abspath(out_json)), exist_ok=True)
    json.dump(out, open(out_json, "w"), indent=1)
    print(f"wrote {out_json}: {len(results) - n_fail}/{len(results)} pass")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
