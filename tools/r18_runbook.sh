#!/bin/bash
# r18 post-golden runbook — the serialized timed sequence (NEVER run
# these concurrently with each other or with any DuckDB oracle; r17
# lesson). Each step is also runnable by hand; this file is the
# committed record of the exact invocations.
set -euo pipefail
cd "$(dirname "$0")/.."

step="${1:?usage: r18_runbook.sh dynamic|bench|sf10verify|sf10cert}"

case "$step" in
  dynamic)
    # judge item #3: 250 queries / 5 batches of 50, quiet box, dual
    # same-pass floors per batch (+ r18 resolution-qualified twins)
    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_LABEL_REPEATS=2 \
    SPARK_GRAFT_LABEL_ADAPTIVE_MAX=4 SPARK_GRAFT_TRAIN_THREADS=16 \
    exec tools/run-class.sh graft.planopt.DynamicMain \
      /root/testdata/sf0.1 250 50 60 results/r18_dynamic \
      results/r14_pool/train_pool.txt
    ;;
  bench)
    # judge item #5: quiet-box sf0.1 re-record (cwd = repo root so
    # bench_out.json/bench_diag.json land as the committed artifacts)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=12g \
    exec tools/run-class.sh graft.Bench
    ;;
  sf10verify)
    # judge item #6: produce the three new gate outputs at sf10 into
    # the existing r17 verify dir (Verify's third arg = query filter)
    exec tools/run-class.sh graft.Verify /tmp/scaledata/sf10 \
      /tmp/verify_sf10 \
      "pr2_pagerank_converged,dd6_dup_clusters,io3_partitioned_prune"
    ;;
  sf10cert)
    # widened 9-block spot-certification (disk-budgeted oracles)
    GRAFT_SPOT_SIM6_CHUNKS=2000 GRAFT_SPOT_SIM6_SAMPLE=2 \
    exec python3 tools/sf10_spotcert.py /tmp/scaledata/sf10 \
      /tmp/verify_sf10 results/r18_sf10/spotcert.json
    ;;
esac
