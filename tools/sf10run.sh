#!/bin/bash
# sf10 scale-step rehearsal (round-19 verdict item 1): bench the heavy
# families on the GenScale x100 shards, one JVM window per family (the
# sf1run.sh isolation discipline), merged with growth-vs-sf1 factors.
#
#   sbt 'Test/runMain graft.GenScale /root/testdata/sf0.1 /tmp/graft-sf10 100'
#   bash tools/sf10run.sh
#
# Produces /tmp/BENCH_SF10.json with per-query growth vs BENCH_SF1.json;
# a healthy row grows ~10x or less, a super-linear row is a defect.
set -e
cd /root/repo
OUT=/tmp/sf10win
mkdir -p $OUT
declare -A FAM
FAM[ta]=ta_speed_lag,ta_asof_weather,ta_sessionize
FAM[geo]=geo_nearest_signal,geo_grid_density,geo_poly_join
FAM[tx]=tx_lm_perplexity,tx_lm_serve,tx_contamination,tx_pack_sequences
FAM[dd]=dd_exact,dd_ngram_jaccard,dd_minhash_lsh,dd_simhash,dd_cluster,dd_incremental
FAM[ddemb]=dd_embedding,dd_embedding_lsh
FAM[ss]=ss_brute_topk,ss_lsh_topk,ss_ivf_topk,st_ann_serve,st_ivf_serve
FAM[st]=st_stream_join,st_incremental_dedup,st_session_final
for fam in ta geo tx dd ddemb ss st; do
  echo "=== family $fam ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft-sf10 \
  SPARK_GRAFT_BENCH_REPEATS=${SF10_REPEATS:-2} \
  SPARK_GRAFT_BENCH_ONLY=${FAM[$fam]} \
  SPARK_GRAFT_BENCH_OUT=$OUT/$fam.json \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep -E '^\{' | tail -1
done
python3 tools/sf1bench.py $OUT/*.json --base /root/repo/BENCH_SF1.json \
  --out /tmp/BENCH_SF10.json
