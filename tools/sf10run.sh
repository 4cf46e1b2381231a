#!/bin/bash
# sf10 scale-step rehearsal (round-19 verdict item 1): bench the heavy
# families on the GenScale x100 shards, one JVM window per family (the
# sf1run.sh isolation discipline), with a same-host sf1 pass first so
# growth factors compare windows of identical methodology.
#
#   sbt 'Test/runMain graft.GenScale /root/testdata/sf0.1 /tmp/graft-sf1 10'
#   sbt 'Test/runMain graft.GenScale /root/testdata/sf0.1 /tmp/graft-sf10 100'
#   bash tools/sf10run.sh
#
# Lessons baked in from the r19 run (SCALE.md "Round-19: sf10"):
#   - DEFAULT driver heap (16g). The first rehearsal ran at 48g and GC
#     at that heap inflated shuffle-heavy windows up to 6x (measured:
#     tx_contamination+tx_lm_perplexity pair 33s at 48g vs 6.1s at 16g,
#     same data, same code) — a bigger heap is not a faster heap.
#   - dd_embedding is EXCLUDED at sf10: the exact all-pairs baseline
#     refuses corpora above 100k rows by design. dd_embedding_lsh also
#     REFUSES LOUDLY at sf10 (200k vectors > maxBucket*2^r = 32k with
#     the default nBits=100/bands=20) pending the clustered-regime
#     resize — SCALE.md records it as 'guarded', and the FAILED line
#     below is the expected signal, not a silent skip.
#   - a healthy row grows ~<=10x per 10x data vs the same-host sf1
#     window; rows whose WORKLOAD grows quadratically by contract
#     (|Q| x N serving shapes, pair-output joins) are judged against
#     workload/output growth instead (SCALE.md table notes).
set -e
cd /root/repo
declare -A FAM
FAM[ta]=ta_speed_lag,ta_asof_weather,ta_sessionize
FAM[geo]=geo_nearest_signal,geo_grid_density,geo_poly_join
FAM[tx]=tx_lm_perplexity,tx_lm_serve,tx_contamination,tx_pack_sequences
FAM[dd]=dd_exact,dd_ngram_jaccard,dd_minhash_lsh,dd_simhash,dd_cluster,dd_incremental
FAM[ddemb]=dd_embedding,dd_embedding_lsh
FAM[ss]=ss_brute_topk,ss_lsh_topk,ss_ivf_topk,st_ann_serve,st_ivf_serve
FAM[st]=st_stream_join,st_incremental_dedup,st_session_final
for sf in sf1 sf10; do
  OUT=/tmp/${sf}win
  mkdir -p $OUT
  for fam in ta geo tx dd ddemb ss st; do
    Q=${FAM[$fam]}
    if [ "$sf" = "sf10" ] && [ "$fam" = "ddemb" ]; then Q=dd_embedding_lsh; fi
    echo "=== $sf family $fam ==="
    SPARK_GRAFT_SF_DIR=/tmp/graft-$sf \
    SPARK_GRAFT_BENCH_REPEATS=${SF10_REPEATS:-2} \
    SPARK_GRAFT_BENCH_ONLY=$Q \
    SPARK_GRAFT_BENCH_OUT=$OUT/$fam.json \
    sbt -batch 'runMain graft.Bench' 2>$OUT/$fam.err | grep -E '^\{' | tail -1
    # a crashed family must fail LOUDLY, not vanish from the output —
    # print the stderr tail instead of swallowing it (r19 advice); the
    # per-query "errors" field in the window JSON covers query-level
    # failures (e.g. the expected dd_embedding_lsh refusal at sf10)
    if [ "${PIPESTATUS[0]}" != "0" ]; then
      echo "=== $sf family $fam FAILED (see $OUT/$fam.err) ==="
      tail -5 "$OUT/$fam.err"
    fi
  done
done
# merge ALL sf1 family windows into one base so growth factors cover
# every family (r19 advice: a single-family base silently dropped the
# non-ta growth rows)
SF1BASE=$(ls /tmp/sf1win/*.json 2>/dev/null | paste -sd, -)
python3 tools/sf1bench.py /tmp/sf10win/*.json --base "$SF1BASE" \
  --out /tmp/BENCH_SF10.json 2>/dev/null || \
  echo "growth table: compare /tmp/sf1win/*.json vs /tmp/sf10win/*.json"
