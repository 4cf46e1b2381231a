#!/bin/bash
# Full-suite sf1 bench: one graft.Bench JVM window per family (the
# dedup family's staged checkpoints pressure a shared JVM at 10x and
# inflate unrelated queries measured after them), merged into
# BENCH_SF1.json with growth factors by tools/sf1bench.py.
set -e
cd /root/repo
OUT=/tmp/sf1win
mkdir -p $OUT
declare -A FAM
FAM[ing]=ing_compact_zone,ing_json_props,ing_csv_positions,ing_socketio_parse,ing_bounds_filter,ing_binary_gps,ing_base64_gps,ing_upsert,ing_corrupt_quarantine,ing_poll_lifecycle,ing_poll_stats,ing_jsonl_positions,ing_routes_jsonl,ing_handshake_parse,ing_weather_json,ing_dated_write
FAM[ta]=ta_speed_lag,ta_speed_summary,ta_route_stats,ta_top_routes,ta_latest_per_vehicle,ta_haversine,ta_hourly_activity,ta_interpolate,ta_sessionize,ta_session_stats,ta_asof_weather,ta_weather_corr,ta_speed_histogram,ta_route_labels,ta_slowest_routes,ta_fastest_routes
FAM[geo]=geo_map_html,geo_map_export,geo_grid_density,geo_nearest_signal,geo_tag_stats,geo_point_in_poly,geo_poly_concave,geo_poly_area,geo_overpass_build,geo_osm_xml_parse,geo_osm_way_parse,geo_osm_relation_parse,geo_geojson_roundtrip,geo_range_query,geo_poly_join
FAM[q]=q1_pricing_summary,q3_shipping_priority,q5_local_supplier,q_top_customer_per_nation,q_decile_stats,q_skew_join,q_orphan_check,q_bucket_join,q_order_fill_rate,q_rollup
FAM[tx]=tx_lm_perplexity,tx_lm_serve,tx_token_count,tx_bpe_tokens,tx_pack_sequences,tx_quality_score,tx_lang_id,tx_fingerprint,tx_ngram_freq,tx_pii_scrub,tx_train_split,tx_repetition,tx_contamination,tx_quality_filter,tx_stratified_sample
FAM[dd]=dd_exact,dd_ngram_jaccard,dd_minhash_lsh,dd_simhash,dd_cluster,dd_incremental,dd_cluster_incr,dd_keep_list
FAM[ddemb]=dd_embedding,dd_embedding_lsh
FAM[ss]=ss_brute_topk,ss_lsh_topk,ss_ivf_topk,st_ann_serve,st_ivf_serve
FAM[mm]=mm_meta_extract,mm_frame_sample,mm_resize_plan,mm_decode_features,mm_header_decode
FAM[st]=st_asof_serve,st_windowed_counts,st_stream_dedup,st_incremental_dedup,st_ttl_dedup,st_stream_join,st_sliding_counts,st_session_window,st_session_final,st_dated_sink,st_reconnect_backoff,st_recover_buffered,st_sessionize,st_positions_parse
FAM[ag]=ag_approx_distinct,ag_approx_topk,ag_approx_quantile
for fam in ing ta geo q tx dd ddemb ss mm st ag; do
  echo "=== family $fam ==="
  SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 \
  SPARK_GRAFT_BENCH_REPEATS=${SF1_REPEATS:-2} \
  SPARK_GRAFT_BENCH_ONLY=${FAM[$fam]} \
  SPARK_GRAFT_BENCH_OUT=$OUT/$fam.json \
  sbt -batch 'runMain graft.Bench' 2>&1 | grep -E '^\{' | tail -1
done
python3 tools/sf1bench.py $OUT/*.json --base /root/repo/BENCH_LOCAL.json \
  --out /root/repo/BENCH_SF1.json
