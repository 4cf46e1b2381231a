#!/usr/bin/env python3
"""Produce BASELINE_SF1.md: DuckDB oracle timings at sf1 (10x) for the
floor-dominated queries whose sf0.1 ratio sits above 2x.

The repo's defense of those ratios is "the ~0.3-0.5 s Spark fixed floor
amortizes with data volume" — this tool turns that argument into a
measurement: the same oracle SQL the correctness gate runs, timed on
the sf1 shards, divided into the Spark sf1 minima from BENCH_SF1.json.

Usage: python3 tools/baseline_sf1.py [--all] [sfDir] [verifyOut] [benchSf1] [outMd]
  --all     ALSO time every query in oracle_sql.json and append a
            full-suite table (one window produces the whole file)
  sfDir     sf1 parquet tables dir           (default /tmp/graft-sf1)
  verifyOut dir holding oracle_sql.json      (default /tmp/verify_sf01)
  benchSf1  BENCH_SF1.json with Spark minima (default /root/repo/BENCH_SF1.json)
  outMd     output markdown                  (default /root/repo/BASELINE_SF1.md)
"""
import duckdb, sys, json, time, datetime

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
REPEATS = 5

# the sf0.1 >2x set from the round-12 verdict's per-query audit, plus
# the round-13 st_ttl_dedup (streaming state machinery over a 0.4 s
# oracle — the same floor shape), plus the members of the round-13
# closing window's >2x set (window noise moves which queries cross the
# 0.1 s DuckDB cutoff, so the union of both windows' sets is defended)
QUERIES = [
    "dd_exact", "tx_contamination", "dd_ngram_jaccard", "dd_incremental",
    "ss_brute_topk", "ing_csv_positions", "ing_corrupt_quarantine",
    "ing_base64_gps", "ing_binary_gps", "ing_jsonl_positions",
    "geo_geojson_roundtrip", "geo_osm_relation_parse", "geo_osm_xml_parse",
    "st_positions_parse", "st_ttl_dedup",
    "ta_speed_lag", "ta_asof_weather", "st_session_window",
    "st_session_final",
    "geo_poly_concave", "geo_osm_way_parse",
]


def time_queries(con, oracle, spark_q, names):
    rows = []
    for name in names:
        if name not in oracle:
            print(f"SKIP {name}: no oracle")
            continue
        best = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            best_i = time.perf_counter() - t0
            best = best_i if best is None else min(best, best_i)
        sp = spark_q.get(name)
        rows.append((name, best, sp))
        ratio = "n/a" if sp is None else f"{sp / best:.2f}"
        print(f"{name}: duckdb {best:.3f}s spark {sp} ratio {ratio}")
    return rows


def table_lines(rows):
    lines = ["| query | duckdb_sf1_s | spark_sf1_s | ratio_sf1 |",
             "| --- | ---: | ---: | ---: |"]
    for name, d, sp in rows:
        sps = "" if sp is None else f"{sp:.3f}"
        ratio = "" if sp is None else f"{sp / d:.2f}"
        lines.append(f"| {name} | {d:.3f} | {sps} | {ratio} |")
    duck_total = sum(r[1] for r in rows)
    spark_total = sum(r[2] for r in rows if r[2] is not None)
    lines.append(f"| **total** | **{duck_total:.3f}** | **{spark_total:.3f}** | "
                 f"**{spark_total / duck_total:.2f}** |")
    return lines, duck_total, spark_total


def main():
    argv = [a for a in sys.argv[1:] if a != "--all"]
    run_all = "--all" in sys.argv[1:]
    sf = argv[0] if len(argv) > 0 else "/tmp/graft-sf1"
    vout = argv[1] if len(argv) > 1 else "/tmp/verify_sf01"
    bench_path = argv[2] if len(argv) > 2 else "/root/repo/BENCH_SF1.json"
    out_md = argv[3] if len(argv) > 3 else "/root/repo/BASELINE_SF1.md"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    # GenScale shards carry events.ts as raw BIGINT nanos — rebuild the
    # view so CAST(ts AS TIMESTAMP) means the same instant as the
    # driver's TIMESTAMP(NANOS) parquet (same normalization as check.py)
    ts_type = {c: str(ty) for c, ty in
               zip(con.table("events").columns, con.table("events").types)}
    if ts_type.get("ts") == "BIGINT":
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE "
            "(CAST(make_timestamp(ts // 1000) AS TIMESTAMP_NS) AS ts) "
            f"FROM '{sf}/events.parquet'")
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    bench = json.load(open(bench_path))
    spark_q = bench.get("queries", {})
    rows = time_queries(con, oracle, spark_q, QUERIES)
    focus_tbl, duck_total, spark_total = table_lines(rows)
    stamp = datetime.date.today().isoformat()
    lines = [
        "# BASELINE_SF1 — the sf0.1 >2x set re-measured at 10x data",
        "",
        f"Generated {stamp} by tools/baseline_sf1.py. DuckDB = min of "
        f"{REPEATS} runs of each query's oracle SQL over `{sf}` "
        "(the GenScale 10x shards); Spark = the per-family sf1 windows "
        "in BENCH_SF1.json (tools/sf1run.sh). These are the queries "
        "whose sf0.1 ratio exceeds 2x with a 0.1-0.25 s DuckDB side — "
        "the claim under test is that Spark's ~0.3-0.5 s fixed per-query "
        "floor (scheduler, codegen, stream replay machinery) AMORTIZES "
        "while both engines' data-proportional cost grows 10x.",
        "",
    ] + focus_tbl + [
        "",
        "Spark minima come from BENCH_SF1.json's per-family windows "
        "(repeats=2 minima) — a different measurement discipline than "
        "BASELINE.md's single quiet window, so per-query ratios carry "
        "that window noise; the TOTAL is the number the floor-amortization "
        "claim stands on.",
    ]
    if run_all:
        rest = [n for n in sorted(oracle) if n not in QUERIES]
        all_rows = time_queries(con, oracle, spark_q, rest)
        full_tbl, fd, fs = table_lines(rows + all_rows)
        lines += [
            "",
            "## Full SQL-checked suite at sf1",
            "",
            "Every query with an oracle, same window as the table above — "
            "the sf0.1 per-query ratios in BASELINE.md include ~60 rows "
            "where DuckDB answers in <100 ms and the comparison is purely "
            "Spark's fixed floor; this table is the same comparison at 10x "
            "data, where the floor has amortized to its asymptotic share.",
            "",
        ] + full_tbl
        print(f"full suite: duckdb {fd:.2f}s spark {fs:.2f}s "
              f"ratio {fs / fd:.2f}")
    open(out_md, "w").write("\n".join(lines) + "\n")
    print(f"\nwrote {out_md}: focus total duckdb {duck_total:.2f}s "
          f"spark {spark_total:.2f}s ratio {spark_total / duck_total:.2f}")


if __name__ == "__main__":
    main()
