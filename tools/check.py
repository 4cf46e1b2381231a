#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
  1. (caller) sbt "runMain graft.Verify <sfDir> <outDir>"
  2. python3 tools/check.py <sfDir> <outDir>

For each query dir in outDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json against the raw tables, sort columns by
name + sort rows, and compare cell-by-cell (exact for non-floats, exact
then 1e-9-relative fallback report for floats so near-miss ulp issues
are visible before the driver's hash compare fails on them).
"""
import duckdb, sys, json, glob, os, math

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x
    return x


def rows_of(df):
    cols = sorted(df.columns)
    recs = df[cols].values.tolist()
    return cols, sorted([tuple(norm_cell(c) for c in r) for r in recs],
                        key=lambda t: tuple(str(c) for c in t))


def cmp_cell(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, True
        exact = (a == b)
        close = exact or (abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
        return exact, close
    return (a == b), (a == b)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    # Scaled-data normalization: the driver's events.parquet carries ts
    # as TIMESTAMP(NANOS), but GenScale's 10x copies write raw nanos
    # BIGINT (Spark has no nanos timestamp type to write back). Expose
    # the same TIMESTAMP_NS view either way so every oracle binds
    # identically; micros truncation is invisible — all oracle ts math
    # goes through epoch_us/CAST, both micro-resolution.
    ts_type = {c: str(ty) for c, ty in
               zip(con.table("events").columns, con.table("events").types)}
    if ts_type.get("ts") == "BIGINT":
        con.execute("DROP VIEW events")
        con.execute(
            "CREATE VIEW events AS SELECT * REPLACE "
            "(CAST(make_timestamp(ts // 1000) AS TIMESTAMP_NS) AS ts) "
            f"FROM '{sf}/events.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*")
                   if os.path.isdir(p))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        try:
            res = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ok" if len(res) > 0 else "EMPTY"
            print(f"rows {name}: {len(res)} rows ({status})")
            n_rows_only += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp = exp_rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Type parity: the driver's hash compare is dtype-sensitive
        # (DuckDB sum(INTEGER) -> HUGEINT -> pandas float -> "1.0" != "1"
        # even when every value matches). Catch any drift here.
        res_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        rtypes = dict(zip(res_rel.columns, [str(t) for t in res_rel.types]))
        etypes = dict(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
        tdiff = {c: (rtypes.get(c), etypes.get(c))
                 for c in set(rtypes) | set(etypes)
                 if rtypes.get(c) != etypes.get(c)}
        if tdiff:
            print(f"FAIL {name}: column type drift spark!=oracle: {tdiff}")
            n_fail += 1
            continue
        rcols, rrows = rows_of(res)
        ecols, erows = rows_of(exp)
        if rcols != ecols:
            print(f"FAIL {name}: columns {rcols} != oracle {ecols}")
            n_fail += 1
            continue
        if len(rrows) != len(erows):
            print(f"FAIL {name}: {len(rrows)} rows != oracle {len(erows)}")
            n_fail += 1
            continue
        bad = near = None
        for i, (rr, er) in enumerate(zip(rrows, erows)):
            for j, (a, b) in enumerate(zip(rr, er)):
                exact, close = cmp_cell(a, b)
                if not close and bad is None:
                    bad = (i, rcols[j], a, b)
                elif close and not exact and near is None:
                    near = (i, rcols[j], a, b)
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: {bad[2]!r} != {bad[3]!r}")
            n_fail += 1
        else:
            note = f" (NEAR-MISS float: {near})" if near else ""
            print(f"PASS {name}: {len(rrows)} rows{note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
