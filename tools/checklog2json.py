#!/usr/bin/env python3
"""Convert a tools/check.py log into a driver-style CORRECTNESS json.

Usage: python3 tools/checklog2json.py <check_log> <out_json>

PASS name: N rows            -> rows/schema/hash all true
rows name: N rows (ok)       -> designated rows-only (err: no_oracle)
FAIL name: ...               -> hash_match false with the failure text
"""
import json, re, sys


def main():
    log, out = sys.argv[1], sys.argv[2]
    res = {}
    for line in open(log):
        m = re.match(r"PASS (\S+): (\d+) rows", line)
        if m:
            res[m.group(1)] = {"rows_match": True, "schema_match": True,
                               "hash_match": True,
                               "spark_rows": int(m.group(2)),
                               "oracle_rows": int(m.group(2)), "err": None}
            continue
        m = re.match(r"rows (\S+): (\d+) rows \((ok|EMPTY)\)", line)
        if m:
            res[m.group(1)] = {"rows_match": None, "schema_match": None,
                               "hash_match": None,
                               "spark_rows": int(m.group(2)),
                               "oracle_rows": None, "err": "no_oracle"}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            res[m.group(1)] = {"rows_match": False, "schema_match": False,
                               "hash_match": False, "spark_rows": None,
                               "oracle_rows": None,
                               "err": m.group(2).strip()[:300]}
    json.dump(dict(sorted(res.items())), open(out, "w"), indent=1)
    n_pass = sum(1 for v in res.values() if v["hash_match"])
    n_fail = sum(1 for v in res.values() if v["hash_match"] is False)
    n_rows = sum(1 for v in res.values() if v["err"] == "no_oracle")
    print(f"wrote {out}: {n_pass} pass, {n_fail} fail, {n_rows} rows-only")


if __name__ == "__main__":
    main()
