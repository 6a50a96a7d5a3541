#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Mimics the driver: for every parquet result dumped by graft.Verify, run the
corresponding oracle SQL in DuckDB over the same sf directory's tables, sort
columns by name, and compare row-by-row. Exact equality for ints/strings,
bit-equality for floats (report near-misses separately).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got_s = got.reindex(sorted(got.columns), axis=1)
        exp_s = exp.reindex(sorted(exp.columns), axis=1)
        ok = True
        msgs = []
        # dtype KIND must agree: the driver hashes stringified values, so a
        # DuckDB HUGEINT (pandas float64: "3.0") vs Spark BIGINT ("3")
        # hash-mismatches even when pandas == says equal. int32 vs int64 is
        # fine (same repr); float-vs-int or object-vs-numeric is not.
        for c in set(got_s.columns) & set(exp_s.columns):
            gk, ek = got_s[c].dtype.kind, exp_s[c].dtype.kind
            if gk != ek and not ({gk, ek} <= {"i", "u"}):
                ok = False
                msgs.append(f"dtype kind of {c}: spark={got_s[c].dtype} "
                            f"oracle={exp_s[c].dtype} (driver hash differs)")
        if list(got_s.columns) != list(exp_s.columns):
            ok = False
            msgs.append(f"columns {list(got_s.columns)} != {list(exp_s.columns)}")
        elif len(got_s) != len(exp_s):
            ok = False
            msgs.append(f"rowcount {len(got_s)} != {len(exp_s)}")
        else:
            gr = got_s.values.tolist()
            er = exp_s.values.tolist()
            for i, (g, e) in enumerate(zip(gr, er)):
                for j, (a, b) in enumerate(zip(g, e)):
                    if a is None and b is None:
                        continue
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        if a == b and repr(a) != repr(b):
                            # -0.0 == 0.0 but the driver hashes the repr
                            ok = False
                            msgs.append(
                                f"row {i} col {got_s.columns[j]}: {a!r} != {b!r} (signed zero)")
                        if a != b:
                            close = math.isclose(a, b, rel_tol=1e-9)
                            ok = False
                            msgs.append(
                                f"row {i} col {got_s.columns[j]}: {a!r} != {b!r}"
                                + (" (close)" if close else ""))
                    elif a != b:
                        ok = False
                        msgs.append(f"row {i} col {got_s.columns[j]}: {a!r} != {b!r}")
                    if len(msgs) > 4:
                        break
                if len(msgs) > 4:
                    break
        if ok:
            n_pass += 1
            print(f"[PASS     ] {name}: {len(got_s)} rows")
        else:
            n_fail += 1
            print(f"[FAIL     ] {name}: " + "; ".join(msgs[:5]))
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
