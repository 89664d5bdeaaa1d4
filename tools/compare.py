#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the same
test tables, and compares: column names (sorted), column TYPES (the
driver's hash is type-aware — an uncast DuckDB sum() returns HUGEINT and
hash-mismatches a value-identical Spark BIGINT), row counts, and every
value (exact; floats compared bitwise via repr). Dev tool only — not part
of the shipped library.
"""
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    # Optional resume support: COMPARE_SKIP_FILE lists query names (one
    # per line) to skip — lets a long replay resume after an oracle-SQL
    # hardening without re-running the already-passed set.
    skip = set()
    sf = os.environ.get("COMPARE_SKIP_FILE")
    if sf:
        skip = {l.strip() for l in open(sf) if l.strip()}
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got_rel.columns]
            got = norm_rows(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = norm_rows(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            results[name] = {"pass": False, "detail": f"exception: {e}"}
            n_fail += 1
            continue
        got_types = {c: str(t) for c, t in zip(got_cols, got_rel.types)}
        exp_types = {c: str(t) for c, t in zip(exp_cols, exp_rel.types)}
        type_diff = {
            c: (got_types[c], exp_types[c])
            for c in got_types
            if c in exp_types and got_types[c] != exp_types[c]
        }
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            results[name] = {"pass": False, "detail": "column mismatch"}
            n_fail += 1
        elif type_diff:
            detail = ", ".join(
                f"{c}: spark={a} oracle={b}" for c, (a, b) in sorted(type_diff.items())
            )
            print(f"FAIL {name}: column types differ ({detail})")
            results[name] = {"pass": False, "detail": f"types: {detail}"}
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            results[name] = {"pass": False, "detail": f"rows {len(got)} vs {len(exp)}"}
            n_fail += 1
        elif got != exp:
            bad = next(i for i, (a, b) in enumerate(zip(got, exp)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark : {got[bad]}")
            print(f"  oracle: {exp[bad]}")
            results[name] = {"pass": False, "detail": f"value diff at sorted row {bad}"}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            results[name] = {"pass": True, "rows": len(got)}
            n_pass += 1
    # Queries dumped by Verify with NO oracle SQL are rows-only BY DESIGN
    # (e.g. events_approx_users: approximate counts have no deterministic
    # SQL oracle). Emit a TYPED record — "rows_only": true with the row
    # count — so the artifact distinguishes by-design from broken: a
    # future regression that drops the dump (or its rows) shows up as
    # rows 0 / a missing entry, not as the same shape as the designed
    # state.
    n_rows_only = 0
    for name in sorted(os.listdir(out_dir)):
        if name in oracle or name in skip or name.startswith("oracle_sql"):
            continue
        if not os.path.isdir(os.path.join(out_dir, name)):
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: rows-only dump unreadable: {e}")
            results[name] = {"pass": False, "rows_only": True, "detail": f"exception: {e}"}
            n_fail += 1
            continue
        ok = n > 0
        print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only by design, {n} rows)")
        results[name] = {"pass": ok, "rows_only": True, "rows": n}
        n_rows_only += 1
        # rows-only passes COUNT in n_pass (flagged by rows_only in the
        # per-query record) — the committed CORRECTNESS_sf1.json format;
        # previously they were counted in neither total, so a
        # regenerated artifact showed a spurious n_pass drop.
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass ({n_rows_only} rows-only), {n_fail} fail ==")
    # Optional machine-readable artifact (COMPARE_JSON_OUT=<path>):
    # query -> pass/rows|detail, plus the run header — the committed
    # evidence format for off-driver replays (e.g. native sf1).
    out = os.environ.get("COMPARE_JSON_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_rows_only": n_rows_only,
                       "skipped": sorted(skip), "queries": results},
                      fh, indent=1, sort_keys=True)
        print(f"json -> {out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
