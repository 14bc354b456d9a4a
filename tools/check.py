#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check.py <sfDir> <verifyOutDir> [<summaryJsonPath>]

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with views named after the
parquet tables in <sfDir>. Sorts columns by name, sorts rows, compares
cell values exactly (floats via repr). Prints PASS/FAIL per query.

With a third argument, ALSO writes a first-party correctness record in
the driver's CORRECTNESS_rN schema (per query: rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err) — the committed artifact the
r12 verdict asked for after the driver's own record shipped as an empty
`{}` and nothing noticed. The write is guarded: an empty summary while
the oracle registry is non-empty is a hard error (exit 2), never a
silently-blank file.
"""
import json, math, os, sys
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    a_f = isinstance(a, (float, np.floating))
    b_f = isinstance(b, (float, np.floating))
    a_i = isinstance(a, (int, np.integer)) and not isinstance(a, bool)
    b_i = isinstance(b, (int, np.integer)) and not isinstance(b, bool)
    # Type-strict across the int/float divide: the driver hashes the
    # serialized values, so DuckDB widening SUM(BIGINT) -> HUGEINT ->
    # float ("1435.0") mismatches Spark's long ("1435") even when the
    # numeric values agree. Coercing here (the pre-r8 behavior) made
    # the local board lie green while the driver board was red.
    if (a_f and b_i) or (a_i and b_f):
        return False
    if a_f and b_f:
        if math.isnan(a) and math.isnan(b):
            return True
        return float(a) == float(b)
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str, summary_path=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    summary = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        summary[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            # rows_match means "matches oracle"; a rows-only query has
            # no oracle, so record null (not a redefined non-empty
            # check that would trip CorrectnessArtifactSpec's
            # rows_match:false scan on a legitimately-empty output).
            print(f"[rows-only] {name}: rows={len(got)}")
            record(name, None, None, None, len(got), None,
                   "rows-only: no oracle SQL registered")
            summary[name]["non_empty"] = len(got) > 0
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, False, False, False, len(got), None,
                   f"oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            record(name, len(g) == len(e), False, False, len(g), len(e),
                   f"columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            record(name, False, True, False, len(g), len(e), None)
            n_fail += 1
            continue
        bad = None
        for i in range(len(g)):
            for c in g.columns:
                if not cells_equal(g[c].iloc[i], e[c].iloc[i]):
                    bad = (i, c, g[c].iloc[i], e[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duckdb={bad[3]!r}")
            record(name, True, True, False, len(g), len(e),
                   f"row {bad[0]} col {bad[1]}: "
                   f"spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            record(name, True, True, True, len(g), len(e), None)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if summary_path is not None:
        # Loud guard (r12 verdict What's-wrong #1): a correctness file
        # that parses empty while the registry is non-empty must FAIL,
        # not commit. `oracle` is the registry's own dump, so an empty
        # summary here means Verify produced no query dirs at all.
        if not summary and oracle:
            print(f"REFUSING to write empty summary {summary_path}: "
                  f"{len(oracle)} oracle queries registered but no "
                  f"Verify output directories found", file=sys.stderr)
            return 2
        tmp = summary_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
            f.write("\n")
        os.replace(tmp, summary_path)
        print(f"wrote {summary_path}: {len(summary)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
