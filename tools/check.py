#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
library itself is pure Scala/Spark). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out

For each query result parquet under outDir/<name>/ it runs the matching
oracle SQL from outDir/oracle_sql.json in DuckDB (tables = views over the
sf dir) and compares: columns sorted by name, rows sorted, doubles with
tolerance.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [c for c in sorted(cols)], sorted(out, key=lambda t: tuple(str(x) for x in t))


EXACT = False


def exact_cell(x):
    """Canonical string for one pandas cell, replicating the driver's view.

    The driver reads both sides into pandas (DuckDB via .df(), Spark via
    parquet) and hashes stringified values — so DuckDB HUGEINT (e.g. an
    uncast sum(BIGINT)) arrives as float64 '5.0' while Spark LongType is
    int64 '5': a hash mismatch AT EQUAL VALUES. This replica must NOT
    normalize integer-vs-float width — that blindness let p1 stay red for
    two rounds. Array/struct cells crash the driver's sort_values
    (unhashable ndarray) and are rejected upstream in exact_frame."""
    import numpy as np
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return "<null>"
    if isinstance(x, (bool, np.bool_)):
        return str(bool(x))
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    if isinstance(x, (float, np.floating)):
        return repr(float(x))
    return str(x)


def exact_frame(name, df):
    """(cols, rows) for exact compare; raises on driver-unhashable cells."""
    import numpy as np
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, (list, tuple, dict, np.ndarray)):
                raise ValueError(
                    f"{name}.{col} carries array/struct cells — the driver's "
                    "pandas checker cannot sort/hash these (p6 crash class); "
                    "stringify the checked face")
    cols = sorted(df.columns)
    rows = sorted(tuple(exact_cell(v) for v in row)
                  for row in df[cols].itertuples(index=False, name=None))
    return cols, rows


def approx_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(approx_eq(x, y) for x, y in zip(a, b))
    return str(a) == str(b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        if EXACT:
            # Replicate the driver: both sides through pandas, where DuckDB
            # HUGEINT → float64 and Spark LongType → int64 — distinguishable
            # at equal values. No fetchall() (it erases the distinction).
            got_df = got.df()
            try:
                want_df = con.execute(oracle[name]).df()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                failures += 1
                continue
            try:
                gc, gr = exact_frame(f"{name}[spark]", got_df)
                wc, wr = exact_frame(f"{name}[oracle]", want_df)
            except ValueError as e:
                print(f"FAIL {name}: {e}")
                failures += 1
                continue
        else:
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            try:
                want = con.execute(oracle[name])
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                failures += 1
                continue
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
            gc, gr = canon(got_rows, got_cols)
            wc, wr = canon(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != oracle {wc}")
            failures += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: {len(gr)} rows != oracle {len(wr)}")
            failures += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(gr, wr)):
            if not all(approx_eq(a, b) for a, b in zip(g, w)):
                bad = (i, g, w)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got  {bad[1]}\n  want {bad[2]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(gr)} rows")
    # queries without oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        status = "OK  " if n > 0 else "FAIL"
        if n == 0:
            failures += 1
        print(f"{status} {name}: rows-only, {n} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    if "--exact" in sys.argv:
        EXACT = True
        sys.argv.remove("--exact")
    sys.exit(main(sys.argv[1], sys.argv[2]))
