#!/usr/bin/env python3
"""Dev harness: mimic the driver's DuckDB-oracle correctness gate locally.

Usage: python3 tools/local_verify.py <sfDir> <outDir> [--skip-spark] [query...]

1. Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-spark).
2. Registers each testdata parquet as a DuckDB view, runs every oracle SQL
   from <outDir>/oracle_sql.json, and compares against the Spark parquet
   dump: columns sorted by name, rows sorted, values compared exactly.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [c for c in sorted(cols)], out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_spark = "--skip-spark" in sys.argv
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])

    if not skip_spark:
        r = subprocess.run(
            ["sbt", "-batch",
             " ".join(["runMain graft.Verify", sf_dir, out_dir] + sorted(only))],
            capture_output=True, text=True, cwd=Path(__file__).parent.parent)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    declared = sorted(oracle)
    for name in declared:
        if only and name not in only:
            continue
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            orel = con.sql(oracle[name])
            o_cols = list(orel.columns)
            o_types = {c: str(t) for c, t in zip(orel.columns, orel.types)}
            o_rows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        srel = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'")
        s_cols = list(srel.columns)
        s_types = {c: str(t) for c, t in zip(srel.columns, srel.types)}
        s_rows = srel.fetchall()

        # The driver's hasher is type-sensitive (round-6 lesson: DuckDB
        # sum(BIGINT) returns HUGEINT, which hash-mismatches Spark's
        # BIGINT even when values are identical). HUGEINT/DECIMAL in an
        # oracle output column can never match a Spark parquet dump, so
        # that's a hard fail here; any other type drift is a warning.
        huge = [c for c, t in o_types.items()
                if "HUGEINT" in t or "DECIMAL" in t]
        if huge:
            print(f"FAIL {name}: oracle output types Spark can't emit "
                  f"(cast them): {[(c, o_types[c]) for c in huge]}")
            n_fail += 1
            continue
        drift = [c for c in o_types
                 if c in s_types and o_types[c] != s_types[c]]
        if drift:
            print(f"WARN {name}: type drift "
                  f"{[(c, s_types[c], o_types[c]) for c in drift]}")

        oc, orows = norm_rows(o_cols, o_rows)
        sc, srows = norm_rows(s_cols, s_rows)
        if oc != sc:
            print(f"FAIL {name}: columns {sc} vs oracle {oc}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(orows)} row mismatches; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(declared)} declared")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
