#!/usr/bin/env python3
"""Oracle-compare a SUBSET of queries (iteration aid for optimization
rounds; the full gate stays tools/verify_local.py). Runs graft.Verify
restricted to the named queries, then DuckDB-compares exactly those.

Usage: python3 tools/verify_subset.py <sfdir> <outdir> <query> [query ...]
       (append --skip-run to reuse an existing <outdir>)
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if a != "--skip-run"]
SF, OUT, names = args[0], args[1], args[2:]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-run" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {" ".join(names)}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write("\n".join(r.stdout.splitlines()[-3:]) + "\n")
    if r.returncode != 0:
        sys.stdout.write(r.stderr[-3000:])
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if Path(p).exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return a == b


fails = 0
for name in names:
    if name not in oracle:
        print(f"FAIL {name}: not in oracle_sql.json"); fails += 1; continue
    spark_dir = Path(f"{OUT}/{name}")
    if not spark_dir.exists():
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = canon(pd.read_parquet(spark_dir))
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    bad = None
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if not cell_eq(a, b):
                bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: {c}[{i}] spark={a!r} oracle={b!r}"); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

print(f"{len(names) - fails}/{len(names)} subset queries match")
sys.exit(1 if fails else 0)
