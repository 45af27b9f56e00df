#!/usr/bin/env python3
"""Dev-only local harness (mirrors the driver's t2 correctness gate).

Runs each DuckDB oracle from oracle_sql.json against the testdata tables
and compares with the parquet the Spark side dumped via graft.Verify.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracles.items()):
    spark_dir = f"{out}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT")); continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {e}")); continue
    # driver sorts columns by name before hashing
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"COLUMNS spark={list(got.columns)} duck={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"ROWS spark={len(got)} duck={len(exp)}")); continue
    bad = []
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if str(g.dtype).startswith("float") or str(e.dtype).startswith("float"):
                import numpy as np
                ge, ee = g.fillna(-1e308).to_numpy(dtype=float), e.fillna(-1e308).to_numpy(dtype=float)
                exact = (ge == ee).sum()
                if exact != len(g):
                    close = np.isclose(ge, ee, rtol=1e-12, atol=1e-12).sum()
                    bad.append(f"{c}: exact={exact}/{len(g)} close={close}")
            else:
                if not g.astype(str).equals(e.astype(str)):
                    n = (g.astype(str) != e.astype(str)).sum()
                    bad.append(f"{c}: {n} diffs e.g. spark={g[g.astype(str)!=e.astype(str)].head(2).tolist()} duck={e[g.astype(str)!=e.astype(str)].head(2).tolist()}")
        except Exception as ex:
            bad.append(f"{c}: compare error {ex} (dtypes {g.dtype} vs {e.dtype})")
    # dtype check (schema-level match matters for the driver's hash)
    dt = [f"{c}({got[c].dtype}!={exp[c].dtype})" for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
    if bad:
        fails.append((name, "; ".join(bad + ([f"DTYPES {dt}"] if dt else []))))
    else:
        passes.append((name, f"{len(got)} rows" + (f" DTYPE-WARN {dt}" if dt else "")))

for n, m in passes: print(f"PASS {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
