#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
output written by `graft.Verify <sfDir> <outDir>`, run the oracle SQL
from oracle_sql.json in DuckDB over the same parquet tables and compare
values (columns sorted by name, exact match after normalization).

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        got = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"  {name}: rows-only ({len(got)} rows)" +
                  ("  !! EMPTY" if len(got) == 0 else ""))
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"X {name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"X {name}: column mismatch {list(g.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"X {name}: row count {len(g)} vs {len(e)}")
            failures += 1
            continue
        mismatched = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    ok = ((a - b).abs() < 1e-12) | (a.isna() & b.isna()) | (a == b)
                else:
                    ok = (a == b) | (a.isna() & b.isna())
                if not ok.all():
                    mismatched.append((c, int((~ok).sum())))
            except Exception as ex:
                mismatched.append((c, f"cmp-error {ex}"))
        if mismatched:
            print(f"X {name}: value mismatches {mismatched}")
            for c, _ in mismatched[:2]:
                bad = (g[c] != e[c])
                print("   got:", g[bad].head(3).to_dict("records"))
                print("   exp:", e[bad].head(3).to_dict("records"))
            failures += 1
        else:
            dtypes_note = ""
            for c in g.columns:
                if str(g[c].dtype) != str(e[c].dtype):
                    dtypes_note += f" [dtype {c}: {g[c].dtype} vs {e[c].dtype}]"
            print(f"  {name}: OK ({len(g)} rows){dtypes_note}")
    print("FAILURES:", failures)
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
