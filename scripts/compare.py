#!/usr/bin/env python3
"""Local imitation of the driver's DuckDB-oracle compare.

Registers every testdata parquet as a DuckDB view named after the table,
runs each oracle_sql.json entry, and compares against the Spark parquet
dump (columns sorted by name, rows sorted, values hashed after a light
normalization of floats/timestamps). Exit code 1 if any query mismatches.
"""
import json
import sys
import duckdb
import pandas as pd
import numpy as np
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str, only: str = "") -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only:
        # same prefix filter graft.Verify applies to its dump: compare
        # only what ran instead of FAILing every skipped gate
        prefixes = [p for p in only.split(",") if p]
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}
    failures = 0
    for name in sorted(oracle):
        pdir = Path(out_dir) / name
        if not pdir.exists():
            print(f"FAIL {name}: spark output missing")
            failures += 1
            continue
        try:
            got = norm(pd.read_parquet(pdir))
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            if pd.api.types.is_float_dtype(g) != pd.api.types.is_float_dtype(w):
                # the driver hashes raw values: 0 vs 0.0 is a hash miss even
                # when isclose passes (e.g. DuckDB HUGEINT sums -> float64)
                bad = (c, f"dtype {g.dtype} vs {w.dtype}")
                break
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
                eq = np.isclose(g.astype(float), w.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = eq.all()
                close = np.isclose(g.astype(float), w.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True).all()
                if not exact:
                    bad = (c, "float-exact" if close else "float-diff")
                    break
            else:
                if not g.equals(w):
                    bad = (c, "value")
                    break
        if bad:
            print(f"FAIL {name}: column {bad[0]} mismatch ({bad[1]})")
            i = int(np.argmax(~(got[bad[0]].values == want[bad[0]].values)))
            print(f"  first diff row {i}: spark={got.iloc[i].to_dict()} duckdb={want.iloc[i].to_dict()}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    queries_no_oracle = [d.name for d in Path(out_dir).iterdir() if d.is_dir() and d.name not in oracle]
    for name in sorted(queries_no_oracle):
        n = len(pd.read_parquet(Path(out_dir) / name))
        print(f"ROWS {name}: {n} rows (no oracle)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else ""))
