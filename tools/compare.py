#!/usr/bin/env python3
"""Local dev-loop replica of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each dumped
parquet against its DuckDB oracle on the same tables (row count, schema
dtypes, value hash). Dev tooling only — the engine itself has no Python
dependency."""
import sys, json, glob, os
import duckdb, pandas as pd
import pandas.util as pdu

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    if only and name not in only:
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                         ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        print(f"{name:28s} NO_ORACLE rows={len(spark_df)}")
        continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE_ERR {e}")
        fail += 1
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = odf.reindex(sorted(odf.columns), axis=1)
    for df in (s, o):  # normalize timestamp resolution (driver compares post-normalization)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
    rows = len(s) == len(o)
    schema = list(s.dtypes.astype(str)) == list(o.dtypes.astype(str))
    h1 = pdu.hash_pandas_object(s, index=False).sum() if rows and schema else None
    h2 = pdu.hash_pandas_object(o, index=False).sum() if rows and schema else None
    ok = rows and schema and h1 == h2
    if not ok:
        fail += 1
        print(f"{name:28s} FAIL rows_match={rows} ({len(s)}/{len(o)}) schema_match={schema}"
              f" hash_match={h1 == h2 if rows and schema else None}")
        if rows and not schema:
            print("   spark:", dict(s.dtypes.astype(str)))
            print("   oracle:", dict(o.dtypes.astype(str)))
    else:
        print(f"{name:28s} ok rows={len(s)}")
sys.exit(1 if fail else 0)
