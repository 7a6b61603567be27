#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads Verify output (outDir/<name>/ parquet + oracle_sql.json), runs
each oracle SQL in DuckDB over the same sf dir, and compares
column-name-sorted, row-sorted values exactly. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # optional caps so the gate can coexist with a Spark bench run
    # (the r8 sf1 gate OOM'd 59 queries when sbt test ran alongside)
    import os
    if os.environ.get("DUCKDB_MEMLIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMLIMIT']}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_NO_ORDER"):
        # big streaming pipelines (unnest-over-join) buffer entire
        # intermediates when insertion order must be preserved; every
        # oracle ends in an explicit ORDER BY, so order is free to drop
        con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # driver testdata ships single-file tables; Spark-written SF
        # dirs (e.g. the local sf1) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    import os, time
    # ORACLE_ONLY / ORACLE_SKIP: comma-separated name filters so big-SF
    # gates can stage the DuckDB-infeasible oracles (quadratic matcher
    # SQL, planner-spill CTE chains) through tools/oracle_sf*_*.py
    # instead of hanging the whole gate
    only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
    skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in skip:
            continue
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); n_bad += 1; continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"READERR  {name}: {e}"); n_bad += 1; continue
        try:
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"SQLERR   {name}: {str(e)[:200]}"); n_bad += 1; continue
        if spark_df.shape != duck_df.shape:
            print(f"SHAPE    {name}: spark={spark_df.shape} duck={duck_df.shape}")
            print(f"  spark cols: {list(spark_df.columns)}\n  duck cols:  {list(duck_df.columns)}")
            n_bad += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"COLS     {name}: {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                          check_exact=True)
            # dtype report (driver may be stricter)
            dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                  for c in spark_df.columns
                  if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
            flag = f"  dtypes differ: {dt}" if dt else ""
            print(f"OK       {name} rows={len(spark_df)}{flag} ({time.time()-t0:.1f}s)",
                  flush=True)
            n_ok += 1
        except AssertionError as e:
            print(f"VALUES   {name}: {str(e).splitlines()[0]}")
            # show first differing rows
            neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad_rows = neq.any(axis=1)
            print(pd.concat([spark_df[bad_rows].head(3).add_prefix('s_'),
                             duck_df[bad_rows].head(3).add_prefix('d_')], axis=1).to_string())
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
