#!/usr/bin/env python3
"""Staged sf1 oracle for graph_triangles.

The one-statement oracle (SparkEntry.oracleSql) is what the driver
runs at sf0.01, where it's fine. At sf1 DuckDB's single-statement
plan for the same SQL spills >45 GB to temp and dies on tmp-disk
exhaustion (observed with BOTH the wedge-join and the
adjacency-list/list_intersect formulations, with memory_limit=60GB,
preserve_insertion_order=false, and join_order pinned — the planner
materializes the multi-referenced CTE chain pathologically).

Staging the SAME algebra through temp tables (op -> e -> orient ->
one streaming wedge-closure pass) runs in ~16 s with ZERO temp spill,
so this script is the sf1 correctness gate for triangles: it computes
the identical math and compares against the Spark output parquet.

Usage: python3 tools/oracle_sf1_triangles.py <sfDir> <sparkOutDir>
  <sparkOutDir> is Verify's outDir containing graph_triangles/*.parquet
"""
import sys, time, glob
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='50GB'")
    con.execute("SET threads=16")
    con.execute("SET preserve_insertion_order=false")
    p = f"{sf_dir}/lineitem.parquet"
    import os
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{p}'")

    def step(name, sql):
        t0 = time.time()
        con.execute(sql)
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"{name}: rows={n} secs={time.time()-t0:.1f}", flush=True)

    step('op', """CREATE TABLE op AS
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem""")
    step('e', """CREATE TABLE e AS
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p""")
    step('orient', """CREATE TABLE orient AS
      WITH d AS (SELECT node, count(*) AS dg FROM (
         SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) nn
        GROUP BY 1)
      SELECT
       CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v) THEN u ELSE v END AS src,
       CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v) THEN v ELSE u END AS dst
      FROM e JOIN d du ON e.u = du.node JOIN d dv ON e.v = dv.node""")
    # the wedge stream probes the e hash (build side = the edge table)
    # and feeds the per-corner count aggregate in one streaming pass
    step('pn', """CREATE TABLE pn AS
      WITH w AS (SELECT x.src AS a, x.dst AS n1, y.dst AS n2
        FROM orient x JOIN orient y ON x.src = y.src AND x.dst < y.dst),
      tri AS (SELECT a, n1, n2 FROM w JOIN e ON w.n1 = e.u AND w.n2 = e.v)
      SELECT node AS p_partkey, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT a AS node FROM tri UNION ALL SELECT n1 FROM tri
            UNION ALL SELECT n2 FROM tri) t GROUP BY 1""")
    duck = con.execute("""SELECT p_partkey, n_triangles,
     CAST(row_number() OVER (ORDER BY n_triangles DESC, p_partkey) AS INT) AS rank
    FROM pn ORDER BY rank LIMIT 20""").df()

    files = glob.glob(f"{out_dir}/graph_triangles/*.parquet")
    spark = pd.concat([pd.read_parquet(f) for f in files])

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    s, d = canon(spark), canon(duck)
    if s.shape != d.shape:
        print(f"SHAPE    graph_triangles: spark={s.shape} duck={d.shape}")
        sys.exit(1)
    pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
    print(f"OK       graph_triangles rows={len(s)}")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
