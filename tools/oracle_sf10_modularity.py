#!/usr/bin/env python3
"""Staged big-SF oracle for community_modularity.

The one-statement oracle (SparkEntry.oracleSql) is what the driver
runs at sf0.01, where it's fine. At sf10 DuckDB's single-statement
plan for the same SQL (the LPA CTE chain referenced by four
downstream CTEs) spilled >66 GB to temp before being killed — the
same planner-materializes-the-multi-referenced-CTE pathology the sf1
triangles oracle hit (tools/oracle_sf1_triangles.py). Staging the
SAME algebra through temp tables (e → l1 → l2 → deg/dc/ec → one
final read-out) runs spill-free.

Usage: python3 tools/oracle_sf10_modularity.py <sfDir> <sparkOutDir>
  <sparkOutDir> is Verify's outDir containing
  community_modularity/*.parquet
"""
import sys, time, glob, os
import duckdb
import pandas as pd

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='50GB'")
    con.execute("SET threads=16")
    con.execute("SET preserve_insertion_order=false")
    p = f"{sf_dir}/lineitem.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{p}'")

    def step(name, sql):
        t0 = time.time()
        con.execute(sql)
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        print(f"{name}: rows={n} secs={time.time()-t0:.1f}", flush=True)

    # directed symmetric distinct co-order edges — the SQL oracle's `e`
    step('e', """CREATE TABLE e AS
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey""")
    # LPA round 1 from identity labels: count per neighbor label is
    # 1 for every (src, dst) edge, so the argmax degenerates to the
    # MIN neighbor id — same algebra, no 2.4e8-row count relation
    step('l1', """CREATE TABLE l1 AS
      SELECT src AS node, min(dst) AS lbl FROM e GROUP BY 1""")
    step('c2', """CREATE TABLE c2 AS
      SELECT e.src, l1.lbl, count(*) AS c
      FROM e JOIN l1 ON e.dst = l1.node GROUP BY 1, 2""")
    step('l2', """CREATE TABLE l2 AS
      SELECT src AS node, lbl FROM (
        SELECT *, row_number() OVER (PARTITION BY src
          ORDER BY c DESC, lbl) AS rk FROM c2) t WHERE rk = 1""")
    step('und', """CREATE TABLE und AS
      SELECT src AS u, dst AS v FROM e WHERE src < dst""")
    step('deg', """CREATE TABLE deg AS
      SELECT src AS node, CAST(count(*) AS BIGINT) AS dg
      FROM e GROUP BY 1""")
    step('dc', """CREATE TABLE dc AS
      SELECT l2.lbl, CAST(sum(dg) AS BIGINT) AS d_c,
        CAST(count(*) AS BIGINT) AS n_members
      FROM l2 JOIN deg ON l2.node = deg.node GROUP BY 1""")
    step('ec', """CREATE TABLE ec AS
      SELECT la.lbl, CAST(count(*) AS BIGINT) AS e_c
      FROM und JOIN l2 la ON und.u = la.node
      JOIN l2 lb ON und.v = lb.node
      WHERE la.lbl = lb.lbl GROUP BY 1""")
    duck = con.execute("""
      WITH mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
      per AS (SELECT dc.lbl, dc.d_c, dc.n_members,
         CAST(coalesce(ec.e_c, 0) AS BIGINT) AS e_c
        FROM dc LEFT JOIN ec ON dc.lbl = ec.lbl),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_communities,
         CAST(sum(n_members) AS BIGINT) AS n_nodes,
         CAST(sum(e_c) AS BIGINT) AS intra_edges,
         CAST(sum(d_c * d_c) AS BIGINT) AS sum_d2
        FROM per)
      SELECT n_communities, n_nodes, m AS m_edges, intra_edges,
       round(CAST(intra_edges AS DOUBLE) / m, 6) AS intra_fraction,
       round(CAST(4 * m * intra_edges - sum_d2 AS DOUBLE)
         / (4.0 * CAST(m AS DOUBLE) * m), 6) AS modularity
      FROM agg CROSS JOIN mm""").df()

    files = glob.glob(f"{out_dir}/community_modularity/*.parquet")
    spark = pd.concat([pd.read_parquet(f) for f in files])

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    s, d = canon(spark), canon(duck)
    if s.shape != d.shape:
        print(f"SHAPE    community_modularity: spark={s.shape} duck={d.shape}")
        sys.exit(1)
    pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
    print(f"OK       community_modularity rows={len(s)}")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
