#!/usr/bin/env python3
"""Staged big-SF oracle for graph_adamic_adar.

Same story as tools/oracle_sf10_modularity.py: the one-statement
oracle is the driver's sf0.01 gate, but at sf10 DuckDB's plan for it
exhausts temp disk materializing the multi-referenced sym/e CTE
chain. Staged through temp tables the same algebra runs spill-free —
the wedge stream itself is only |Q|·d̄² rows (degrees are scale-free
in this corpus), so every step after `e` is small.

Usage: python3 tools/oracle_sf10_adamic_adar.py <sfDir> <sparkOutDir>
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

    step('op', """CREATE TABLE op AS
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem""")
    step('e', """CREATE TABLE e AS
      SELECT a.p AS u, b.p AS v FROM op a
      JOIN op b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2""")
    step('sym', """CREATE TABLE sym AS
      SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e""")
    step('deg', """CREATE TABLE deg AS
      SELECT s AS node, CAST(count(*) AS BIGINT) AS dg
      FROM sym GROUP BY 1""")
    step('q', """CREATE TABLE q AS
      SELECT node AS a, dg AS deg_a FROM deg
      ORDER BY dg DESC, node LIMIT 50""")
    step('sc', """CREATE TABLE sc AS
      WITH w AS (SELECT q.a, q.deg_a, s1.d AS c, s2.d AS b
        FROM q JOIN sym s1 ON s1.s = q.a
        JOIN sym s2 ON s2.s = s1.d
        WHERE s2.d <> q.a),
      ww AS (SELECT w.a, w.deg_a, w.b,
         CAST(round(1000000.0 / ln(dc.dg), 0) AS BIGINT) AS w_u6
        FROM w JOIN deg dc ON dc.node = w.c)
      SELECT a, deg_a, b, CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(w_u6) AS BIGINT) AS aa_u6
      FROM ww GROUP BY 1, 2, 3""")
    duck = con.execute("""
      WITH nonadj AS (SELECT sc.* FROM sc
        LEFT JOIN sym ON sym.s = sc.a AND sym.d = sc.b
        WHERE sym.s IS NULL),
      jb AS (SELECT nonadj.*, db.dg AS deg_b FROM nonadj
        JOIN deg db ON db.node = nonadj.b),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY a
         ORDER BY aa_u6 DESC, b) AS INT) AS rank FROM jb)
      SELECT a AS p_partkey, b AS candidate, n_common,
       round(n_common * 1.0 / (deg_a + deg_b - n_common), 6) AS jaccard,
       round(aa_u6 / 1000000.0, 6) AS adamic_adar, rank
      FROM r WHERE rank <= 3 ORDER BY p_partkey, rank""").df()

    files = glob.glob(f"{out_dir}/graph_adamic_adar/*.parquet")
    spark = pd.concat([pd.read_parquet(f) for f in files])

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    s, d = canon(spark), canon(duck)
    if s.shape != d.shape:
        print(f"SHAPE    graph_adamic_adar: spark={s.shape} duck={d.shape}")
        sys.exit(1)
    pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
    print(f"OK       graph_adamic_adar rows={len(s)}")

if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])
