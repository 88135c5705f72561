package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: which advanced SQL surfaces does this Spark build support?
  * (recursive CTEs landed in Spark 4.0, lateral joins in 3.2 — confirm
  * before adding inventory queries that rely on them). */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(name: String, sql: String): Unit =
      try {
        val n = spark.sql(sql).count()
        println(s"PROBE $name: OK ($n rows)")
      } catch { case e: Throwable =>
        println(s"PROBE $name: FAIL ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).linesIterator.take(1).mkString)
      }
    probe("recursive_cte",
      """WITH RECURSIVE r(n) AS (
           SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
         SELECT * FROM r""")
    probe("lateral_join",
      """SELECT * FROM VALUES (1), (2) AS t(a),
         LATERAL (SELECT a * 2 AS b)""")
    probe("qualify", // DuckDB has QUALIFY; does Spark?
      """SELECT a FROM VALUES (1), (2) AS t(a)
         QUALIFY row_number() OVER (ORDER BY a) = 1""")
    // the exact q88 shape: recursive closure with UNION-distinct over a
    // derived edge CTE, aggregation + window after recursion
    spark.sql("SELECT * FROM VALUES (1L, 2L), (2L, 3L), (5L, 6L) AS p(doc_a, doc_b)")
      .createOrReplaceTempView("probe_pairs")
    probe("recursive_closure",
      """WITH RECURSIVE edges AS (
           SELECT doc_a AS s, doc_b AS e FROM probe_pairs
           UNION ALL SELECT doc_b, doc_a FROM probe_pairs),
         reach(src, node) AS (
           SELECT s, s FROM (SELECT DISTINCT s FROM edges)
           UNION
           SELECT r.src, g.e FROM reach r JOIN edges g ON r.node = g.s),
         labels AS (
           SELECT src AS doc_id, min(node) AS cluster_id
           FROM reach GROUP BY src)
         SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         FROM labels ORDER BY doc_id""")
    // cycle-safe closure: UNION ALL + visited-path accumulation
    probe("recursive_closure_path",
      """WITH RECURSIVE edges AS (
           SELECT doc_a AS s, doc_b AS e FROM probe_pairs
           UNION ALL SELECT doc_b, doc_a FROM probe_pairs),
         reach(src, node, path) AS (
           SELECT s, s, array(s) FROM (SELECT DISTINCT s FROM edges)
           UNION ALL
           SELECT r.src, g.e, array_append(r.path, g.e)
           FROM reach r JOIN edges g
             ON r.node = g.s AND NOT array_contains(r.path, g.e)),
         labels AS (
           SELECT src AS doc_id, min(node) AS cluster_id
           FROM reach GROUP BY src)
         SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         FROM labels ORDER BY doc_id""")
    // the exact q89 shape: correlated LATERAL with ORDER BY + LIMIT
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .createOrReplaceTempView("probe_customer")
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .createOrReplaceTempView("probe_nation")
    probe("lateral_topk",
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM probe_nation n,
         LATERAL (SELECT c_name, round(c_acctbal, 2) AS c_acctbal
                  FROM probe_customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
    spark.stop()
  }
}
