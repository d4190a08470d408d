package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface: registers every fixture table as a temp view so
  * users can drive the engine through `spark.sql(...)` instead of the
  * DataFrame API (the reference's users live in tabular tools; SQL is
  * the lingua franca the engine must speak). Views are lazy — a
  * registration costs nothing until a query scans it, and Catalyst
  * plans SQL and DataFrame queries identically. */
object Catalog {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Registers all fixture tables of `dir` as temp views. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    TableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case "lineitem" => Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
      case n => Tables.read(spark, dir, n).createOrReplaceTempView(n)
    }

  /** The x41 query text — ONE definition for both engines (the SQL is
    * dialect-neutral, so Spark runs it verbatim and the DuckDB oracle
    * references the same constant; two copies could drift). */
  val TopSupplierSql: String =
    """SELECT n_name, s_suppkey, sum_qty, CAST(rnk AS BIGINT) AS rnk FROM (
      |  SELECT n.n_name, s.s_suppkey,
      |         CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |         ROW_NUMBER() OVER (PARTITION BY n.n_name
      |           ORDER BY SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) DESC, s.s_suppkey) AS rnk
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY n.n_name, s.s_suppkey)
      |WHERE rnk <= 3""".stripMargin

  /** x41: a query authored in pure SQL over the registered views —
    * top supplier per nation by shipped quantity (join + aggregate +
    * window rank), proving the SQL surface plans exactly like the
    * DataFrame API (same Catalyst pipeline, same oracle discipline). */
  def topSupplierPerNation(spark: SparkSession, dir: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(TopSupplierSql)
  }
}
