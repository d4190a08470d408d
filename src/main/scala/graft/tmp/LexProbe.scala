package graft.tmp
import org.apache.spark.sql.SparkSession
import graft.ops.{Caching, Search}

/** Scratch A/B for the x198 lexical-leg term cap (deleted before commit). */
object LexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(l: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $l%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    for (pass <- 1 to 2) {
      t(s"p$pass lex capped (16)")(
        Search.docProbeBm25(docs).write.format("noop").mode("overwrite").save())
      Caching.reapTemps()
      t(s"p$pass lex uncapped")(
        Search.docProbeBm25(docs, termCap = Int.MaxValue)
          .write.format("noop").mode("overwrite").save())
      Caching.reapTemps()
    }
    spark.stop()
  }
}
