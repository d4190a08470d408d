package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy queries (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipelines.{SapAnalog, SlValidation}
    import graft.ops.Relational._
    val warm = SapAnalog.eord(spark, sfDir).count()
    println(s"[profile] warmup rows=$warm")

    val valid = SlValidation.validSlQ(spark, sfDir)
    time("validSl (persisted)")(valid.count())

    def enrichWith(marcDf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val marc = marcDf(SapAnalog.marc(spark, sfDir))
      valid
        .join(marc.select(col("mp"), col("plant_status"), col("plant_spk")), Seq("mp"), "left")
        .join(broadcast(SapAnalog.spkXref(spark, sfDir)), Seq("vendor"), "left")
        .join(broadcast(SapAnalog.garPlants(spark, sfDir).select(col("plant"), col("country"))),
          Seq("plant"), "left")
    }
    time("enrich broadcast(marc)")(enrichWith(broadcast).count())
    time("enrich shuffle(marc)")(enrichWith(identity).count())
    time("enrich broadcast(marc) 2nd")(enrichWith(broadcast).count())
    time("u3 as shipped")(SparkEntry.queries("u3_main_checked")(spark, sfDir).count())
    time("j2 as shipped (cache hit)")(SparkEntry.queries("j2_apex_checked")(spark, sfDir).count())
    time("j7 as shipped (cache hit)")(SparkEntry.queries("j7_main_final")(spark, sfDir).count())
    spark.stop()
  }
}
