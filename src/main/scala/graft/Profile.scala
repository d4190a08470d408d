package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy queries (dev tool). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events ts (ns)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup._
    import graft.ops.TextAnalysis
    import graft.pipelines.{SapAnalog, SlValidation}
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup")(noop(SapAnalog.eord(spark, sfDir)))

    // ---- x5 variants ----
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def bands = docShingles(docs)
      .select(col("doc_id"), col("sh"),
        posexplode(bandHashes(minhashSignature(col("sh")))).as(Seq("band_idx", "band_hash")))
    def pairs(b: org.apache.spark.sql.DataFrame, hint: String) = {
      val l = if (hint.isEmpty) b.alias("l") else b.alias("l").hint(hint)
      val r = if (hint.isEmpty) b.alias("r") else b.alias("r").hint(hint)
      l.join(r,
          col("l.band_idx") === col("r.band_idx") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          jaccard(col("l.sh"), col("r.sh")).as("jaccard"))
        .filter(col("jaccard") >= 0.5).distinct()
    }
    val bp = bands.persist(); bp.count()
    time("x5 pairs broadcast (default)")(noop(pairs(bp, "")))
    time("x5 pairs shuffle_hash")(noop(pairs(bp, "shuffle_hash")))
    time("x5 pairs merge")(noop(pairs(bp, "merge")))
    bp.unpersist()

    // ---- u3 variants ----
    val gar = SapAnalog.garPlants(spark, sfDir)
    def validNoPersist = {
      val e = SapAnalog.eord(spark, sfDir)
      SlValidation.validSl(e, SlValidation.invalidSl(e), SlValidation.plantsOos(e, gar))
    }
    def checkedFrom(v: org.apache.spark.sql.DataFrame) =
      SlValidation.mainRulesI(SlValidation.enrich(
        v, SapAnalog.marc(spark, sfDir), SapAnalog.spkXref(spark, sfDir), gar))
    time("u3 no persists")(noop(checkedFrom(validNoPersist)))
    time("u3 as shipped (cold-ish)")(noop(SparkEntry.queries("u3_main_checked")(spark, sfDir)))
    time("u3 as shipped (cache hit)")(noop(SparkEntry.queries("u3_main_checked")(spark, sfDir)))

    // ---- f3_missing_sl decomposition ----
    val marc = SapAnalog.marc(spark, sfDir)
    time("f3: marc materialize")(noop(marc))
    val inScope = graft.ops.Relational.semiJoin(marc,
        broadcast(gar.filter(col("spk_sl_project") === "Yes")), Seq("plant"))
      .join(SapAnalog.mara(spark, sfDir).select(col("material"), col("material_type")),
        Seq("material"), "left")
      .filter(col("material_type").isin("FERT", "HAWA", "ZICP"))
      .filter(col("plant_status") === "50")
    time("f3: inScope (marc cached)")(noop(inScope))
    val valid = SlValidation.validSlQ(spark, sfDir)
    time("f3: valid pipeline alone")(noop(valid))
    time("f3: anti join (all cached)")(noop(
      graft.ops.Relational.antiJoin(inScope, valid, Seq("mp"))))
    time("f3: as shipped")(noop(SparkEntry.queries("f3_missing_sl")(spark, sfDir)))
    spark.stop()
  }
}
