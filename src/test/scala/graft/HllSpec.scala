package graft

import org.apache.spark.sql.functions._

import graft.functions.HyperLogLog

/** Pins the HyperLogLog register/rank math and end-to-end estimate
  * accuracy on the real fixture. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("register and rank agree with hand-computed md5 bit math") {
    val vals = Seq("alpha", "beta", "gamma", "delta", "x1")
    val out = vals.toDF("v")
      .select(col("v"), HyperLogLog.register(col("v")), HyperLogLog.rank(col("v")))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    vals.foreach { v =>
      val h = md5hex(v)
      val expReg = java.lang.Long.parseLong(h.substring(0, 2), 16)
      val rest = java.lang.Long.parseLong(h.substring(2, 15), 16)
      val expRank =
        if (rest == 0) HyperLogLog.RankBits + 1
        else HyperLogLog.RankBits - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      assert(out(v) === ((expReg, expRank)), s"value $v hash $h")
    }
  }

  test("estimate lands within 15% of the exact distinct-token count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = graft.ops.TextAnalysis.withTokens(docs)
      .select(explode(col("toks")).as("tok"))
    val exact = toks.distinct().count().toDouble
    val regs = HyperLogLog.registerTable(toks, "tok")
      .as[(Long, Long)].collect().toSeq
    val est = HyperLogLog.estimate(regs)
    assert(regs.size <= HyperLogLog.M)
    assert(math.abs(est / exact - 1.0) < 0.15,
      s"HLL estimate $est vs exact $exact")
  }

  test("grouped sketches merge by register-max into the global sketch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = graft.ops.TextAnalysis.withTokens(docs)
      .select(col("lang"), explode(col("toks")).as("tok"))
    val grouped = HyperLogLog.groupedRegisterTable(toks, "lang", "tok")
    // per-group estimates are sane for each language
    grouped.select("lang").distinct().as[String].collect().foreach { l =>
      val regs = grouped.filter(col("lang") === l)
        .select("reg", "max_rho").as[(Long, Long)].collect().toSeq
      val exact = toks.filter(col("lang") === l)
        .select("tok").distinct().count().toDouble
      val est = HyperLogLog.estimate(regs)
      assert(math.abs(est / exact - 1.0) < 0.2, s"lang $l: $est vs $exact")
    }
    // merging all groups (max per register) reproduces the GLOBAL
    // sketch exactly — the property that makes sketches re-groupable
    val merged = grouped.groupBy(col("reg"))
      .agg(max(col("max_rho")).as("max_rho"))
      .as[(Long, Long)].collect().toSet
    val global = HyperLogLog.registerTable(toks.select(col("tok")), "tok")
      .as[(Long, Long)].collect().toSet
    assert(merged === global)
  }
}
