package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.rules.RuleCascade
import graft.rules.RuleCascade.Rule

/** Pins the cascade semantics from SURVEY.md §2.8 + §5.2-3:
  * in-order application, guarded first-match-wins, deliberate unguarded
  * overwrites, and null-condition rows not firing (pandas NaN-mask ==
  * Spark when-null behavior). */
class RuleCascadeSpec extends SparkSpec {
  import spark.implicits._

  test("guarded rules are first-match-wins") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val out = RuleCascade(df, "comment", Seq(
      Rule(col("v") >= 2, "big"),
      Rule(col("v") >= 1 && col("comment").isNull, "small")
    )).select("k", "comment").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "small", "b" -> "big", "c" -> "big"))
  }

  test("unguarded later rule overwrites earlier verdict") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val out = RuleCascade(df, "comment", Seq(
      Rule(col("v") >= 1, "first"),
      Rule(col("v") === 2, "second")
    )).select("k", "comment").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "first", "b" -> "second"))
  }

  test("null condition does not fire (pandas NaN-mask parity)") {
    val df = Seq(("a", Some("1")), ("b", None)).toDF("k", "vendor")
    val out = RuleCascade(df, "comment", Seq(
      Rule(col("vendor").startsWith("1"), "external")
    )).select("k", "comment").as[(String, Option[String])].collect().toMap
    assert(out === Map("a" -> Some("external"), "b" -> None))
  }

  test("rules can re-test the verdict column (sentinel if/elif idiom)") {
    val df = Seq(("a", 6), ("b", 7)).toDF("k", "v")
    val out = RuleCascade(df, "comment", Seq(
      Rule(col("v") >= 6, "sentinel"),
      Rule(col("comment") === "sentinel" && col("v") === 7, "resolved")
    )).select("k", "comment").as[(String, String)].collect().toMap
    assert(out === Map("a" -> "sentinel", "b" -> "resolved"))
  }

  test("property: catch-all rule leaves no null verdict") {
    val gen = Gen.listOfN(20, Gen.chooseNum(-50, 50))
    (1L to 8L).foreach { seed =>
      val vs = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val df = vs.zipWithIndex.toDF("v", "i")
      val out = RuleCascade(df, "comment", Seq(
        Rule(col("v") > 0, "pos"),
        Rule(col("comment").isNull, "rest")
      ))
      assert(out.filter(col("comment").isNull).count() === 0L)
    }
  }

  test("property: reordering unguarded rules changes output (order is semantic)") {
    val df = Seq(1, 2, 3).toDF("v")
    val r1 = Rule(col("v") >= 1, "a")
    val r2 = Rule(col("v") >= 2, "b")
    val fwd = RuleCascade(df, "c", Seq(r1, r2)).select("c").as[String].collect().sorted
    val rev = RuleCascade(df, "c", Seq(r2, r1)).select("c").as[String].collect().sorted
    assert(!fwd.sameElements(rev))
  }

  test("asColumn builds the equivalent single CASE expression") {
    val df = Seq(1, 2).toDF("v")
    val c = RuleCascade.asColumn(lit(null).cast("string"), Seq(
      Rule(col("v") === 1, "one"), Rule(col("v") === 2, "two")))
    val out = df.select(c.as("c")).as[String].collect().sorted
    assert(out === Array("one", "two"))
  }
}
