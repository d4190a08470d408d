package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational._

/** Pins the semi/anti-join and dup-group-window semantics of the
  * reference's `isin` / `duplicated(keep=False)` idioms (SURVEY.md
  * §2.4, §2.6). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
  private def right = Seq(("a", 9), ("a", 8), ("x", 7)).toDF("k", "w")

  test("semiJoin keeps matching rows once (no fan-out on dup right keys)") {
    val out = semiJoin(left, right, Seq("k")).as[(String, Int)].collect().toSet
    assert(out === Set(("a", 1)))
  }

  test("antiJoin keeps only non-matching rows") {
    val out = antiJoin(left, right, Seq("k")).as[(String, Int)].collect().toSet
    assert(out === Set(("b", 2), ("c", 3)))
  }

  test("antiJoin with null key keeps the null row (NOT IN-style semantics not wanted)") {
    val l = Seq(Some("a"), None).toDF("k")
    val r = Seq("a").toDF("k")
    val out = antiJoin(l, r, Seq("k")).as[Option[String]].collect().toSet
    assert(out === Set(None))
  }

  test("markDupGroups flags every member of >1 groups, like duplicated(keep=False)") {
    val df = Seq(("m1", 1), ("m1", 2), ("m2", 3)).toDF("mp", "v")
    val out = markDupGroups(df, Seq("mp"), "dup")
      .select("mp", "v", "dup").as[(String, Int, Boolean)].collect().toSet
    assert(out === Set(("m1", 1, true), ("m1", 2, true), ("m2", 3, false)))
  }

  test("withKey derives the /-separated composite key") {
    val df = Seq((12, 3)).toDF("material", "plant")
    val out = withKey(df, "mp", col("material"), col("plant"))
      .select("mp").as[String].head()
    assert(out === "12/3")
  }
}
