package graft
import org.apache.spark.sql.types._
class WidenProbeSpec extends SparkSpec {
  import spark.implicits._
  test("parquet reader upcasts int32 files under a long requested schema") {
    Seq((1, 10), (2, 20)).toDF("k", "v").write.mode("overwrite").parquet("target/wtest/narrow")
    Seq((3L, 5000000000L), (4L, 40L)).toDF("k", "v").write.mode("overwrite").parquet("target/wtest/wide")
    val st = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    val got = spark.read.schema(st).parquet("target/wtest/narrow", "target/wtest/wide")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 20L), (3L, 5000000000L), (4L, 40L)))
    Seq((1, 1.5f)).toDF("k", "f").write.mode("overwrite").parquet("target/wtest/f32")
    val st2 = StructType(Seq(StructField("k", IntegerType), StructField("f", DoubleType)))
    assert(spark.read.schema(st2).parquet("target/wtest/f32")
      .as[(Int, Double)].collect().toSet === Set((1, 1.5)))
  }
}
