package graft

import org.apache.spark.sql.functions._
import graft.functions.FloatDot

/** FloatDot: codegen'd float dot product — Column API and SQL
  * registration via GraftExtensions.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("FloatDot matches the fold semantics (Column API)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val v = df.select(FloatDot.dot(col("a"), col("b"))).head.getDouble(0)
    assert(v == 32.0)
    // nulls propagate
    val n = df.select(FloatDot.dot(lit(null).cast("array<float>"), col("b"))).head
    assert(n.isNullAt(0))
  }

  test("float_dot registers as a SQL function via GraftExtensions") {
    GraftExtensions.registerAll(spark)
    val v = spark.sql(
      """SELECT float_dot(array(cast(1.0 AS float), cast(2.0 AS float)),
        |                 array(cast(3.0 AS float), cast(4.0 AS float))) AS d""".stripMargin)
      .head.getDouble(0)
    assert(v == 11.0)
  }

  test("h60 and cosine_sim register as SQL functions via GraftExtensions") {
    GraftExtensions.registerAll(spark)
    // same value the Column API / DuckDB oracle computes for 'hello'
    val h = spark.sql("SELECT h60('hello') AS h").head.getLong(0)
    assert(h == 419982666956583591L)
    val c = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS float), cast(0.0 AS float)),
        |                  array(cast(1.0 AS float), cast(0.0 AS float))) AS c""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val o = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS float), cast(0.0 AS float)),
        |                  array(cast(0.0 AS float), cast(1.0 AS float))) AS c""".stripMargin)
      .head.getDouble(0)
    assert(math.abs(o) < 1e-12)
  }

  test("FloatDot survives whole-stage codegen over many rows") {
    val df = spark.range(1000).selectExpr(
      "array(cast(id AS float), cast(id+1 AS float)) AS a",
      "array(cast(2.0 AS float), cast(3.0 AS float)) AS b")
    val total = df.select(sum(FloatDot.dot(col("a"), col("b"))).as("s")).head.getDouble(0)
    // Σ (2i + 3(i+1)) for i in 0..999 = 5·Σi + 3000 = 2497500 + 3000
    assert(total == 2500500.0)
  }
}
