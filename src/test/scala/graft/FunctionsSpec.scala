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

  test("SimHash60: single-token signature IS the token's h60 (and codegen survives)") {
    import graft.text.TextFns
    // one token → every bit count is ±1 from that token alone → sig == h
    val df = spark.range(500).selectExpr("array(concat('tok', id)) AS toks")
      .select(graft.functions.SimHash60.simhash(col("toks")).as("sig"),
        TextFns.h60(expr("toks[0]")).as("h"))
    assert(df.filter(col("sig") =!= col("h")).count() == 0)
    // multi-token matches the reference value the oracle computes
    val sig = Seq("the quick brown fox").toDF("text")
      .select(TextFns.simhashRow(col("text"))).head.getLong(0)
    val viaSql = spark.sql(
      """SELECT cast(sum(CASE WHEN s > 0 THEN shiftleft(1L, j) ELSE 0L END) AS LONG) FROM (
        |  SELECT j, sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s FROM (
        |    SELECT conv(substr(md5(tok),1,15),16,10)::LONG AS h
        |    FROM (SELECT explode(array('the','quick','brown','fox')) AS tok))
        |  LATERAL VIEW explode(sequence(0,59)) AS j GROUP BY j)""".stripMargin)
      .head.getLong(0)
    assert(sig == viaSql)
  }

  test("fingerprint60 and shingle_distinct register as SQL functions") {
    GraftExtensions.registerAll(spark)
    // "a b a b" → 2-grams: (a b),(b a),(a b) → 2 distinct
    val sd = spark.sql(
      "SELECT shingle_distinct(split('a b a b', ' '), 2) AS d").head.getLong(0)
    assert(sd == 2L)
    val fp = spark.sql("SELECT fingerprint60(split('a b', ' ')) AS f").head.getLong(0)
    val viaCol = Seq("a b").toDF("text")
      .select(graft.functions.Fingerprint60.fingerprint(
        graft.text.TextFns.tokens(col("text")))).head.getLong(0)
    assert(fp == viaCol)
  }

  test("ShingleDistinct matches the declarative distinct-shingle count") {
    import graft.text.TextFns
    import graft.functions.ShingleDistinct
    // real corpus rows: compiled count == size(array_distinct(shinglesN))
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = TextFns.tokens(col("text"))
    for (k <- Seq(2, 3, 5)) {
      val mismatches = docs
        .filter(size(toks) >= k)
        .select(
          ShingleDistinct.distinctShingles(toks, k).as("fast"),
          size(array_distinct(TextFns.shinglesN(toks, k))).cast("long").as("slow"))
        .filter(col("fast") =!= col("slow")).count()
      assert(mismatches == 0, s"k=$k")
    }
    // short-array guard: fewer tokens than k → 0
    val short = Seq("one two").toDF("text")
      .select(ShingleDistinct.distinctShingles(TextFns.tokens(col("text")), 3))
      .head.getLong(0)
    assert(short == 0L)
  }

  test("ShingleArray matches the declarative shinglesN exactly (values AND order)") {
    import graft.text.TextFns
    import graft.functions.ShingleArray
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = TextFns.tokens(col("text"))
    for (k <- Seq(3, 5)) {
      val mismatches = docs
        .filter(size(toks) >= k)
        .select(
          ShingleArray.shingles(toks, k).as("fast"),
          TextFns.shinglesN(toks, k).as("slow"))
        .filter(col("fast") =!= col("slow")).count()
      assert(mismatches == 0, s"k=$k")
    }
    // short array → empty, not an error
    val short = Seq("one two").toDF("text")
      .select(size(ShingleArray.shingles(TextFns.tokens(col("text")), 3)))
      .head.getInt(0)
    assert(short == 0)
  }

  test("h60Jvm and shinglesJvm are bit-equal twins of the Column forms") {
    import graft.text.TextFns
    // h60: ASCII, unicode, empty, whitespace-bearing strings
    val samples = Seq("hello", "a b c", "", "Ümläut 中文", "trailing ")
    val cols = samples.toDF("s").select(TextFns.h60(col("s"))).collect().map(_.getLong(0))
    assert(samples.map(TextFns.h60Jvm) == cols.toSeq)
    // shingle sets: the JVM twin equals the distinct Column pipeline on
    // real documents (same lower/split/join arithmetic)
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull).limit(50)
      .select(col("text"),
        graft.functions.ShingleArray.shingles(TextFns.tokens(col("text")), 5).as("sh"))
      .collect()
    for (r <- docs) {
      val colSet = if (r.isNullAt(1)) Set.empty[String] else r.getSeq[String](1).toSet
      assert(TextFns.shinglesJvm(r.getString(0), 5) == colSet)
    }
    // null / short text → empty set
    assert(TextFns.shinglesJvm(null, 5).isEmpty)
    assert(TextFns.shinglesJvm("one two", 5).isEmpty)
    // targeted locale-sensitive probes (ADVICE r5): Spark's lower() and
    // String.toLowerCase(Locale.ROOT) must agree beyond ASCII too —
    // dotted İ (expands to i + combining dot), ß, Greek final sigma.
    // (The DuckDB oracle side remains an ASCII contract: the synthetic
    // corpus is ASCII and a third engine's lower() is not pinned here.)
    val tricky = Seq("İstanbul Bei Nacht", "STRASSE ß GROẞ", "ΣΙΓΜΑ ΤΕΛΟΣ Σ ΟΔΟΣ")
    val trickyCols = tricky.toDF("text")
      .select(col("text"),
        graft.functions.ShingleArray.shingles(TextFns.tokens(col("text")), 2).as("sh"))
      .collect()
    for (r <- trickyCols)
      assert(TextFns.shinglesJvm(r.getString(0), 2) == r.getSeq[String](1).toSet,
        r.getString(0))
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
