package graft

import org.apache.spark.sql.functions._
import graft.{functions => gf}

/** graft's native expressions as SQL functions: injected by GraftExtensions
  * (TestSpark builds the session with spark.sql.extensions) and by the
  * programmatic register() path. */
class GraftSqlSpec extends SparkSpec {

  test("graft_minhash / graft_dot / graft_cosine resolve in SQL via extensions") {
    val out = spark.sql(
      """SELECT graft_minhash(array('a b c', 'b c d'), 4) AS sig,
        |       graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                 array(cast(3.0 as float), cast(4.0 as float))) AS dot,
        |       graft_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |                    array(cast(1.0 as float), cast(0.0 as float))) AS cos
        |""".stripMargin).collect()(0)
    assert(out.getSeq[String](0).length == 4)
    assert(out.getDouble(1) == 11.0)
    assert(out.getDouble(2) == 1.0)
  }

  test("SQL graft_minhash equals the Column API expression") {
    import spark.implicits._
    val df = Seq((1, Seq("x y z", "y z w")), (2, Seq("p q r"))).toDF("id", "sh")
    df.createOrReplaceTempView("minhash_in")
    val viaSql = spark.sql("SELECT id, graft_minhash(sh, 6) AS sig FROM minhash_in")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    val viaCol = df.select(col("id"), graft.text.Dedup.signatureFromShingles(col("sh"), 6).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(viaSql == viaCol)
  }

  test("graft_normalize / graft_text_stats / graft_shingles resolve in SQL") {
    val r = spark.sql(
      """SELECT graft_normalize('ascii only', 'NFC') AS plain,
        |       graft_text_stats('ab c.').n_tokens AS nt,
        |       graft_shingles('a b c', 2) AS sh""".stripMargin).collect()(0)
    assert(r.getString(0) == "ascii only")
    assert(r.getInt(1) == 2)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
  }

  test("normalize composes decomposed unicode (NFC) and matches the JDK") {
    import spark.implicits._
    val decomposed = "cafe\u0301"          // e + U+0301 combining acute
    val composed = "caf\u00e9"             // precomposed U+00E9
    val df = Seq((1, decomposed), (2, composed), (3, "plain")).toDF("id", "s")
    val rows = df.select(col("id"),
      graft.functions.normalize(col("s")).as("nfc"),
      graft.functions.normalize(col("s"), "NFD").as("nfd")).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1)._1 == composed)
    assert(rows(2)._1 == composed)
    assert(rows(1)._2 == decomposed)        // NFD decomposes back
    assert(rows(3)._1 == "plain")
  }

  test("programmatic register() is idempotent on a live session") {
    gf.GraftFunctions.register(spark)
    gf.GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT graft_dot(array(cast(2.0 as double)), array(cast(5.0 as double))) AS d")
      .collect()(0).getDouble(0)
    assert(d == 10.0)
  }

  test("the multi-pattern family resolves in SQL") {
    val r = spark.sql(
      """SELECT graft_replace_many('a b c', array('a','c'), array('x','y')) AS rep,
        |       graft_contains_any('hello world', array('wor','xyz')) AS ca,
        |       graft_extract_many('ab ab', array('ab')) AS em,
        |       graft_find_many('ab ab', array('ab')) AS fm""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "x b y")
    assert(r.getBoolean(1))
    assert(r.getSeq[String](2) == Seq("ab", "ab"))
    assert(r.getSeq[Int](3) == Seq(0, 3))
  }

  test("graft_redact_pii / graft_pii_count resolve in SQL") {
    val r = spark.sql(
      """SELECT graft_redact_pii('mail a@b.io from 10.0.0.1') AS red,
        |       graft_pii_count('mail a@b.io from 10.0.0.1') AS n""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "mail <EMAIL> from <IP>")
    assert(r.getLong(1) == 2L)
  }

  test("every graft function name is resolvable in the session catalog") {
    gf.GraftFunctions.all.map(_._1.funcName).foreach { n =>
      assert(spark.catalog.functionExists(n), s"$n not registered")
    }
  }

  test("bad argument types fail analysis with the expression's message") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
  }
}
