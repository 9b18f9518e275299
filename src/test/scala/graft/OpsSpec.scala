package graft

import org.apache.spark.sql.functions._
import graft.ops.{Categorical, HConcat, Rle, Unique, Upsample}
import graft.{functions => gf}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("categorical: lexical codes, null stays null, round-trip decodes") {
    val df = Seq(Some("fr"), Some("de"), None, Some("de"), Some("en"))
      .toDF("lang")
    val dict = Categorical.dictionary(df, "lang").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(dict == Seq((0, "de"), (1, "en"), (2, "fr")))
    val enc = Categorical.toPhysical(df, "lang", "phys")
    val codes = enc.select("phys").collect().map(r => Option(r.get(0))).toSeq
    assert(codes.count(_.isEmpty) == 1) // the null row never enters the dict
    val rt = Categorical.fromPhysical(
      enc.drop("lang"), "phys", Categorical.dictionary(df, "lang"), "lang_rt")
    assert(rt.filter(col("lang_rt").isNotNull).count() == 4)
    assert(Categorical.getCategories(df, "lang").count() == 3)
  }

  test("joinOnCodes: two private dictionaries join by category, data sees only ints") {
    // left numbers {a,b,c,d} → a=0,b=1,c=2,d=3; right numbers {b,d} → b=0,d=1
    val lRaw = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "cat")
    val rRaw = Seq(("d", 40.0), ("b", 20.0)).toDF("cat", "w")
    val lDict = Categorical.dictionary(lRaw, "cat")
    val rDict = Categorical.dictionary(rRaw, "cat")
    val left = Categorical.toPhysical(lRaw, "cat", "lc").drop("cat")
    val right = Categorical.toPhysical(rRaw, "cat", "rc").drop("cat")
    // raw code equality would wrongly match left b(1) to right d(1);
    // the remap joins by CATEGORY: b↔b, d↔d
    val out = Categorical.joinOnCodes(left, "lc", lDict, right, "rc", rDict)
      .select("id", "lc", "w").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    assert(out == Seq((2L, 1, 20.0), (4L, 3, 40.0)))
    // left join keeps unmatched left rows with null right columns
    val lj = Categorical.joinOnCodes(left, "lc", lDict, right, "rc", rDict,
      how = "left")
    assert(lj.count() == 4 && lj.filter(col("w").isNull).count() == 2)
    intercept[IllegalArgumentException] {
      Categorical.joinOnCodes(left, "lc", lDict, right, "rc", rDict, "full")
    }
    // the shared-dictionary route (global string cache): one dictionary,
    // directly comparable codes, unseen values code to null
    val shared = Categorical.sharedDictionary(lRaw, "cat", rRaw, "cat")
    val le = Categorical.toPhysicalWith(lRaw, "cat", shared, "code")
    val re = Categorical.toPhysicalWith(rRaw, "cat", shared, "code")
    val joined = le.join(re.select(col("code"), col("w")), Seq("code"))
    assert(joined.count() == 2)
    val unseen = Categorical.toPhysicalWith(
      Seq("zz").toDF("cat"), "cat", shared, "code")
    assert(unseen.filter(col("code").isNull).count() == 1)
  }

  test("enum: frozen codes by declaration order; strict encode RAISES on out-of-set") {
    val cats = Seq("de", "en", "fr")
    val good = Seq(Some("fr"), Some("de"), None, Some("en")).toDF("lang")
    val codes = good.select(Categorical.enumEncode(col("lang"), cats).as("c"))
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Int])).toSeq
    assert(codes == Seq(Some(2), Some(0), None, Some(1)))
    // decode by position; out-of-range code → null
    val back = good.select(Categorical.enumDecode(
      Categorical.enumEncode(col("lang"), cats), cats).as("rt"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(back == Seq(Some("fr"), Some("de"), None, Some("en")))
    assert(spark.range(1).select(
      Categorical.enumDecode(lit(99), cats).as("x")).head().isNullAt(0))

    // the Enum contract: a value outside the frozen set must RAISE...
    val bad = Seq("de", "zz").toDF("lang")
    val e = intercept[Exception] {
      bad.select(Categorical.enumEncode(col("lang"), cats)).collect()
    }
    assert(e.getMessage.contains("Enum strict cast failed") &&
      e.getMessage.contains("zz"), e.getMessage)
    // ...and the non-strict cast maps it to null instead (polars strict=False)
    val lax = bad.select(Categorical.enumEncode(col("lang"), cats, strict = false).as("c"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(lax == Seq(Some(0), None))
  }

  test("name.prefix_fields/suffix_fields/map_fields rename struct fields") {
    val df = Seq((1, "a")).toDF("n", "s")
      .select(struct(col("n"), col("s")).as("st"))
    val dt = df.schema("st").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(df.select(gf.prefixFields(col("st"), dt, "p_").as("st"))
      .schema("st").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("p_n", "p_s"))
    assert(df.select(gf.suffixFields(col("st"), dt, "_x").as("st"))
      .schema("st").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("n_x", "s_x"))
    val up = df.select(gf.mapFields(col("st"), dt, _.toUpperCase).as("st"))
    assert(up.schema("st").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("N", "S"))
    assert(up.select(col("st.N")).head().getInt(0) == 1) // values ride along
  }

  test("unique keep=first/last/none honor the order column") {
    val df = Seq(("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z"))
      .toDF("k", "ord", "v")
    assert(Unique.keep(df, Seq("k"), "first", col("ord"))
      .select("v").as[String].collect().sorted.toSeq == Seq("x", "z"))
    assert(Unique.keep(df, Seq("k"), "last", col("ord"))
      .select("v").as[String].collect().sorted.toSeq == Seq("y", "z"))
    assert(Unique.keep(df, Seq("k"), "none", col("ord"))
      .select("v").as[String].collect().toSeq == Seq("z"))
  }

  test("rle_id increments on value change, rle collapses runs") {
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "a"), (5, "a"))
      .toDF("ord", "v")
    val ids = Rle.withRunId(df, col("v"), Nil, Seq(col("ord")))
      .orderBy("ord").select("run_id").as[Long].collect().toSeq
    assert(ids == Seq(0L, 0L, 1L, 2L, 2L))
    val runs = Rle.rle(df, col("v"), Nil, Seq(col("ord")))
      .orderBy("run_id").select("value", "len").as[(String, Long)].collect().toSeq
    assert(runs == Seq(("a", 2L), ("b", 1L), ("a", 2L)))
  }

  test("hconcat zips by row position") {
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq("a", "b", "c").toDF("y")
    val z = HConcat.byOrder(a, b, col("x"), col("y"))
      .orderBy("x").as[(Int, String)].collect().toSeq
    assert(z == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("upsample densifies the time grid per group") {
    val df = Seq(("g", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("g", java.sql.Timestamp.valueOf("2024-01-01 03:00:00"), 2.0))
      .toDF("k", "ts", "v")
    val up = Upsample.upsample(df, "ts", "interval 1 hour", Seq("k"))
    assert(up.count() == 4)
    assert(up.filter(col("v").isNull).count() == 2)
  }

  test("cut bins left-exclusive right-inclusive; clip bounds") {
    val df = Seq(-1.0, 0.0, 1.0, 2.5, 9.9).toDF("x")
    val buckets = df.select(gf.cut(col("x"), Seq(0.0, 2.0), Seq("lo", "mid", "hi")))
      .as[String].collect().toSeq
    assert(buckets == Seq("lo", "lo", "mid", "hi", "hi"))
    val clipped = df.select(gf.clip(col("x"), lit(0.0), lit(2.0)))
      .as[Double].collect().toSeq
    assert(clipped == Seq(0.0, 0.0, 1.0, 2.0, 2.0))
  }

  test("addBusinessDays walks Mon-Fri; raise mode rejects weekend starts") {
    // 2024-01-03 is a Wednesday; 2024-01-06 a Saturday
    val df = Seq("2024-01-03").toDF("d").select(col("d").cast("date").as("d"))
    def add(n: Int, roll: String = "raise") = df.select(
      gf.addBusinessDays(col("d"), lit(n), roll).cast("string")).head().getString(0)
    assert(add(0) == "2024-01-03")
    assert(add(1) == "2024-01-04")   // Thu
    assert(add(3) == "2024-01-08")   // over the weekend → Mon
    assert(add(5) == "2024-01-10")   // exactly one business week
    assert(add(-3) == "2023-12-29")  // back over the weekend → Fri
    val sat = Seq("2024-01-06").toDF("d").select(col("d").cast("date").as("d"))
    assert(sat.select(gf.addBusinessDays(col("d"), lit(1), "forward").cast("string"))
      .head().getString(0) == "2024-01-09") // rolls to Mon, +1 → Tue
    assert(sat.select(gf.addBusinessDays(col("d"), lit(1), "backward").cast("string"))
      .head().getString(0) == "2024-01-08") // rolls to Fri, +1 → Mon
    val e = intercept[Exception] {
      sat.select(gf.addBusinessDays(col("d"), lit(1))).collect()
    }
    assert(e.getMessage.contains("not a business day"), e.getMessage)
  }

  test("businessDayCount counts Mon-Fri in [start, end)") {
    // 2024-01-01 (Mon) .. 2024-01-08 (Mon): 5 business days
    val df = Seq(("2024-01-01", "2024-01-08"), ("2024-01-06", "2024-01-08"))
      .toDF("a", "b")
      .select(gf.businessDayCount(col("a").cast("date"), col("b").cast("date")).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(5L, 0L))
  }

  test("ewmMeanRows matches the closed-form weights") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("ord", "x")
    val w = org.apache.spark.sql.expressions.Window.orderBy("ord")
    val got = df.select(gf.ewmMeanRows(col("x"), w, span = 3, alpha = 0.5))
      .as[Double].collect().toSeq
    // adjust=true: y2 = (0.5*1 + 2)/1.5 ; y3 = (0.25*1 + 0.5*2 + 3)/1.75
    assert(math.abs(got(1) - (0.5 * 1 + 2) / 1.5) < 1e-12)
    assert(math.abs(got(2) - (0.25 * 1 + 0.5 * 2 + 3) / 1.75) < 1e-12)
  }
}
