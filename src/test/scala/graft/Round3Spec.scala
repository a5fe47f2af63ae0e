package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bloom, DedupText, RangeBin, Scd2, TextOps}
import graft.expr.{GraftFunctions, ZOrderUtil}

/** Round-3 operators: contamination check, Gopher rules, SCD2 history,
  * bloom-pruned semi-join, binned interval join, Z-order keys. */
class Round3Spec extends SparkSuite {
  import spark.implicits._

  test("contaminationHits finds planted overlap and nothing else") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "alpha beta gamma zeta eta")).toDF("doc_id", "text")
    val bench = Seq((99L, "x alpha beta gamma y")).toDF("doc_id", "text")
    val hits = DedupText.contaminationHits(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 3 share the 'alpha_beta_gamma' shingle; doc 2 is clean
    assert(hits === Map(1L -> 1L, 3L -> 1L))
  }

  test("gopherFlags thresholds fire on the right documents") {
    val good = ("the a of and is " +
      (1 to 60).map(i => f"word$i%02d").mkString(" "), "good")
    val short = ("the a of", "short") // < 50 words
    val noStop = ((1 to 60).map(i => s"w$i").mkString(" "), "nostop")
    val repetitive = (("the of " + ("dup pair " * 60)).trim, "rep")
    val df = Seq(good, short, noStop, repetitive).toDF("text", "name")
    val out = TextOps.gopherFlags(df, "text")
      .select("name", "flag_n_words", "flag_stop", "flag_repetition", "keep")
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(out("good") === ((true, true, true, true)))
    assert(out("short")._1 === false)
    assert(out("nostop")._2 === false)
    assert(out("rep")._3 === false)
    assert(!out("short")._4 && !out("nostop")._4 && !out("rep")._4)
  }

  test("Scd2.history compresses runs and bounds intervals") {
    val feed = Seq(
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L), (1L, "B", 30L, 102L),
      (1L, "A", 40L, 103L), (2L, "X", 10L, 104L))
      .toDF("k", "attr", "ts", "tie")
    val h = Scd2.history(feed, "k", "attr", "ts", "tie")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(h.toSeq === Seq(
      (1L, "A", 10L, 30L, false),
      (1L, "B", 30L, 40L, false),
      (1L, "A", 40L, -1L, true),
      (2L, "X", 10L, -1L, true)))
  }

  test("Scd2.history keeps a leading null-attribute run") {
    val feed = Seq(
      (1L, Option.empty[String], 10L, 100L), (1L, Some("A"), 20L, 101L),
      (2L, Option.empty[String], 10L, 102L))
      .toDF("k", "attr", "ts", "tie")
    val h = Scd2.history(feed, "k", "attr", "ts", "tie")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) "-" else r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(h.toSeq === Seq(
      (1L, "-", 10L, 20L), (1L, "A", 20L, -1L), (2L, "-", 10L, -1L)))
  }

  test("Scd2.history plans one exchange for both window passes") {
    val feed = Seq((1L, "A", 10L, 1L)).toDF("k", "attr", "ts", "tie")
    val plan = Scd2.history(feed, "k", "attr", "ts", "tie")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected a single shuffle, plan:\n$plan")
  }

  test("bloom prunedSemiJoin equals plain semi-join") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val expected = fact
      .join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi").count()
    val got = Bloom.prunedSemiJoin(fact, "l_orderkey",
      dim, "o_orderkey", expectedItems = 10000L).count()
    assert(got === expected)
  }

  test("bloom filter itself rejects most non-members") {
    val dim = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bf = Bloom.keyBloom(dim, "o_orderkey", expectedItems = 10000L)
    GraftFunctions.register(spark)
    val fact = Tables.lineitem(spark, sfDir)
    val pre = fact.where(
      GraftFunctions.might_contain(lit(bf), col("l_orderkey"))).count()
    val exact = fact
      .join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi").count()
    val total = fact.count()
    // sanity: the pre-filter keeps all members and is far below the scan
    assert(pre >= exact)
    assert(pre < total / 2, s"bloom kept $pre of $total")
  }

  test("RangeBin.pointInterval equals the theta join") {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts_ms").as("e_ts"))
      .withColumn("w_start", col("e_ts") - 3600000L)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms").as("c_ts"))
    val binned = RangeBin.pointInterval(clicks, "c_ts",
      errors, "w_start", "e_ts", Seq("user_id"), binWidth = 3600000L)
    val theta = clicks.join(errors,
      clicks("user_id") === errors("user_id") &&
        col("c_ts") >= col("w_start") && col("c_ts") < col("e_ts"))
    assert(binned.count() === theta.count())
    // and with a width that does NOT divide the window length
    val binned2 = RangeBin.pointInterval(clicks, "c_ts",
      errors, "w_start", "e_ts", Seq("user_id"), binWidth = 1700000L)
    assert(binned2.count() === theta.count())
  }

  test("RangeBin ignores empty intervals") {
    val pts = Seq((1L, 5L)).toDF("k", "p")
    val iv = Seq((1L, 10L, 10L), (1L, 10L, 3L)).toDF("k", "s", "e")
    assert(RangeBin.pointInterval(pts, "p", iv, "s", "e", Seq("k"), 10L)
      .count() === 0L)
  }

  test("RangeBin bins exactly beyond 2^53 (long arithmetic, no doubles)") {
    // nanosecond-scale epochs: double rounding would mis-bin boundaries
    val base = 1706227200000000000L // ~1.7e18, ulp(double) = 256 here
    val pts = Seq((1L, base)).toDF("k", "p")
    val iv = Seq((1L, base, base + 1000000000L)).toDF("k", "s", "e")
    assert(RangeBin.pointInterval(pts, "p", iv, "s", "e", Seq("k"),
      binWidth = 1000000000L).count() === 1L)
  }

  test("RangeBin rejects colliding column names") {
    val pts = Seq((1L, 5L, 0L)).toDF("k", "p", "__bin")
    val iv = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    intercept[IllegalArgumentException] {
      RangeBin.pointInterval(pts, "p", iv, "s", "e", Seq("k"), 10L)
    }
    val pts2 = Seq((1L, 5L, 7L)).toDF("k", "p", "s")
    intercept[IllegalArgumentException] {
      RangeBin.pointInterval(pts2, "p", iv, "s", "e", Seq("k"), 10L)
    }
  }

  test("bloom prunedSemiJoin rejects mismatched key types") {
    val fact = Seq((1, "a")).toDF("k", "v")          // int key
    val dim = Seq((1L, "x")).toDF("dk", "w")         // long key
    intercept[IllegalArgumentException] {
      Bloom.prunedSemiJoin(fact, "k", dim, "dk", 100L)
    }
  }

  test("contaminationHits ignores null and empty text") {
    val corpus = Seq((1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq((9L, ""), (10L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(DedupText.contaminationHits(corpus, bench, "doc_id", "text")
      .count() === 0L)
  }

  test("zorder16 expression matches a per-bit reference and interleaves") {
    def slow(x: Long, y: Long): Long =
      (0 until 16).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
        .reduce(_ | _)
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L))
    samples.foreach { case (x, y) =>
      assert(ZOrderUtil.interleave16(x, y) === slow(x, y), s"($x,$y)")
    }
    // via the expression + codegen path
    GraftFunctions.register(spark)
    val got = samples.toDF("x", "y")
      .select(GraftFunctions.zorder16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === samples.map { case (x, y) => slow(x, y) })
    // locality: adjacent cells share high-order bits (prefix property)
    assert(ZOrderUtil.interleave16(2L, 2L) === 12L)
    assert(ZOrderUtil.interleave16(3L, 3L) === 15L)
  }
}
