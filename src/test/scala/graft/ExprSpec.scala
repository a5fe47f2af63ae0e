package graft

import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Custom Catalyst expressions: semantics pinned against the reference's
  * documented behavior (utils.js:14-25 strip, RFC 7386, utils.js:31-42). */
class ExprSpec extends SparkSuite {

  private def one(colExpr: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(1).toDF("x").select(colExpr.as("r")).collect().head.getAs[String]("r")
  }

  test("remove_dollar_fields strips $$ keys at any depth, keeps $$meta") {
    val in = """{"$$meta": {"permalink": "/a/1", "$$x": 1}, "key": "1",
                "$$expanded": {"deep": true},
                "nested": {"$$ref": "x", "keep": [ {"$$y": 2, "z": 3} ]}}"""
    val out = one(GraftFunctions.remove_dollar_fields(lit(in)))
    // $$meta kept but recursed into ($$x dropped inside it);
    // $$expanded dropped; $$ref dropped; array elements recursed
    assert(out ===
      """{"$$meta":{"permalink":"/a/1"},"key":"1","nested":{"keep":[{"z":3}]}}""")
  }

  test("json_merge_patch follows RFC 7386") {
    // the RFC's own example shape: replace, delete, nested merge, add
    val target = """{"a":"b","c":{"d":"e","f":"g"}}"""
    val patch = """{"a":"z","c":{"f":null},"h":1}"""
    val out = one(GraftFunctions.json_merge_patch(lit(target), lit(patch)))
    assert(out === """{"a":"z","c":{"d":"e"},"h":1}""")
    // non-object patch replaces wholesale
    assert(one(GraftFunctions.json_merge_patch(lit("""{"a":1}"""), lit("[1,2]")))
      === "[1,2]")
  }

  test("java_string_hash equals java.lang.String.hashCode") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val inputs = Seq("", "a", "/events/123", "The quick brown fox", "ü≈Ω")
    val got = inputs.toDF("s")
      .select(GraftFunctions.java_string_hash(col("s")).as("h"))
      .collect().map(_.getInt(0))
    assert(got.toSeq === inputs.map(_.hashCode))
  }

  test("expressions registered via SQL are usable in spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """select java_string_hash('abc') h,
        |  remove_dollar_fields('{"$$x":1,"y":2}') s""".stripMargin)
      .collect().head
    assert(r.getInt(0) === "abc".hashCode)
    assert(r.getString(1) === """{"y":2}""")
  }

  test("dot_ff is bit-identical to the aggregate(zip_with) fold") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "a", "b")
    val fold = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = df.select(
        GraftFunctions.dot_ff(col("a"), col("b")).as("fast"), fold.as("ref"))
      .where(col("fast") =!= col("ref")) // bitwise-equal doubles compare equal
      .count()
    assert(diff === 0)
  }

  test("dot_ff null/length-mismatch semantics match the fold") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """select
        |  dot_ff(array(cast(1.0 as float)), array(cast(2.0 as float), cast(3.0 as float))) mismatch,
        |  dot_ff(array(cast(1.0 as float), cast(null as float)), array(cast(2.0 as float), cast(3.0 as float))) withnull,
        |  dot_ff(cast(null as array<float>), array(cast(1.0 as float))) nullarr,
        |  dot_ff(array(), array()) empty""".stripMargin).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) === 0.0)
  }

  test("explode_windows matches the transform+posexplode formulation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // normal doc, doc of exactly w tokens, shorter-than-w doc, empty
    // string (tokenizes to [""] → no 4-window), null text
    val df = Seq((1L, Option("a b c d e f")), (2L, Option("a b c d")),
        (3L, Option("a b")), (4L, Option("")), (5L, Option.empty[String]))
      .toDF("id", "text")
    val ws = split(col("text"), " ")
    val gen = df.select(col("id"),
        GraftFunctions.explode_windows(ws, lit(4)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val hof = df.select(col("id"), posexplode(
        when(size(ws) >= 4, transform(sequence(lit(1), size(ws) - 3),
          i => concat_ws("_", slice(ws, i, lit(4)))))
          .otherwise(array().cast("array<string>"))))
      .select(col("id"), (col("pos") + 1).cast("int").as("pos"), col("col"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(gen.sorted === hof.sorted)
    assert(gen.count(_._1 == 1L) === 3) // 6 tokens → windows at 1, 2, 3
    assert(gen.filter(_._1 == 2L) === Seq((2L, 1, "a_b_c_d")))
    assert(!gen.exists(t => t._1 >= 3L)) // short/empty/null → no rows
  }

  test("min_pieces: optimal DP count, strictly below greedy where " +
      "greedy longest-match is suboptimal; -1 when uncoverable") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // vocab {a, ab, bc, abc}: "abbc" greedy-longest eats "ab" then must
    // cover "bc" → 2 (optimal too); "abcbc": greedy "abc"+"bc" = 2;
    // BUT vocab {aa, aab, b}: "aab" optimal is 1 where greedy
    // "aa"+"b" = 2 — the case that separates optimal from greedy
    val v1 = typedlit(Seq("a", "ab", "bc", "abc"))
    val v2 = typedlit(Seq("aa", "aab", "b"))
    def mp(w: String, v: org.apache.spark.sql.Column): Int =
      Seq(1).toDF("x")
        .select(GraftFunctions.min_pieces(lit(w), v).as("r"))
        .collect().head.getInt(0)
    assert(mp("abc", v1) === 1)
    assert(mp("abbc", v1) === 2)
    assert(mp("aabc", v1) === 2) // a + abc (not a + a + bc)
    assert(mp("aab", v2) === 1) // optimal beats greedy's 2
    assert(mp("", v1) === 0) // empty word needs no pieces
    assert(mp("xyz", v1) === -1) // uncoverable
    assert(mp("abx", v1) === -1) // partial cover is no cover
  }

  test("min_pieces: non-foldable vocab column works per-row (the " +
      "uncached path), null word/vocab propagate null") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("aab", Seq("aa", "aab", "b")),
      ("aab", Seq("a", "b"))
    ).toDF("w", "v")
    val got = df.select(GraftFunctions.min_pieces(col("w"), col("v")))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(1, 3))
    val n = Seq(1).toDF("x").select(
      GraftFunctions.min_pieces(lit(null).cast("string"),
        typedlit(Seq("a"))).as("a"),
      GraftFunctions.min_pieces(lit("a"),
        lit(null).cast("array<string>")).as("b")).collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("dot_ff rejects non-float arrays at analysis time") {
    GraftFunctions.register(spark)
    // getFloat reads 4 of 8 bytes on a double array — must be an analysis
    // error, never a silent garbage value
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select dot_ff(array(cast(1.0 as double)), " +
        "array(cast(2.0 as double)))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
