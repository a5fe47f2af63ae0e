package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupText, Sampling, Scd2, TextOps}

/** Round-4 operators: exact-substring spans, sketch agreement, verified
  * fuzzy dedup, deterministic negative sampling. Tiny hand-built corpora
  * with known answers (the sf-scale behavior is oracle-checked by the
  * graded queries; these pin the algebra on edge cases). */
class Pipeline3Spec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("substringSpans finds one maximal span per shared run") {
    // docs share tokens 3..12 (10 tokens) — with w=4 that is 7 shared
    // windows on one diagonal → exactly one span of n_tokens=10
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 $shared z1 z2",
      2L -> s"b1 $shared y1 y2 y3")
    val out = DedupText.substringSpans(d, "doc_id", "text", w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 2L, 10L)))
  }

  test("substringSpans splits interrupted runs into separate maximal spans") {
    // two shared 4-token blocks separated by differing tokens → two spans
    val d = docs(
      1L -> "p1 p2 p3 p4 xx q1 q2 q3 q4",
      2L -> "p1 p2 p3 p4 yy q1 q2 q3 q4")
    val out = DedupText.substringSpans(d, "doc_id", "text", w = 4)
      .orderBy("a_start").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 1L, 4L), (6L, 6L, 4L)))
  }

  test("substringSpans drops windows above the doc-frequency cap") {
    // the shared window appears in 3 docs; maxDf=2 fences it out entirely
    val t = "c1 c2 c3 c4"
    val d = docs(1L -> t, 2L -> t, 3L -> t)
    assert(DedupText.substringSpans(d, "doc_id", "text", w = 4, maxDf = 2)
      .count() === 0L)
    // and with the cap lifted all 3 pairs appear
    assert(DedupText.substringSpans(d, "doc_id", "text", w = 4, maxDf = 3)
      .count() === 3L)
  }

  test("sigAgreement counts equal positions; identical docs agree fully") {
    val d = docs(1L -> "x y z w v u t s", 2L -> "x y z w v u t s",
      3L -> "totally different text here")
    val signed = DedupText.minhashSignaturesExact(d, "doc_id", "text", k = 32)
    val pairs = signed.select($"doc_id".as("i"), $"sig".as("s1"))
      .crossJoin(signed.select($"doc_id".as("j"), $"sig".as("s2")))
      .where($"i" < $"j")
      .select($"i", $"j", DedupText.sigAgreement($"s1", $"s2").as("agree"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) === 32L) // identical text → identical sketch
    assert(pairs((1L, 3L)) < 32L)   // disjoint shingles cannot fully agree
  }

  test("pairShingleOverlap reports exact i/u including zero-overlap pairs") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d x", 3L -> "q r s t u")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val out = DedupText.pairShingleOverlap(d, "doc_id", "text", pairs, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // doc1 shingles {abc,bcd,cde}, doc2 {abc,bcd,cdx}: i=2, u=4
    assert(out((1L, 2L)) === ((2L, 4L)))
    assert(out((1L, 3L)) === ((0L, 6L)))
  }

  test("fuzzyDedup verification removes low-Jaccard LSH candidates") {
    // identical pair clusters together; a doc sharing only a prefix does
    // not (J < 2/3), even if LSH happens to propose it
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(1L -> t, 2L -> t,
      3L -> ("the quick brown unrelated tail " +
        "completely different content goes here now ok"))
    val out = DedupText.fuzzyDedup(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) === 1L && out(2L) === 1L) // merged, canonical = min id
    assert(out(3L) === 3L)                   // stays its own cluster
  }

  test("scd2 applyDelta equals full recompute: extend, change, new key") {
    // key 1: run extends across the cut (same attr); key 2: attr changes
    // at the cut; key 3: appears only in the delta
    val feed = Seq(
      (1L, "a", 10L, "e1"), (1L, "a", 30L, "e3"),
      (2L, "x", 10L, "e2"), (2L, "y", 30L, "e4"),
      (3L, "n", 35L, "e5"), (2L, "y", 40L, "e6"))
      .toDF("k", "attr", "ts", "tie")
    val cut = 25L
    val hist = Scd2.history(feed.where($"ts" < cut), "k", "attr", "ts", "tie")
    val inc = Scd2.applyDelta(hist, feed.where($"ts" >= cut),
      "k", "attr", "ts", "tie")
    val full = Scd2.history(feed, "k", "attr", "ts", "tie")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getBoolean(4))
    assert(inc.collect().map(key).sortBy(_.toString).toSeq ===
      full.collect().map(key).sortBy(_.toString).toSeq)
    // the extended run keeps its ORIGINAL valid_from (no phantom re-open)
    assert(inc.where($"k" === 1L).count() === 1L)
  }

  test("scd2 applyDelta raises when the delta is not strictly later") {
    val feed = Seq((1L, "a", 10L, "e1")).toDF("k", "attr", "ts", "tie")
    val hist = Scd2.history(feed, "k", "attr", "ts", "tie")
    val bad = Seq((1L, "b", 10L, "e2")).toDF("k", "attr", "ts", "tie")
    val e = intercept[Exception] {
      Scd2.applyDelta(hist, bad, "k", "attr", "ts", "tie").count()
    }
    assert(e.getMessage != null)
  }

  test("scd2 applyDelta watermark guard catches compressed-away violations") {
    // (k,a,10),(k,a,20) compress to one run at valid_from=10 — a delta at
    // ts=15 is invisible to the open-run guard but violates the contract;
    // the foldedThrough watermark catches it
    val feed = Seq((1L, "a", 10L, "e1"), (1L, "a", 20L, "e2"))
      .toDF("k", "attr", "ts", "tie")
    val hist = Scd2.history(feed, "k", "attr", "ts", "tie")
    val bad = Seq((1L, "b", 15L, "e3")).toDF("k", "attr", "ts", "tie")
    // without the watermark: passes silently (documented limitation)
    assert(Scd2.applyDelta(hist, bad, "k", "attr", "ts", "tie").count() === 2L)
    // with it: raises
    val e = intercept[Exception] {
      Scd2.applyDelta(hist, bad, "k", "attr", "ts", "tie",
        foldedThrough = Some(lit(20L))).count()
    }
    assert(e.getMessage != null)
    // and a legitimate delta beyond the watermark still folds exactly
    val good = Seq((1L, "b", 25L, "e3")).toDF("k", "attr", "ts", "tie")
    val inc = Scd2.applyDelta(hist, good, "k", "attr", "ts", "tie",
      foldedThrough = Some(lit(20L)))
    val full = Scd2.history(feed.unionByName(good), "k", "attr", "ts", "tie")
    assert(inc.collect().map(_.toString).sorted.toSeq ===
      full.collect().map(_.toString).sorted.toSeq)
  }

  test("cdcChunks partitions the token stream; boundaries re-sync after edits") {
    graft.expr.GraftFunctions.register(spark)
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = "CHANGED " + (2 to 60).map(i => s"tok$i").mkString(" ")
    val d = docs(1L -> base, 2L -> edited, 3L -> "one", 4L -> "a b c")
    val out = d.select($"doc_id", explode(TextOps.cdcChunks($"text")).as("c"))
      .select($"doc_id", $"c.chunk_idx", $"c.start_tok", $"c.n_tok")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1))
    // chunks tile [1, m] exactly: contiguous, no gaps, full coverage
    for ((id, chunks) <- out) {
      val m = Map(1L -> 60L, 2L -> 60L, 3L -> 1L, 4L -> 3L)(id)
      assert(chunks.head._2 === 1L)
      assert(chunks.map(_._3).sum === m)
      chunks.toSeq.sliding(2).foreach {
        case Seq((_, s1, n1), (_, s2, _)) => assert(s2 === s1 + n1)
        case _ =>
      }
    }
    // only token 1 differs and grams at positions >= 2 ignore it, so the
    // boundary sets (and thus all chunks) of docs 1 and 2 coincide — the
    // content-defined re-sync property
    assert(out(1L) === out(2L))
    // short docs (< n+1 tokens) are a single chunk
    assert(out(3L) === Seq((0L, 1L, 1L)))
    assert(out(4L) === Seq((0L, 1L, 3L)))
  }

  test("negativeSamples is deterministic, self-excluding, and ≤ k per anchor") {
    val d = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val run1 = Sampling.negativeSamples(d, "doc_id",
      col("doc_id") % 10 === 0, k = 3, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val run2 = Sampling.negativeSamples(d.repartition(7), "doc_id",
      col("doc_id") % 10 === 0, k = 3, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run1.sorted === run2.sorted) // pure function of the ids
    assert(run1.forall { case (a, _, n) => a != n }) // anchor never drawn
    val perAnchor = run1.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(_ <= 3))
    // every draw j yields at most one row
    assert(run1.groupBy(t => (t._1, t._2)).values.forall(_.size == 1))
  }
}
