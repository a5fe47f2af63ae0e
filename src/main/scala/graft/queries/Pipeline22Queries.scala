package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.Similarity

/** Round-10 sixth batch: multiprobe sign-LSH serving (Lv et al. 2007 —
  * one table, flip-neighbor probes: the memory-constrained ANN knob)
  * with its graded recall audit, and skip-gram window co-occurrence
  * extraction (the word2vec/GloVe training-pair stage). Exact-integer
  * convention throughout: graded columns are ids, ranks and counts. */
object Pipeline22Queries {

  type Q = (SparkSession, String) => DataFrame

  private val MpPlanes = 6  // one 6-plane table → 64 buckets, 7 probes
  private val SgWindow = 4  // skip-gram window (distances 1..4)
  private val SgTopK = 50

  val queries: Map[String, Q] = Map(

    "sim_lsh_multiprobe" -> ((s, dir) => {
      // one-table multiprobe LSH: the query probes its own bucket plus
      // the 6 one-bit flips (the boundary-adjacent buckets where true
      // neighbors land when a hyperplane splits them). 1× index memory
      // vs lshTopK's 4 tables; fan-out rides the query side only.
      val emb = Tables.embeddings(s, dir)
      Similarity.lshMultiprobeTopK(emb,
          emb.where(col("vec_id") % 50 === 0), k = 5, planes = MpPlanes)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")
    }),

    "sim_recall_multiprobe" -> ((s, dir) => {
      // the recall half of the memory trade: per-probe overlap of the
      // multiprobe top-5 with the exact float top-5 — graded next to
      // sim_recall_lsh (4 tables) so the 1-table-vs-4 recall cost is a
      // measured number, not a hope.
      val emb = Tables.embeddings(s, dir)
      val probes = emb.where(col("vec_id") % 50 === 0)
      val exact = Similarity.bruteForceTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val mp = Similarity.lshMultiprobeTopK(emb, probes, 5,
          planes = MpPlanes)
        .select("query_id", "neighbor_id")
      val common = exact.join(mp, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      exact.select("query_id").distinct()
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_common"))
        .orderBy("query_id")
    }),

    "txt_skipgram" -> ((s, dir) => {
      // skip-gram window co-occurrence: distance-labeled token pairs
      // (w, ws[i+d]) for d ≤ 4 — the word2vec/GloVe training-pair
      // extraction stage. Pair generation is a pure map-side array
      // transform per document (NO self-join on positions); counts
      // partial-aggregate, and the top-50 rides TakeOrderedAndProject
      // (distributed top-k — the count frame is vocab²-sized and never
      // globally sorted; only the 50 survivors see a rank window).
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val pairCols = (1 to SgWindow).map { d =>
        expr(s"""CASE WHEN size(ws) > $d THEN
                |  transform(slice(ws, 1, size(ws) - $d),
                |    (w, i) -> struct(w AS w1, ws[i + $d] AS w2,
                |      CAST($d AS BIGINT) AS d))
                |ELSE array() END""".stripMargin)
      }
      val cnt = docs
        .select(explode(flatten(array(pairCols: _*))).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"),
          col("p.d").as("d"))
        .where(col("w1") =!= "" && col("w2") =!= "")
        .groupBy("w1", "w2", "d").agg(count(lit(1)).as("n"))
      val top = cnt.orderBy(col("n").desc, col("w1").asc,
        col("w2").asc, col("d").asc).limit(SgTopK)
      top.withColumn("rnk", row_number().over(
          Window.orderBy(col("n").desc, col("w1").asc, col("w2").asc,
            col("d").asc)).cast("long")) // 50-row frame, bounded
        .select("rnk", "w1", "w2", "d", "n")
        .orderBy("rnk")
    })
  )

  /** DuckDB bucket bits for hash table 0 — the sim_lsh_topk oracle's
    * plane-literal embedding, single-table slice. */
  private def bucket0Sql: String = (0 until MpPlanes).map { p =>
    val signs = (0 until 64)
      .map(i => if (Similarity.planeSign(p, i) > 0) "1" else "-1")
      .mkString(", ")
    s"""(CASE WHEN list_sum(list_transform(
       |      list_zip(embedding, [$signs]),
       |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) > 0
       |    THEN ${1L << p} ELSE 0 END)""".stripMargin
  }.mkString("\n    + ")

  private def multiprobeCtes: String = {
    val flips = (Seq("b0") ++
      (0 until MpPlanes).map(p => s"xor(b0, ${1L << p})")).mkString(", ")
    s"""eb AS (SELECT vec_id,
       |    $bucket0Sql AS b0
       |  FROM embeddings),
       |pbk AS (SELECT vec_id, unnest([$flips]) AS bucket
       |  FROM eb WHERE vec_id % 50 = 0),
       |cand AS (SELECT DISTINCT p.vec_id AS query_id,
       |    c.vec_id AS neighbor_id
       |  FROM pbk p JOIN eb c ON c.b0 = p.bucket
       |  WHERE c.vec_id <> p.vec_id),
       |scored AS (SELECT cand.query_id, cand.neighbor_id,
       |    ${PipelineQueries.cosSql("qe.embedding", "ce.embedding")} AS cos
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id),
       |mrk AS (SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id ASC) AS rnk
       |  FROM scored)""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "sim_lsh_multiprobe" ->
      s"""WITH $multiprobeCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id
         |FROM mrk WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    "sim_recall_multiprobe" -> {
      val ex = PipelineQueries.oracles("sim_cosine_topk")
      s"""WITH ex AS ($ex),
         |$multiprobeCtes,
         |mp AS (SELECT query_id, neighbor_id FROM mrk WHERE rnk <= 5),
         |p AS (SELECT DISTINCT query_id FROM ex),
         |cc AS (SELECT ex.query_id, COUNT(*) AS n FROM ex
         |  JOIN mp ON ex.query_id = mp.query_id
         |    AND ex.neighbor_id = mp.neighbor_id
         |  GROUP BY ex.query_id)
         |SELECT p.query_id, CAST(COALESCE(cc.n, 0) AS BIGINT) AS n_common
         |FROM p LEFT JOIN cc ON p.query_id = cc.query_id
         |ORDER BY p.query_id""".stripMargin
    },

    "txt_skipgram" ->
      s"""WITH dv AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |pr AS (SELECT ws[ii] AS w1, ws[ii + dd.d] AS w2,
         |    CAST(dd.d AS BIGINT) AS d
         |  FROM dv,
         |    unnest(range(1, len(ws) + 1)) u(ii),
         |    (VALUES (1), (2), (3), (4)) dd(d)
         |  WHERE ii + dd.d <= len(ws)
         |    AND ws[ii] <> '' AND ws[ii + dd.d] <> ''),
         |cnt AS (SELECT w1, w2, d, COUNT(*) AS n FROM pr
         |  GROUP BY 1, 2, 3),
         |srk AS (SELECT w1, w2, d, n,
         |    ROW_NUMBER() OVER (ORDER BY n DESC, w1 ASC, w2 ASC, d ASC)
         |      AS rnk
         |  FROM cnt)
         |SELECT CAST(rnk AS BIGINT) AS rnk, w1, w2, d, n
         |FROM srk WHERE rnk <= $SgTopK
         |ORDER BY rnk""".stripMargin
  )
}
