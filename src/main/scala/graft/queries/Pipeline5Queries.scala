package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._
import Fixtures._

/** Round-5 additions: measured recall for the sign-LSH ANN path (the IVF
  * path already publishes one via `sim_recall`), so BOTH approximate
  * indexes ship with an oracle-graded recall figure next to the exact
  * baseline.
  */
object Pipeline5Queries {

  val queries: Map[String, Q] = Map(

    "samp_token_budget" -> ((s, dir) => {
      // budgeted corpus selection: best-scoring docs (tokens-per-char
      // per-mille — a coarse integer quality proxy) until 20k tokens are
      // spent. The scale path is the bucket pre-pass + marginal-class
      // window in Sampling.tokenBudget — no global one-task sort; the
      // oracle IS the naive global cumsum, which pins the equivalence.
      val d = Tables.documents(s, dir).where(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          graft.ops.TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
        .select(col("doc_id"),
          call_function("div", col("n_tok") * 1000, col("n_chars"))
            .as("score"),
          col("n_tok"))
      Sampling.tokenBudget(d, "score", "n_tok", "doc_id", budget = 20000L)
        .select("doc_id", "score", "n_tok")
        .orderBy("doc_id")
    }),

    "sim_recall_lsh" -> ((s, dir) => {
      // ANN observability: per-probe overlap between the sign-LSH index's
      // top-5 and the exact top-5. Both rankings are deterministic (the
      // hyperplane matrix is a plan-time constant), so the overlap is an
      // exact integer the oracle reproduces end-to-end.
      graft.expr.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val probes = emb.where(col("vec_id") % 50 === 0)
      val exact = Similarity.bruteForceTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val lsh = Similarity.lshTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val common = exact.join(lsh, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      exact.select("query_id").distinct()
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_common"))
        .orderBy("query_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "samp_token_budget" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) * 1000 // n_chars
        |    AS score
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT *, SUM(n_tok) OVER (ORDER BY score DESC, doc_id ASC
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM s)
        |SELECT doc_id, score, n_tok FROM r WHERE cum <= 20000
        |ORDER BY doc_id""".stripMargin,

    "sim_recall_lsh" -> {
      // composed from the two graded rankings' own oracles
      val ex = PipelineQueries.oracles("sim_cosine_topk")
      val ls = PipelineQueries.oracles("sim_lsh_topk")
      s"""WITH ex AS ($ex),
         |ls AS ($ls),
         |p AS (SELECT DISTINCT query_id FROM ex),
         |c AS (SELECT ex.query_id, COUNT(*) AS n FROM ex
         |  JOIN ls ON ex.query_id = ls.query_id
         |    AND ex.neighbor_id = ls.neighbor_id
         |  GROUP BY ex.query_id)
         |SELECT p.query_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_common
         |FROM p LEFT JOIN c ON p.query_id = c.query_id
         |ORDER BY p.query_id""".stripMargin
    }
  )
}
