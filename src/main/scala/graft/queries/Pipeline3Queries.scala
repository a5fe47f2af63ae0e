package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops._
import Fixtures.Q

/** Round-4 graded queries: exact-substring duplicate spans, sketch-error
  * measurement (MinHash estimate vs exact Jaccard), the verified
  * fuzzy-dedup pipeline end to end, deterministic negative sampling,
  * exact histograms, bag-semantics set ops, and RANGE window frames.
  * Every query hash-matches a DuckDB oracle (the sketch/LSH machinery is
  * on the cross-engine Java-hash family, so even the "approximate" paths
  * are bit-reproducible).
  */
object Pipeline3Queries {

  import PipelineQueries.{docsWithDups, docsWithDupsSql, minhashPairsCtes,
    minhashPairsFencedCtes, javaHashSql}

  /** Unsigned 32-bit Java hash in DuckDB (mirrors Sampling.hu). */
  private def huSql(c: String): String =
    s"""(CASE WHEN ${javaHashSql(c)} < 0
       | THEN ${javaHashSql(c)} + 4294967296
       | ELSE ${javaHashSql(c)} END)""".stripMargin

  /** Shared verification CTEs over the minhash pipeline's `dd`/`sh`:
    * per-doc shingle counts and per-candidate-pair intersection sizes. */
  private[queries] val overlapCtes: String =
    """cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT p.a_id, p.b_id, COUNT(*) AS i
      |  FROM pairs p
      |  JOIN sh a ON a.doc_id = p.a_id
      |  JOIN sh b ON b.doc_id = p.b_id AND b.s = a.s
      |  GROUP BY p.a_id, p.b_id)""".stripMargin

  /** The fuzzy-dedup tail over the minhash CTEs: exact-Jaccard ≥ 2/3
    * verification of the LSH candidates, then connected components via
    * a recursive reach (must sit under WITH RECURSIVE). `reach` labels
    * every `dd` doc with its component minimum — the same canonical rule
    * as Cluster.connectedComponents. Shared by `dd_fuzzy_verified` and
    * the `curate_funnel` composition (which swaps the `dd` base for its
    * gate→exact-dedup prefix via [[PipelineQueries.minhashPairsCtesWith]]). */
  private[queries] val fuzzyVerifyClusterCtes: String =
    s"""$overlapCtes,
       |ver AS (
       |  SELECT i.a_id, i.b_id FROM inter i
       |  JOIN cnt ca ON ca.doc_id = i.a_id
       |  JOIN cnt cb ON cb.doc_id = i.b_id
       |  WHERE i.i * 3 >= (ca.n_sh + cb.n_sh - i.i) * 2),
       |cedges AS (SELECT a_id AS u, b_id AS v FROM ver
       |           UNION SELECT b_id, a_id FROM ver),
       |reach(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM dd
       |  UNION
       |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id)""".stripMargin

  val queries: Map[String, Q] = Map(

    "dd_substring" -> ((s, dir) => {
      // exact-substring duplicate spans: maximal runs of shared 8-token
      // windows; planted exact duplicates must each yield one whole-doc
      // span, organic sentence reuse shows up as shorter runs
      DedupText.substringSpans(docsWithDups(s, dir), "doc_id", "text",
          w = 8, minWindows = 1, maxDf = 64)
        .orderBy("a_id", "b_id", "a_start", "b_start")
    }),

    "dd_minhash_est" -> ((s, dir) => {
      // sketch-error measurement: MinHash agreement count (estimated
      // Jaccard numerator) next to the exact shingle overlap for every
      // LSH candidate pair — all integers, bit-reproducible
      val docs = docsWithDups(s, dir)
      // shingles exploded once (pinned) — signatures AND the exact-overlap
      // verification read the same frame, like fuzzyDedup
      val shAll = Par.fanOut(docs, col("doc_id")).select(col("doc_id"),
          explode(TextOps.shingles(col("text"), 3)).as("s"))
        .pin()
      val signed = DedupText.signaturesFromShingles(shAll, "doc_id")
      val pairs = DedupText.lshCandidatesExact(signed, "doc_id",
        bands = 8, rows = 4)
      val withEst = pairs
        .join(signed.select(col("doc_id").as("a_id"), col("sig").as("asig")),
          "a_id")
        .join(signed.select(col("doc_id").as("b_id"), col("sig").as("bsig")),
          "b_id")
        .select(col("a_id"), col("b_id"),
          DedupText.sigAgreement(col("asig"), col("bsig")).as("n_agree"))
      DedupText.pairShingleOverlapFrom(shAll, "doc_id", pairs)
        .join(withEst, Seq("a_id", "b_id"))
        .select("a_id", "b_id", "n_agree", "i", "u")
        .orderBy("a_id", "b_id")
    }),

    "dd_fuzzy_verified" -> ((s, dir) => {
      // the production fuzzy-dedup composition: boilerplate fence (default
      // maxDocFrac 0.5, mirrored in the fenced oracle CTEs) → LSH
      // candidates → exact Jaccard ≥ 2/3 verification → connected
      // components → canonical map
      DedupText.fuzzyDedup(docsWithDups(s, dir), "doc_id", "text",
          bands = 8, rows = 4, n = 3, num = 2, den = 3)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
          (col("cluster") === col("id")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    "samp_negatives" -> ((s, dir) => {
      // deterministic contrastive negatives: 4 hash-drawn negatives per
      // anchor (every 53rd doc), pure function of the ids
      Sampling.negativeSamples(Tables.documents(s, dir), "doc_id",
          pmod(col("doc_id"), lit(53L)) === 0, k = 4, buckets = 64)
        .orderBy("anchor_id", "j")
    }),

    "agg_histogram" -> ((s, dir) => {
      // exact fixed-width histogram: $5,000 revenue buckets per return
      // flag, integer-cents bucket math (no doubles anywhere)
      val cents = Fixtures.cents("l_extendedprice")
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"),
          call_function("div", cents, lit(500000L)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag", "bucket")
    }),

    "set_except_all" -> ((s, dir) => {
      // bag-semantics difference (EXCEPT ALL): multiplicities subtract,
      // they don't collapse — checked via per-key surviving counts
      val li = Tables.lineitem(s, dir)
      li.where(col("l_quantity") > 25).select("l_suppkey")
        .exceptAll(li.where(col("l_returnflag") === "R").select("l_suppkey"))
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    }),

    "set_intersect_all" -> ((s, dir) => {
      // bag-semantics intersection (INTERSECT ALL): per-key min of the
      // two multiplicities
      val li = Tables.lineitem(s, dir)
      li.where(col("l_quantity") > 45).select("l_suppkey")
        .intersectAll(li.where(col("l_returnflag") === "R").select("l_suppkey"))
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    }),

    "inc_scd2_delta" -> ((s, dir) => {
      // incremental SCD2: fold the post-Cut delta into the pre-Cut
      // history; must equal a full recompute bit-for-bit (the oracle IS
      // the full recompute)
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_type"), col("ts_ms"), col("event_id"))
      val hist = Scd2.history(ev.where(col("ts_ms") < Fixtures.CutMs),
        "user_id", "event_type", "ts_ms", "event_id")
      Scd2.applyDelta(hist, ev.where(col("ts_ms") >= Fixtures.CutMs),
          "user_id", "event_type", "ts_ms", "event_id",
          foldedThrough = Some(lit(Fixtures.CutMs - 1)))
        .orderBy("user_id", "valid_from")
    }),

    "txt_cdc" -> ((s, dir) => {
      // content-defined chunking: boundaries where the rolling 3-gram
      // hash ≡ 0 (mod 16) — chunk identity survives document edits
      graft.expr.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextOps.cdcChunks(col("text"))).as("c"))
        .select(col("doc_id"), col("c.chunk_idx"), col("c.start_tok"),
          col("c.n_tok"))
        .orderBy("doc_id", "chunk_idx")
    }),

    "q21_exists_chain" -> ((s, dir) => {
      // TPC-H Q21 shape: per supplier, orders where it shipped a returned
      // line, at least one OTHER supplier participated (EXISTS), and no
      // other supplier had a returned line (NOT EXISTS) — semi- then
      // anti-join with residual inequality on the same fact table
      val l = Tables.lineitem(s, dir)
      // no distinct on the semi/anti probe sides — the (semi|anti) hash
      // build deduplicates implicitly, a pre-distinct is a wasted shuffle
      val lo = l.select("l_orderkey", "l_suppkey")
      val r = l.where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_suppkey").distinct()
      val step1 = r.as("t").join(lo.as("o"),
        col("t.l_orderkey") === col("o.l_orderkey") &&
          col("t.l_suppkey") =!= col("o.l_suppkey"), "left_semi")
      val step2 = step1.as("t").join(r.as("o2"),
        col("t.l_orderkey") === col("o2.l_orderkey") &&
          col("t.l_suppkey") =!= col("o2.l_suppkey"), "left_anti")
      step2.join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    }),

    "q22_acctbal" -> ((s, dir) => {
      // TPC-H Q22 shape: customers with no URGENT orders whose balance
      // exceeds the mean positive balance — the mean comparison
      // cross-multiplied to exact integers (cents·n > sum), no float
      // division anywhere (every fixture customer has SOME order, so the
      // anti-join side is the urgent slice)
      val c = Tables.customer(s, dir)
      val pos = c.where(col("c_acctbal") > 0)
        .agg(count(lit(1)).as("n_pos"),
          sum(Fixtures.cents("c_acctbal")).as("sum_pos"))
      c.join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .crossJoin(broadcast(pos))
        .where(Fixtures.cents("c_acctbal") * col("n_pos") > col("sum_pos"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(Fixtures.cents("c_acctbal")).as("totacctbal_cents"))
        .orderBy("c_nationkey")
    }),

    "agg_mode" -> ((s, dir) => {
      // MODE() with a deterministic tie-break (max count, then smallest
      // value) — groupBy count + one windowed argmax, no driver collect
      val counts = Tables.orders(s, dir)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("n").desc, col("o_orderpriority").asc)
      counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_orderstatus"),
          col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy("o_orderstatus")
    }),

    "asof_tolerance" -> ((s, dir) => {
      // as-of join with a max-lookback tolerance (pandas merge_asof
      // semantics): the latest prior click only counts within 1 hour —
      // the latest prior is by definition the closest, so a post-filter
      // on the matched row is exact
      val ev = Tables.events(s, dir)
      val j = AsOf.join(
        left = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"), col("event_id")),
        right = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("ts_ms"), col("event_id")),
        key = "user_id", time = "ts_ms",
        leftId = "event_id", rightId = "event_id")
      val ok = col("asof_time").isNotNull &&
        (col("ts_ms") - col("asof_time")) <= 3600000L
      j.select(col("user_id"), col("ts_ms"), col("event_id"),
          when(ok, col("asof_id")).as("asof_id"),
          when(ok, col("asof_time")).as("asof_time"))
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    "w3_range_frame" -> ((s, dir) => {
      // value-RANGE window frame: trailing-30-day revenue per customer —
      // peers (same day) enter the frame together, unlike a ROWS frame
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01")).as("d"),
          Fixtures.cents("o_totalprice").as("cents"))
      val w = Window.partitionBy("o_custkey").orderBy("d")
        .rangeBetween(-30, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"),
          col("d").cast("long").as("d"),
          sum("cents").over(w).as("trail30_cents"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(

    "dd_substring" ->
      s"""WITH dd AS ($docsWithDupsSql),
         |t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM dd),
         |wins AS (
         |  SELECT doc_id, CAST(i.pos AS INTEGER) AS pos,
         |    array_to_string(ws[i.pos:i.pos+7], '_') AS win
         |  FROM t, unnest(range(1, len(ws) - 6)) AS i(pos)
         |  WHERE len(ws) >= 8),
         |rare AS (SELECT win FROM wins GROUP BY win
         |         HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 64),
         |kept AS (SELECT w.* FROM wins w JOIN rare USING (win)),
         |hits AS (
         |  SELECT a.doc_id AS a_id, a.pos AS a_pos,
         |         b.doc_id AS b_id, b.pos AS b_pos
         |  FROM kept a JOIN kept b
         |    ON a.win = b.win AND a.doc_id < b.doc_id),
         |isl AS (
         |  SELECT a_id, b_id, a_pos - b_pos AS d, a_pos, b_pos,
         |    a_pos - ROW_NUMBER() OVER (
         |      PARTITION BY a_id, b_id, a_pos - b_pos ORDER BY a_pos) AS isl
         |  FROM hits)
         |SELECT a_id, b_id,
         |  CAST(MIN(a_pos) AS BIGINT) AS a_start,
         |  CAST(MIN(b_pos) AS BIGINT) AS b_start,
         |  COUNT(*) + 7 AS n_tokens
         |FROM isl GROUP BY a_id, b_id, d, isl
         |ORDER BY a_id, b_id, a_start, b_start""".stripMargin,

    "dd_minhash_est" ->
      s"""WITH $minhashPairsCtes,
         |$overlapCtes,
         |ag AS (
         |  SELECT p.a_id, p.b_id,
         |    CAST(${(0 until 32).map(j =>
               s"(CASE WHEN l.m$j = r.m$j THEN 1 ELSE 0 END)")
               .mkString(" + ")} AS BIGINT) AS n_agree
         |  FROM pairs p
         |  JOIN sig l ON l.doc_id = p.a_id
         |  JOIN sig r ON r.doc_id = p.b_id)
         |SELECT g.a_id, g.b_id, g.n_agree,
         |  COALESCE(i.i, 0) AS i,
         |  ca.n_sh + cb.n_sh - COALESCE(i.i, 0) AS u
         |FROM ag g
         |LEFT JOIN inter i ON i.a_id = g.a_id AND i.b_id = g.b_id
         |JOIN cnt ca ON ca.doc_id = g.a_id
         |JOIN cnt cb ON cb.doc_id = g.b_id
         |ORDER BY g.a_id, g.b_id""".stripMargin,

    "dd_fuzzy_verified" ->
      // fenced CTEs: the oracle's final `sh` is the boilerplate-filtered
      // shingle set, so signatures AND the Jaccard verifier below mirror
      // fuzzyDedup's default maxDocFrac = 0.5 configuration
      s"""WITH RECURSIVE $minhashPairsFencedCtes,
         |$fuzzyVerifyClusterCtes
         |SELECT id AS doc_id, MIN(lbl) AS cluster_id,
         |  MIN(lbl) = id AS is_canonical
         |FROM reach GROUP BY id
         |ORDER BY doc_id""".stripMargin,

    "samp_negatives" ->
      s"""WITH anchors AS (
         |  SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 53 = 0),
         |draws AS (
         |  SELECT anchor_id, j.j,
         |    ${huSql("anchor_id || '_' || j.j")} % 64 AS b
         |  FROM anchors, unnest(range(0, 4)) AS j(j)),
         |cand AS (
         |  SELECT doc_id AS cand_id,
         |    ${huSql("CAST(doc_id AS VARCHAR)")} % 64 AS b
         |  FROM documents),
         |joined AS (
         |  SELECT d.anchor_id, d.j, c.cand_id,
         |    ${huSql("c.cand_id || '_' || d.anchor_id || '_' || d.j")} AS h
         |  FROM draws d JOIN cand c USING (b)
         |  WHERE c.cand_id <> d.anchor_id)
         |SELECT anchor_id, CAST(j AS BIGINT) AS j, cand_id AS neg_id
         |FROM (SELECT *, ROW_NUMBER() OVER (
         |        PARTITION BY anchor_id, j ORDER BY h, cand_id) AS rn
         |      FROM joined)
         |WHERE rn = 1
         |ORDER BY anchor_id, j""".stripMargin,

    "agg_histogram" ->
      s"""SELECT l_returnflag,
         |  ${Fixtures.centsSql("l_extendedprice")} // 500000 AS bucket,
         |  COUNT(*) AS n
         |FROM lineitem
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "set_except_all" ->
      """SELECT l_suppkey, COUNT(*) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "set_intersect_all" ->
      """SELECT l_suppkey, COUNT(*) AS n FROM (
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "inc_scd2_delta" ->
      // the oracle is the FULL recompute — the incremental fold must be
      // indistinguishable from it
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
        |                  event_id FROM events),
        |m AS (SELECT *, lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev,
        |      row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn
        |      FROM e),
        |c AS (SELECT user_id, event_type, ts_ms, event_id FROM m
        |      WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, ts_ms AS valid_from,
        |  lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |    AS valid_to,
        |  (lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
        |    IS NULL) AS is_current
        |FROM c ORDER BY user_id, valid_from""".stripMargin,

    "txt_cdc" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
         |           FROM documents),
         |b AS (SELECT doc_id, len(ws) AS m,
         |  list_prepend(CAST(1 AS BIGINT),
         |    CASE WHEN len(ws) >= 4 THEN
         |      list_filter(range(2, len(ws) - 1),
         |        i -> ${huSql("ws[i] || '_' || ws[i+1] || '_' || ws[i+2]")}
         |             % 16 = 0)
         |    ELSE CAST([] AS BIGINT[]) END) AS starts
         |  FROM t)
         |SELECT doc_id, CAST(k - 1 AS BIGINT) AS chunk_idx,
         |  CAST(starts[k] AS BIGINT) AS start_tok,
         |  CAST((CASE WHEN k < len(starts) THEN starts[k + 1]
         |        ELSE m + 1 END) - starts[k] AS BIGINT) AS n_tok
         |FROM b, unnest(range(1, len(starts) + 1)) AS u(k)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q21_exists_chain" ->
      """SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        |      WHERE l_returnflag = 'R') t
        |JOIN supplier ON s_suppkey = t.l_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |  WHERE l2.l_orderkey = t.l_orderkey
        |    AND l2.l_suppkey <> t.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |  WHERE l3.l_orderkey = t.l_orderkey
        |    AND l3.l_suppkey <> t.l_suppkey AND l3.l_returnflag = 'R')
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,

    "q22_acctbal" ->
      s"""WITH pos AS (
         |  SELECT COUNT(*) AS n_pos,
         |    CAST(SUM(${Fixtures.centsSql("c_acctbal")}) AS BIGINT) AS sum_pos
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_nationkey, COUNT(*) AS numcust,
         |  CAST(SUM(${Fixtures.centsSql("c_acctbal")}) AS BIGINT)
         |    AS totacctbal_cents
         |FROM customer, pos
         |WHERE ${Fixtures.centsSql("c_acctbal")} * n_pos > sum_pos
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderpriority = '1-URGENT')
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "agg_mode" ->
      """WITH counts AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |        ORDER BY n DESC, o_orderpriority ASC) AS rn
        |      FROM counts)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "asof_tolerance" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |      FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.ts_ms, p.event_id,
        |  CASE WHEN p.ts_ms - m.asof_time <= 3600000
        |       THEN m.asof_id END AS asof_id,
        |  CASE WHEN p.ts_ms - m.asof_time <= 3600000
        |       THEN m.asof_time END AS asof_time
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS asof_id, c.ts_ms AS asof_time FROM c
        |  WHERE c.user_id = p.user_id AND c.ts_ms <= p.ts_ms
        |  ORDER BY c.ts_ms DESC, c.event_id DESC LIMIT 1) m ON true
        |ORDER BY p.user_id, p.ts_ms, p.event_id""".stripMargin,

    "w3_range_frame" ->
      s"""SELECT o_custkey, o_orderkey,
         |  CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         |  CAST(SUM(${Fixtures.centsSql("o_totalprice")}) OVER (
         |    PARTITION BY o_custkey
         |    ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail30_cents
         |FROM orders
         |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
