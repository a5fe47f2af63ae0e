package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Multimodal, Sampling}

/** Round-10 fifth batch: the export/gate ring — rendezvous-hash shard
  * assignment (the consistent-sharding rule with the minimal-disruption
  * guarantee), a frame-energy voice-activity gate over binary payloads
  * (the audio-curation analog of the text quality gates), and the
  * day-of-week seasonal profile of the daily order series (the seasonal
  * component of a decomposition, in sufficient-statistic form). All
  * graded values are exact BIGINTs. */
object Pipeline21Queries {

  type Q = (SparkSession, String) => DataFrame

  private[queries] val HrwShards: Seq[String] =
    (0 until 8).map(i => s"s$i")
  private[queries] val HrwSalt = "hrw"
  private val VadFrames = 16

  val queries: Map[String, Q] = Map(

    "samp_rendezvous" -> ((s, dir) => {
      // rendezvous (HRW) shard assignment of the corpus: each doc to
      // argmax_shard mix32(hash(salt‖doc_id) XOR hash(salt‖shard)) —
      // XOR of the two independently-hashed halves, then a final
      // avalanche, the construction Sampling.rendezvousAssign measured
      // as non-degenerate (a one-round polynomial hash is affine in
      // the shard, and even re-hashing the concatenation kept the
      // per-shard ordering correlated). Pure codegen'd map, no shuffle;
      // adding a shard later moves ONLY the docs the new shard wins
      // (spec-pinned), which is why exports shard this way instead of
      // doc_id % n.
      Sampling.rendezvousAssign(
          Tables.documents(s, dir).select("doc_id"),
          col("doc_id"), HrwShards, HrwSalt)
        .select("doc_id", "shard")
        .orderBy("doc_id")
    }),

    "mm_audio_vad" -> ((s, dir) => {
      // frame-energy VAD gate over the media payloads: 16 equal frames
      // per asset (one codegen'd block_sums pass — the mm_phash
      // machinery), voiced = frame energy strictly above the payload
      // mean (division-free cross-multiply). Emits the curation
      // features: voiced-frame count, leading-silence length, peak
      // frame + energy. One synthetic FLAT asset (media_id -1, all
      // frames equal) is unioned in so the no-voiced-frame branch
      // (lead_silence = frames sentinel) is graded, not just spec'd.
      Multimodal.audioVad(
          Multimodal.mediaFromDocuments(s, dir).toDF()
            .select("media_id", "payload")
            .unionByName(s.range(1).select(
              lit(-1L).as("media_id"),
              encode(lit("a" * VadFrames), "UTF-8").as("payload"))),
          "payload", frames = VadFrames)
        .select("media_id", "n_voiced", "lead_silence", "peak_b",
          "peak_energy")
        .orderBy("media_id")
    }),

    "ts_dow_profile" -> ((s, dir) => {
      // day-of-week seasonal profile of the daily order-count series
      // per priority (the ts_acf/ts_snaive series): per (pri, dow) the
      // day count, total and range — the seasonal component of an
      // additive decomposition as exact sufficient statistics (means
      // assemble downstream as total/n_days). dow is epoch-day mod 7
      // (0 = Thursday), an engine-neutral integer — no locale-
      // dependent DAYOFWEEK on either side. The profile frame is
      // |pri|×7 rows; everything reduces map-side.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      daily
        .withColumn("dow",
          pmod(datediff(col("day"), to_date(lit("1970-01-01"))), lit(7))
            .cast("long"))
        .groupBy("pri", "dow")
        .agg(count(lit(1)).as("n_days"), sum("x").as("total"),
          min("x").as("x_min"), max("x").as("x_max"))
        .orderBy("pri", "dow")
    })
  )

  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"
  }

  val oracles: Map[String, String] = Map(

    "samp_rendezvous" -> {
      // per-shard u32 words are plan-time constants — inline them, so
      // the oracle shares ONLY the integer mixer with the operator
      val shardVals = HrwShards.map { sh =>
        val g = (HrwSalt + sh).hashCode.toLong & 0xFFFFFFFFL
        s"('$sh', CAST($g AS BIGINT))"
      }.mkString(", ")
      def mixSql(x: String): String = {
        def round(v: String) =
          s"((xor($v >> 16, $v) * 73244475) % 4294967296)"
        val a = round(round(x))
        s"xor($a >> 16, $a)"
      }
      s"""WITH sh AS (SELECT * FROM (VALUES $shardVals) t(shard, g)),
         |h1 AS (SELECT doc_id,
         |    ${huSql(s"'$HrwSalt' || CAST(doc_id AS VARCHAR)")} AS hk
         |  FROM documents),
         |hx AS (SELECT d.doc_id, sh.shard,
         |    ${mixSql("xor(d.hk, sh.g)")} AS h
         |  FROM h1 d, sh),
         |rk AS (SELECT doc_id, shard,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY h DESC, shard DESC) AS rn FROM hx)
         |SELECT doc_id, shard FROM rk WHERE rn = 1
         |ORDER BY doc_id""".stripMargin
    },

    "mm_audio_vad" ->
      // the phashCtes block machinery at 16 frames + the VAD decision
      s"""WITH ch AS (SELECT doc_id, string_split_regex(text, '') AS s
         |       FROM documents
         |     UNION ALL
         |     SELECT CAST(-1 AS BIGINT),
         |       string_split_regex(repeat('a', $VadFrames), '')),
         |tok AS (SELECT doc_id, CAST(ii - 1 AS BIGINT) AS i0,
         |    CAST(unicode(s[ii]) AS BIGINT) AS code,
         |    CAST(len(s) AS BIGINT) AS n
         |  FROM ch, unnest(range(1, len(s) + 1)) AS u(ii)),
         |bs0 AS (SELECT doc_id, i0 * $VadFrames // n AS b,
         |    SUM(code) AS sm FROM tok GROUP BY 1, 2),
         |sp AS (SELECT d.doc_id, bb.b
         |  FROM (SELECT DISTINCT doc_id FROM tok) d,
         |    (SELECT CAST(x AS BIGINT) AS b
         |     FROM unnest(range(0, $VadFrames)) t(x)) bb),
         |bs AS (SELECT sp.doc_id, sp.b, COALESCE(bs0.sm, 0) AS sm
         |  FROM sp LEFT JOIN bs0 ON sp.doc_id = bs0.doc_id
         |    AND sp.b = bs0.b),
         |tt AS (SELECT doc_id, SUM(sm) AS tot FROM bs GROUP BY 1),
         |va AS (SELECT bs.doc_id AS media_id,
         |    CAST(SUM(CASE WHEN $VadFrames * bs.sm > tt.tot
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_voiced,
         |    CAST(COALESCE(MIN(CASE WHEN $VadFrames * bs.sm > tt.tot
         |      THEN bs.b END), $VadFrames) AS BIGINT) AS lead_silence,
         |    CAST(MAX(bs.sm) AS BIGINT) AS peak_energy
         |  FROM bs JOIN tt USING (doc_id) GROUP BY 1),
         |pk AS (SELECT bs.doc_id AS media_id,
         |    CAST(MIN(bs.b) AS BIGINT) AS peak_b
         |  FROM bs JOIN va ON va.media_id = bs.doc_id
         |    AND bs.sm = va.peak_energy
         |  GROUP BY 1)
         |SELECT va.media_id, va.n_voiced, va.lead_silence, pk.peak_b,
         |  va.peak_energy
         |FROM va JOIN pk USING (media_id)
         |ORDER BY media_id""".stripMargin,

    "ts_dow_profile" ->
      """WITH daily AS (SELECT o_orderpriority AS pri,
        |    CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
        |  FROM orders GROUP BY 1, 2),
        |d2 AS (SELECT pri,
        |    CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow, x
        |  FROM daily)
        |SELECT pri, dow, COUNT(*) AS n_days,
        |  CAST(SUM(x) AS BIGINT) AS total,
        |  CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max
        |FROM d2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
