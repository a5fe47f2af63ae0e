package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops._
import Fixtures.{Q, cents}

/** Round-4 batches 2–3: corpus-frequency heavy hitters (Misra-Gries,
  * exact by recount), sequence packing (concat-and-chunk and greedy
  * no-split), deterministic shard shuffle and weighted resampling,
  * forward-fill / grid resample / time-weighted means for event streams,
  * interval-overlap and SCD2 point-in-time joins, the full as-of family
  * (forward / nearest), incremental LSH maintenance, semantic and binary
  * multimodal dedup, equi-depth / winsorized / typed-top-k aggregation,
  * inverted index, URL canonicalization, cohort retention, TPC-H Q7
  * shape, and data-quality gates. Everything is integer math or
  * pass-through selection of parquet values, so every query hash-matches
  * its DuckDB oracle.
  */
object Pipeline4Queries {

  import PipelineQueries.javaHashSql

  /** Unsigned 32-bit Java hash in DuckDB (mirrors Sampling.hu). */
  private def huSql(c: String): String =
    s"""(CASE WHEN ${javaHashSql(c)} < 0
       | THEN ${javaHashSql(c)} + 4294967296
       | ELSE ${javaHashSql(c)} END)""".stripMargin

  /** documents with an exact whitespace token count (long). */
  private def docsWithLen(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  private val docsWithLenSql =
    """SELECT source, doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |FROM documents""".stripMargin

  /** per-doc distinct bigrams (token array let-bound in TextOps.bigrams). */
  private def bigramTok(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(TextOps.bigrams(col("text")))).as("w"))

  private val bigramTokSql =
    """SELECT DISTINCT doc_id, unnest(
      |    list_transform(range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i] || '_' ||
      |           string_split(text, ' ')[i + 1])) AS w
      |FROM documents""".stripMargin

  val queries: Map[String, Q] = Map(

    "agg_heavy_hitters" -> ((s, dir) => {
      // exact heavy hitters without a full-vocabulary shuffle: per-partition
      // Misra-Gries candidates (superset guarantee) → broadcast semi-join →
      // exact recount of candidates only. Result ≡ GROUP BY + HAVING.
      val tok = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
      Freq.heavyHitters(tok, "w", k = 100).orderBy("w")
    }),

    "samp_pack_chunks" -> ((s, dir) => {
      // concat-and-chunk sequence packing: documents laid end to end per
      // source, cut every 512 tokens; straddling docs contribute one piece
      // per bin. Closed-form window math — fully parallel at any scale.
      Packing.packChunks(docsWithLen(s, dir), "source", "doc_id",
          "n_tokens", budget = 512L)
        .orderBy("source", "doc_id", "bin")
    }),

    "samp_pack_greedy" -> ((s, dir) => {
      // no-split first-fit packing in doc order: one shuffle on source,
      // then a sorted streaming pass with O(1) state per partition
      Packing.greedyPack(docsWithLen(s, dir), "source", "doc_id",
          "n_tokens", budget = 512L)
        .orderBy("source", "doc_id")
    }),

    "samp_shuffle_shards" -> ((s, dir) => {
      // deterministic global shuffle into 8 training shards: shard and
      // in-shard position both derive from the salted hash — reproducible
      // on any engine, no global sort, no driver-side index
      Sampling.shuffleShards(Tables.orders(s, dir).select("o_orderkey"),
          col("o_orderkey"), salt = "r4", nShards = 8)
        .select("o_orderkey", "shard", "pos")
        .orderBy("shard", "pos")
    }),

    "w4_fill_forward" -> ((s, dir) => {
      // forward-fill nulls from the latest preceding observation per user
      // (every 5th event's value is masked to create the gaps; leading
      // nulls stay null). Pure pass-through of parquet doubles — bit-exact.
      val e = Tables.events(s, dir)
        .withColumn("v", when(col("event_id") % 5 === 0, lit(null))
          .otherwise(col("value")))
      TimeSeries.fillForward(e, Seq("user_id"),
          Seq(col("ts_ms").asc, col("event_id").asc), "v", "v_filled")
        .select("user_id", "event_id", "ts_ms", "v", "v_filled")
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    "ts_resample" -> ((s, dir) => {
      // regularize each user's stream onto a daily grid over their observed
      // span, carrying the last value at/before each day; n_obs counts the
      // day's own events (0 on filled days)
      val e = Tables.events(s, dir)
      TimeSeries.resampleSteps(e, Seq("user_id"),
          expr("ts_ms div 86400000"), struct(col("ts_ms"), col("event_id")),
          "value", stepOut = "day", out = "v_last")
        .select("user_id", "day", "v_last", "n_obs")
        .orderBy("user_id", "day")
    }),

    "range_overlap_join" -> ((s, dir) => {
      // interval×interval overlap join via shared-bin equi-join (6h bins),
      // deduped by the first-shared-bin predicate — no dedup shuffle.
      // A = per-(user, day) activity spans, B = per-(type, week) spans.
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_ms"),
          expr("ts_ms div 86400000").as("day"),
          expr("ts_ms div 604800000").as("week"))
      val a = e.groupBy("user_id", "day").agg(
        min("ts_ms").as("a_s"), (max("ts_ms") + 1).as("a_e"))
        .withColumnRenamed("day", "a_day")
      val b = e.groupBy("event_type", "week").agg(
        min("ts_ms").as("b_s"), (max("ts_ms") + 1).as("b_e"))
        .withColumnRenamed("week", "b_week")
      RangeBin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e",
          equiKeys = Nil, binWidth = 21600000L)
        .select(col("user_id"), col("a_day"), col("event_type"),
          col("b_week"),
          (least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s"))).as("overlap_ms"))
        .orderBy("user_id", "a_day", "event_type", "b_week")
    }),

    "agg_equidepth" -> ((s, dir) => {
      // equi-depth histogram: NTILE(8) per returnflag over a total order
      // (price, orderkey, linenumber), then per-bucket count/min/max.
      // min/max are selections of parquet doubles — no FP arithmetic.
      // Scale note: the window partitions by a 3-value key, so each
      // group's sort is ONE task however many executors exist — the
      // inherent cost of EXACT rank statistics on a low-cardinality key
      // (measured 7.3× at the sf1 decade; it spills, it does not OOM).
      // At 100 TB graduate to the graded GK twin `agg_equidepth_approx`
      // (Pipeline7Queries): sketch boundaries + broadcast bucketing,
      // no per-group total-order task; keep this as the exact oracle
      // anchor.
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .withColumn("bucket", ntile(8).over(w).cast("long"))
        .groupBy("l_returnflag", "bucket")
        .agg(count(lit(1)).as("cnt"),
          min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
        .orderBy("l_returnflag", "bucket")
    }),

    "w5_debounce" -> ((s, dir) => {
      // debounce: drop an event arriving within 60s of the PREVIOUS event
      // of the same (user, type) — duplicate-burst suppression for event
      // feeds; lag-based (compares to the previous event, kept or not),
      // one window pass
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_ms").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_ms"),
          col("event_id"))
        .withColumn("prev_ts", lag(col("ts_ms"), 1).over(w))
        .where(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > 60000L)
        .drop("prev_ts")
        .orderBy("user_id", "event_type", "ts_ms", "event_id")
    }),

    "f17_bitwise_fns" -> ((s, dir) => {
      // bitwise scalar library: AND/OR/XOR, shifts, popcount — the bit
      // bookkeeping sketch/fingerprint pipelines lean on, cross-engine
      // exact on two's-complement longs
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(col("o_custkey"))).as("b_and"),
          (col("o_orderkey").bitwiseOR(col("o_custkey"))).as("b_or"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("b_xor"),
          shiftleft(col("o_orderkey"), 3).as("b_shl"),
          shiftright(col("o_orderkey"), 2).as("b_shr"),
          bit_count(col("o_orderkey")).cast("long").as("b_pop"))
        .orderBy("o_orderkey")
    }),

    "j8_changelog" -> ((s, dir) => {
      // CDC changelog generation: the merge algebra's three diffs emitted
      // as one I/U/D feed instead of applied — what a downstream consumer
      // subscribes to. Same dedup/null-safe-compare semantics as
      // merge_delta, so the changelog and the merged state always agree.
      val target = Fixtures.sriTarget(s, dir)
      val live = Dedup.keepLatest(Fixtures.sriStaged(s, dir))
      val tombs = Fixtures.sriTombstones(s, dir).select("href").distinct()
      val ins = Diff.newRows(target, live, Seq("href"))
        .select(col("href"), lit("I").as("action"))
      val upd = Diff.changedRows(target, live, Seq("href"), "jsondata")
        .select(col("href"), lit("U").as("action"))
      val del = target.join(tombs, Seq("href"), "left_semi")
        .select(col("href"), lit("D").as("action"))
      ins.unionByName(upd).unionByName(del).orderBy("href", "action")
    }),

    "dq_orphans" -> ((s, dir) => {
      // referential-integrity gate: lineitem with planted orphan rows
      // (every 100th orderkey shifted past the key space) — the gate must
      // report exactly the planted set
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber")
      val planted = li.where(col("l_orderkey") % 100 === 0)
        .withColumn("l_orderkey", col("l_orderkey") + 1000000000L)
      Quality.orphans(li.unionByName(planted), "l_orderkey",
          Tables.orders(s, dir), "o_orderkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "dq_dup_keys" -> ((s, dir) => {
      // uniqueness gate: orders with a planted duplicate slice (every
      // 200th key re-inserted) — report each violated key with its count
      val o = Tables.orders(s, dir).select("o_orderkey")
      val planted = o.where(col("o_orderkey") % 200 === 0)
      Quality.duplicateKeys(o.unionByName(planted), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    "dq_null_stats" -> ((s, dir) => {
      // null-profile gate over a frame with planted nulls (every 5th
      // value, every 7th event_type) — exact integer counts per column
      val e = Tables.events(s, dir).select(
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value"))
          .as("value"),
        when(col("event_id") % 7 === 0, lit(null))
          .otherwise(col("event_type")).as("event_type"),
        col("user_id"))
      Quality.nullStats(e, Seq("value", "event_type", "user_id"))
        .orderBy("column_name")
    }),

    "win_cohort" -> ((s, dir) => {
      // cohort retention: users grouped by first-activity day, distinct
      // actives counted at each day offset — two aggregations and one
      // equi-join on the user key, no window over the fact table
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
      e.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    "mm_dedup_exact" -> ((s, dir) => {
      // exact binary dedup — the first pass of every multimodal pipeline:
      // content-hash the opaque payload, group, keep the min-id canonical.
      // The planted duplicate docs give byte-identical payloads to find.
      val media = PipelineQueries.docsWithDups(s, dir)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"))
      Multimodal.binaryMeta(media, "payload")
        .groupBy("sha")
        .agg(count(lit(1)).as("n_copies"),
          min("media_id").as("canonical"),
          max("n_bytes").as("n_bytes"))
        .where(col("n_copies") > 1)
        .orderBy("sha")
    }),

    "samp_resample" -> ((s, dir) => {
      // weighted resampling with upweighting: per-source rates k/100 where
      // k = 50·(ascii(last char) mod 5) ∈ {0, 50, 100, 150, 200} — drop,
      // half, keep, 1.5×, and 2× sources in one deterministic pass
      val d = Tables.documents(s, dir).select("doc_id", "source")
      val rates = d.select("source").distinct()
        .withColumn("k", lit(50) * (ascii(substring(col("source"), -1, 1)) % 5))
        .withColumn("m", lit(100))
      Sampling.resampleByGroup(d, "source", col("doc_id").cast("string"),
          rates)
        .select("doc_id", "source", "copy")
        .orderBy("doc_id", "copy")
    }),

    "asof_nearest" -> ((s, dir) => {
      // nearest as-of: the click minimizing |Δt| from each purchase,
      // equidistant ties to the backward match — both directions carried
      // by two frames over ONE window ordering (single shuffle)
      val ev = Tables.events(s, dir)
      AsOf.joinNearest(
          left = ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_ms"), col("event_id")),
          right = ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts_ms"), col("event_id")),
          key = "user_id", time = "ts_ms",
          leftId = "event_id", rightId = "event_id")
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    "asof_forward" -> ((s, dir) => {
      // forward as-of: for each purchase, the user's FIRST click at or
      // after the purchase (merge_asof direction='forward'), same
      // single-shuffle union-window shape as the backward join
      val ev = Tables.events(s, dir)
      AsOf.joinForward(
          left = ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_ms"), col("event_id")),
          right = ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts_ms"), col("event_id")),
          key = "user_id", time = "ts_ms",
          leftId = "event_id", rightId = "event_id")
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    "inc_cc_delta" -> ((s, dir) => {
      // incremental clustering, end to end: the delta batch's candidate
      // pairs (delta-only hashing) fold into the EXISTING clustering via
      // cluster contraction — the fixpoint runs on a graph bounded by the
      // delta, never the corpus. Output ≡ full recompute (same oracle as
      // dd_cluster_cc). NB the graded query rebuilds the base state
      // (signatures + LSH + CC over 6/7 of the corpus) inside the timed
      // region; in production that state is stored and the recurring cost
      // is the delta fold alone.
      val docs = PipelineQueries.docsWithDups(s, dir)
      val isDelta = col("doc_id") % 7 === 0
      // one corpus explode: the delta split happens on the exploded frame
      // (doc_id is right there), so base and delta signatures share it
      val shAll = Par.fanOut(docs, col("doc_id")).select(col("doc_id"),
          explode(TextOps.shingles(col("text"), 3)).as("s"))
        .pin()
      val baseSig = DedupText.signaturesFromShingles(
        shAll.where(!isDelta), "doc_id").pin()
      val basePairs = DedupText.lshCandidatesExact(baseSig, "doc_id", 8, 4)
      val baseCC = Cluster.connectedComponents(
        docs.where(!isDelta).select("doc_id"),
        "doc_id", basePairs, "a_id", "b_id", edgesCovered = true)
      val deltaSig = DedupText.signaturesFromShingles(
        shAll.where(isDelta), "doc_id")
      val deltaPairs = DedupText.lshCandidatesDelta(baseSig, deltaSig,
        "doc_id", 8, 4)
      // deltaPairs come from signatures of these very base ∪ delta docs,
      // so every endpoint is covered — skip the defensive fence
      Cluster.applyEdges(baseCC, deltaPairs, "a_id", "b_id",
          docs.where(isDelta).select("doc_id"), "doc_id",
          edgesCovered = true)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
          (col("cluster") === col("id")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    "inc_minhash_delta" -> ((s, dir) => {
      // incremental LSH index maintenance: only the delta batch
      // (doc_id % 7 = 0) is hashed; its bands join the stored base
      // signatures — output = candidate pairs the delta contributes.
      // candidates(B ∪ D) = candidates(B) ∪ this (spec-pinned).
      val docs = PipelineQueries.docsWithDups(s, dir)
      val isDelta = col("doc_id") % 7 === 0
      val base = DedupText.minhashSignaturesExact(
        docs.where(!isDelta), "doc_id", "text")
      val delta = DedupText.minhashSignaturesExact(
        docs.where(isDelta), "doc_id", "text")
      DedupText.lshCandidatesDelta(base, delta, "doc_id",
          bands = 8, rows = 4)
        .orderBy("a_id", "b_id")
    }),

    "q23_nation_volume" -> ((s, dir) => {
      // TPC-H Q7 shape: shipping volume between nation PAIRS — two
      // independent joins to the same broadcast dim under different roles
      // (supplier nation vs customer nation), a disjunctive pair filter,
      // per-year grouping, exact integer revenue (cents × (100 − disc))
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val pairOk =
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .where(pairOk)
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(cents("l_extendedprice") *
          (lit(100) - cents("l_discount"))).as("volume_e4"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    "ts_twa" -> ((s, dir) => {
      // time-weighted average held-value per user, exact: each observation
      // holds until the next one; emit the integer numerator (cents·ms)
      // and denominator (ms) instead of the float quotient
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          cents("value").as("vc"))
        .withColumn("dt", lead(col("ts_ms"), 1).over(w) - col("ts_ms"))
        .where(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(sum(col("vc") * col("dt")).as("twa_num"),
          sum(col("dt")).as("twa_den"),
          count(lit(1)).as("n_intervals"))
        .orderBy("user_id")
    }),

    "win_cum_distinct" -> ((s, dir) => {
      // running distinct-user count per day WITHOUT per-day distinct state:
      // flag each user's first-ever event (row_number = 1), count flags per
      // day, cumulative-sum over days — the scalable spelling of
      // COUNT(DISTINCT) OVER (ORDER BY day)
      val wUser = Window.partitionBy("user_id")
        .orderBy(col("ts_ms").asc, col("event_id").asc)
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          expr("ts_ms div 86400000").as("day"))
        .withColumn("first_ever", row_number().over(wUser) === 1)
      val perDay = e.groupBy("day")
        .agg(sum(when(col("first_ever"), 1L).otherwise(0L)).as("new_users"),
          count(lit(1)).as("n_events"))
      val wDay = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDay.withColumn("cum_users", sum(col("new_users")).over(wDay))
        .orderBy("day")
    }),

    "f16_parse_url" -> ((s, dir) => {
      // URL parsing + canonicalization (dedup key construction): host,
      // path, one tracked query param, and the canonical host+path form.
      // URLs are synthesized deterministically from document columns so
      // both engines parse the identical string.
      val url = concat(lit("https://"), col("source"),
        lit(".example.org/"), col("lang"), lit("/doc/"), col("doc_id"),
        lit("?utm_source=feed&id="), col("doc_id"), lit("#frag"))
      Tables.documents(s, dir)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("id")).as("qid"),
          concat(parse_url(col("url"), lit("HOST")),
            parse_url(col("url"), lit("PATH"))).as("canonical"))
        .orderBy("doc_id")
    }),

    "agg_topk_group" -> ((s, dir) => {
      // per-group top-k as a TRUE partial aggregate (typed heap buffer,
      // map-side combine ships ≤ k pairs per partition-group) — the
      // scale-correct alternative to the row_number window, same answer
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          cents("l_extendedprice").as("v"),
          (col("l_orderkey") * 100 + col("l_linenumber")).as("id"))
        .as[(String, Long, Long)]
      li.groupByKey(_._1)
        .mapValues { case (_, v, id) => (v, id) }
        .agg(new graft.expr.TopKAggregator(3).toColumn.name("topk"))
        .toDF("l_returnflag", "topk")
        .select(col("l_returnflag"), posexplode(col("topk")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rnk"),
          col("col._1").as("price_cents"), col("col._2").as("lid"))
        .orderBy("l_returnflag", "rnk")
    }),

    "scd2_pit_lookup" -> ((s, dir) => {
      // point-in-time lookup against SCD2 history: probes (each event's
      // state one hour earlier) join closed runs via the binned
      // point-in-interval join; OPEN runs (valid_to NULL, exactly one per
      // key) go through a plain equi-join — no unbounded bin explode.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_ms"),
          col("event_id"))
      val hist = Scd2.history(ev, "user_id", "event_type", "ts_ms",
        "event_id")
      val probes = Tables.events(s, dir)
        .where(col("event_id") % 7 === 0)
        .select(col("user_id"), col("event_id"),
          (col("ts_ms") - 3600000L).as("p_ts"))
      val closed = hist.where(col("valid_to").isNotNull)
        .select("user_id", "event_type", "valid_from", "valid_to")
      val open = hist.where(col("valid_to").isNull)
        .select("user_id", "event_type", "valid_from")
      val viaClosed = RangeBin.pointInterval(probes, "p_ts", closed,
          "valid_from", "valid_to", Seq("user_id"), binWidth = 86400000L)
        .select("user_id", "event_id", "p_ts", "event_type", "valid_from")
      val viaOpen = probes.join(open, "user_id")
        .where(col("p_ts") >= col("valid_from"))
        .select("user_id", "event_id", "p_ts", "event_type", "valid_from")
      viaClosed.unionByName(viaOpen)
        .withColumnRenamed("event_type", "state")
        .orderBy("user_id", "event_id")
    }),

    "agg_winsorize" -> ((s, dir) => {
      // winsorized aggregation: clip each group's prices to its exact
      // [p05, p95] (percentile_disc positions in pure integer DIV), then
      // sum the clipped cents; n_lo/n_hi count the clipped tails.
      // Scale note: same one-task-per-group sort bound as agg_equidepth
      // (3-value partition key; 7.0× at the sf1 decade) — exact rank
      // stats serialize per group by construction. Graduate to the
      // graded GK twin `agg_winsorize_approx` (Pipeline7Queries) once a
      // group's rows exceed one executor's sort budget (~10M rows/task):
      // the sketch is a mergeable partial agg, rank error ±0.1% at
      // accuracy=1000. This stays the exact oracle anchor.
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_extendedprice").as("pc"))
        .createOrReplaceTempView("li_wins")
      s.sql("""
        WITH w AS (SELECT l_returnflag, pc,
            ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY pc) AS rn,
            COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM li_wins),
        p AS (SELECT l_returnflag,
            MIN(CASE WHEN rn >= (n + 19) DIV 20 THEN pc END) AS p05,
            MIN(CASE WHEN rn >= (19 * n + 19) DIV 20 THEN pc END) AS p95
          FROM w GROUP BY l_returnflag)
        SELECT w.l_returnflag, p.p05 AS p05_cents, p.p95 AS p95_cents,
          SUM(LEAST(GREATEST(w.pc, p.p05), p.p95)) AS sum_wins_cents,
          SUM(CASE WHEN w.pc < p.p05 THEN 1 ELSE 0 END) AS n_lo,
          SUM(CASE WHEN w.pc > p.p95 THEN 1 ELSE 0 END) AS n_hi
        FROM w JOIN p ON w.l_returnflag = p.l_returnflag
        GROUP BY w.l_returnflag, p.p05, p.p95
        ORDER BY w.l_returnflag""")
    }),

    "samp_interleave" -> ((s, dir) => {
      // deterministic source-balanced interleave (round-robin by in-source
      // rank) WITHOUT a global sort: the global position is computed in
      // closed form from the per-source count dim — gpos(r, s) =
      // Σ_s' min(r-1, cnt_s') + #{s' < s : cnt_s' ≥ r} + 1 — so the plan
      // is one window per source plus a broadcast of the tiny counts dim
      val d = Tables.documents(s, dir).select("doc_id", "source")
      val w = Window.partitionBy("source").orderBy("doc_id")
      val ranked = d.withColumn("rnk", row_number().over(w).cast("long"))
      val counts = d.groupBy(col("source").as("src2"))
        .agg(count(lit(1)).as("cnt"))
      ranked.join(broadcast(counts))
        .groupBy("doc_id", "source", "rnk")
        .agg((sum(least(col("rnk") - 1, col("cnt"))) +
          sum(when(col("src2") < col("source") &&
            col("cnt") >= col("rnk"), 1L).otherwise(0L)) + 1L).as("gpos"))
        .orderBy("gpos")
    }),

    "approx_hll_merge" -> ((s, dir) => {
      // mergeable-sketch maintenance: per-day HLL sketches of the user
      // set union into one weekly distinct estimate — the incremental
      // path for distinct counts (store daily sketches, merge on read;
      // no re-scan of history). The sketch bytes are engine-specific, so
      // the graded output is the deterministic INVARIANT: the merged
      // estimate lands within 5% of the exact weekly distinct (lgK=12
      // gives ~1.6% rsd — 3× headroom; the union path is NOT bit-
      // lossless, which is exactly why only the bound is graded).
      val e = Tables.events(s, dir).select(
        expr("ts_ms div 604800000").as("week"),
        expr("ts_ms div 86400000").as("day"), col("user_id"))
      val daily = e.groupBy("week", "day")
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      val merged = daily.groupBy("week")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"),
          count(lit(1)).as("n_days"))
      val exact = e.groupBy("week")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, Seq("week"))
        .select(col("week"), col("n_days"), col("exact_users"),
          (abs(col("est_users") - col("exact_users")) * 20
            <= col("exact_users")).as("merge_ok"))
        .orderBy("week")
    }),

    "dd_cluster_sizes" -> ((s, dir) => {
      // dedup observability: the duplicate-cluster size distribution —
      // the first chart anyone asks for after a dedup run (how much mass
      // sits in how-big groups). Composition: CC labels → per-cluster
      // size → size histogram.
      val docs = PipelineQueries.docsWithDups(s, dir)
      val signed = DedupText.minhashSignaturesExact(docs, "doc_id", "text")
      val pairs = DedupText.lshCandidatesExact(signed, "doc_id", 8, 4)
      Cluster.connectedComponents(docs.select("doc_id"), "doc_id",
          pairs, "a_id", "b_id", edgesCovered = true)
        .groupBy("cluster").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .orderBy("sz")
    }),

    "sim_recall" -> ((s, dir) => {
      // ANN observability: per-probe overlap between the IVF index's
      // top-5 and the exact top-5 — recall of the scale path as a graded,
      // oracle-checked quantity (both rankings are deterministic)
      graft.expr.GraftFunctions.register(s)
      val emb = Tables.embeddings(s, dir)
      val probes = emb.where(col("vec_id") % 50 === 0)
      val exact = Similarity.bruteForceTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val ivf = Similarity.ivfTopK(emb, probes,
          emb.where(col("vec_id") % 61 === 0), k = 5, nprobe = 2)
        .select("query_id", "neighbor_id")
      val common = exact.join(ivf, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      exact.select("query_id").distinct()
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_common"))
        .orderBy("query_id")
    }),

    "dd_semantic" -> ((s, dir) => {
      // SemDeDup-shaped semantic dedup: IVF-cell blocking → within-cell
      // cosine ≥ 0.999 pairs → connected components → min-id canonical.
      // Corpus = embeddings + planted duplicates (vec_id%20 re-added at
      // +1e6); centroids = deterministic subset (vec_id%61), broadcast.
      val e = Tables.embeddings(s, dir)
      val withDups = e.unionByName(e.where(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      Similarity.semanticDedup(withDups,
          e.where(col("vec_id") % 61 === 0), threshold = 0.999)
        .orderBy("vec_id")
    }),

    "txt_inverted" -> ((s, dir) => {
      // inverted index over document bigrams: term → sorted posting list.
      // The df band is decided BEFORE postings are assembled (count-agg →
      // filter → broadcast semi-join back): head terms' posting lists —
      // the ones that would dominate memory at corpus scale — are never
      // materialized, only counted.
      val tok = bigramTok(s, dir)
      val band = tok.groupBy("w").agg(count(lit(1)).as("df"))
        .where(col("df").between(9, 12))
      tok.join(broadcast(band), "w")
        .groupBy("w", "df")
        .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("postings"))
        .orderBy("w")
    })
  )

  val oracles: Map[String, String] = Map(

    "agg_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents)
        |SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w
        |HAVING COUNT(*) * 100 > (SELECT COUNT(*) FROM tok)
        |ORDER BY w""".stripMargin,

    "samp_pack_chunks" ->
      s"""WITH d AS ($docsWithLenSql),
         |c AS (SELECT source, doc_id, n_tokens,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS aft
         |  FROM d),
         |e AS (SELECT *, aft - n_tokens AS bef FROM c WHERE n_tokens >= 1),
         |x AS (SELECT source, doc_id, n_tokens, bef, aft,
         |  unnest(range(bef // 512, (aft - 1) // 512 + 1)) AS bin FROM e)
         |SELECT source, doc_id, n_tokens, bin,
         |  GREATEST(bef, bin * 512) - bef AS piece_start,
         |  LEAST(aft, bin * 512 + 512) - GREATEST(bef, bin * 512) AS piece_len,
         |  GREATEST(bef, bin * 512) - bin * 512 AS bin_offset
         |FROM x ORDER BY source, doc_id, bin""".stripMargin,

    "samp_pack_greedy" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT source, doc_id, n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM ($docsWithLenSql)),
         |r AS (
         |  SELECT source, doc_id, n_tokens, rn,
         |    CAST(0 AS BIGINT) AS bin, n_tokens AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.source, d.doc_id, d.n_tokens, d.rn,
         |    CASE WHEN r.fill + d.n_tokens > 512 THEN r.bin + 1
         |         ELSE r.bin END,
         |    CASE WHEN r.fill + d.n_tokens > 512 THEN d.n_tokens
         |         ELSE r.fill + d.n_tokens END
         |  FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1)
         |SELECT source, doc_id, n_tokens, bin FROM r
         |ORDER BY source, doc_id""".stripMargin,

    "samp_shuffle_shards" -> {
      val hu = huSql("'r4' || CAST(o_orderkey AS VARCHAR)")
      s"""WITH h AS (SELECT o_orderkey, $hu AS hu FROM orders)
         |SELECT o_orderkey, hu % 8 AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY hu % 8
         |    ORDER BY hu ASC, o_orderkey ASC) AS BIGINT) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin
    },

    "w4_fill_forward" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT user_id, event_id, ts_ms, v,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY ts_ms ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM e ORDER BY user_id, ts_ms, event_id""".stripMargin,

    "ts_resample" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |  epoch_ms(ts) AS ts_ms, epoch_ms(ts) // 86400000 AS day
        |  FROM events),
        |per AS (
        |  SELECT user_id, day,
        |    MAX(CASE WHEN rn = 1 THEN value END) AS v,
        |    COUNT(*) AS n_obs
        |  FROM (SELECT user_id, day, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, day
        |        ORDER BY ts_ms DESC, event_id DESC) AS rn FROM e)
        |  GROUP BY user_id, day),
        |sp AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day
        |  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
        |        FROM per GROUP BY user_id)),
        |j AS (SELECT sp.user_id, sp.day, per.v,
        |    COALESCE(per.n_obs, 0) AS n_obs
        |  FROM sp LEFT JOIN per ON sp.user_id = per.user_id
        |    AND sp.day = per.day)
        |SELECT user_id, day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_last,
        |  n_obs
        |FROM j ORDER BY user_id, day""".stripMargin,

    "range_overlap_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
        |  epoch_ms(ts) // 86400000 AS day,
        |  epoch_ms(ts) // 604800000 AS week FROM events),
        |a AS (SELECT user_id, day AS a_day,
        |  MIN(ts_ms) AS a_s, MAX(ts_ms) + 1 AS a_e
        |  FROM e GROUP BY user_id, day),
        |b AS (SELECT event_type, week AS b_week,
        |  MIN(ts_ms) AS b_s, MAX(ts_ms) + 1 AS b_e
        |  FROM e GROUP BY event_type, week)
        |SELECT user_id, a_day, event_type, b_week,
        |  LEAST(a_e, b_e) - GREATEST(a_s, b_s) AS overlap_ms
        |FROM a JOIN b ON a_s < b_e AND b_s < a_e
        |ORDER BY user_id, a_day, event_type, b_week""".stripMargin,

    "agg_equidepth" ->
      """WITH t AS (SELECT l_returnflag, l_extendedprice,
        |  CAST(NTILE(8) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |    AS BIGINT) AS bucket
        |  FROM lineitem)
        |SELECT l_returnflag, bucket, COUNT(*) AS cnt,
        |  MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        |FROM t GROUP BY l_returnflag, bucket
        |ORDER BY l_returnflag, bucket""".stripMargin,

    "w5_debounce" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
        |  event_id FROM events),
        |l AS (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id, event_type
        |  ORDER BY ts_ms, event_id) AS prev_ts FROM e)
        |SELECT user_id, event_type, ts_ms, event_id FROM l
        |WHERE prev_ts IS NULL OR ts_ms - prev_ts > 60000
        |ORDER BY user_id, event_type, ts_ms, event_id""".stripMargin,

    "f17_bitwise_fns" ->
      """SELECT o_orderkey,
        |  o_orderkey & o_custkey AS b_and,
        |  o_orderkey | o_custkey AS b_or,
        |  xor(o_orderkey, o_custkey) AS b_xor,
        |  o_orderkey << 3 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS b_pop
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "j8_changelog" ->
      s"""${Fixtures.sriCtes}SELECT href, action FROM (
         |  SELECT d.href, 'I' AS action FROM sdedup d
         |  WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = d.href)
         |  UNION ALL
         |  SELECT d.href, 'U' AS action FROM sdedup d
         |  JOIN starget t ON t.href = d.href
         |  WHERE d.jsondata IS DISTINCT FROM t.jsondata
         |  UNION ALL
         |  SELECT t.href, 'D' AS action FROM starget t
         |  WHERE EXISTS (SELECT 1 FROM stomb s WHERE s.href = t.href))
         |ORDER BY href, action""".stripMargin,

    "dq_orphans" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey + 1000000000, l_linenumber FROM lineitem
        |  WHERE l_orderkey % 100 = 0)
        |SELECT l_orderkey, l_linenumber FROM li
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = li.l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "dq_dup_keys" ->
      """WITH o AS (
        |  SELECT o_orderkey FROM orders
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 200 = 0)
        |SELECT o_orderkey, COUNT(*) AS n_rows FROM o
        |GROUP BY o_orderkey HAVING COUNT(*) > 1
        |ORDER BY o_orderkey""".stripMargin,

    "dq_null_stats" ->
      """WITH e AS (SELECT
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END
        |    AS event_type,
        |  user_id FROM events)
        |SELECT c.column_name,
        |  CASE c.column_name
        |    WHEN 'value' THEN (SELECT CAST(SUM(CASE WHEN value IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM e)
        |    WHEN 'event_type' THEN (SELECT CAST(SUM(CASE WHEN event_type
        |      IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM e)
        |    ELSE (SELECT CAST(SUM(CASE WHEN user_id IS NULL THEN 1
        |      ELSE 0 END) AS BIGINT) FROM e) END AS n_null,
        |  (SELECT COUNT(*) FROM e) AS n_total
        |FROM (VALUES ('value'), ('event_type'), ('user_id'))
        |  AS c(column_name)
        |ORDER BY column_name""".stripMargin,

    "win_cohort" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day
        |  FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM e
        |  GROUP BY user_id)
        |SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY f.cohort_day, e.day - f.cohort_day
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "mm_dedup_exact" -> {
      import PipelineQueries.docsWithDupsSql
      s"""WITH dd AS ($docsWithDupsSql)
         |SELECT sha256(text) AS sha, COUNT(*) AS n_copies,
         |  MIN(doc_id) AS canonical,
         |  CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
         |FROM dd GROUP BY sha256(text) HAVING COUNT(*) > 1
         |ORDER BY sha""".stripMargin
    },

    "samp_resample" -> {
      val hu = huSql("CAST(doc_id AS VARCHAR)")
      s"""WITH r AS (SELECT source,
         |    CAST(50 * (unicode(right(source, 1)) % 5) AS BIGINT) AS k,
         |    CAST(100 AS BIGINT) AS m
         |  FROM (SELECT DISTINCT source FROM documents)),
         |j AS (SELECT d.doc_id, d.source, r.k, r.m, $hu AS hu
         |  FROM documents d JOIN r USING (source)),
         |c AS (SELECT doc_id, source,
         |    k // m + CASE WHEN hu % m < k % m THEN 1 ELSE 0 END AS copies
         |  FROM j)
         |SELECT doc_id, source,
         |  unnest(generate_series(1, copies)) AS copy
         |FROM c WHERE copies >= 1
         |ORDER BY doc_id, copy""".stripMargin
    },

    "asof_nearest" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |      FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.ts_ms, p.event_id, m.asof_id, m.asof_time
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS asof_id, c.ts_ms AS asof_time FROM c
        |  WHERE c.user_id = p.user_id
        |  ORDER BY ABS(c.ts_ms - p.ts_ms) ASC,
        |    (CASE WHEN c.ts_ms <= p.ts_ms THEN 0 ELSE 1 END) ASC,
        |    (CASE WHEN c.ts_ms <= p.ts_ms THEN -c.event_id
        |          ELSE c.event_id END) ASC
        |  LIMIT 1) m ON true
        |ORDER BY p.user_id, p.ts_ms, p.event_id""".stripMargin,

    "asof_forward" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |      FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.ts_ms, p.event_id, m.asof_id, m.asof_time
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS asof_id, c.ts_ms AS asof_time FROM c
        |  WHERE c.user_id = p.user_id AND c.ts_ms >= p.ts_ms
        |  ORDER BY c.ts_ms ASC, c.event_id ASC LIMIT 1) m ON true
        |ORDER BY p.user_id, p.ts_ms, p.event_id""".stripMargin,

    "inc_cc_delta" -> {
      // same oracle as dd_cluster_cc: the incremental fold must equal the
      // full recompute over all pairs
      import PipelineQueries.minhashPairsCtes
      s"""WITH RECURSIVE $minhashPairsCtes,
         |cedges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |           UNION SELECT b_id, a_id FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM dd
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id)
         |SELECT id AS doc_id, MIN(lbl) AS cluster_id,
         |  MIN(lbl) = id AS is_canonical
         |FROM reach GROUP BY id
         |ORDER BY doc_id""".stripMargin
    },

    "inc_minhash_delta" -> {
      import PipelineQueries.minhashPairsCtes
      s"""WITH $minhashPairsCtes
         |SELECT a_id, b_id FROM pairs
         |WHERE a_id % 7 = 0 OR b_id % 7 = 0
         |ORDER BY a_id, b_id""".stripMargin
    },

    "q23_nation_volume" -> {
      val pc = Fixtures.centsSql("l_extendedprice")
      val dc = Fixtures.centsSql("l_discount")
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(SUM($pc * (100 - $dc)) AS BIGINT) AS volume_e4,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin
    },

    "ts_twa" -> {
      val vc = Fixtures.centsSql("value")
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         |  $vc AS vc FROM events),
         |d AS (SELECT user_id, vc,
         |  lead(ts_ms) OVER (PARTITION BY user_id
         |    ORDER BY ts_ms, event_id) - ts_ms AS dt
         |  FROM e)
         |SELECT user_id,
         |  CAST(SUM(vc * dt) AS BIGINT) AS twa_num,
         |  CAST(SUM(dt) AS BIGINT) AS twa_den,
         |  COUNT(*) AS n_intervals
         |FROM d WHERE dt IS NOT NULL
         |GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "win_cum_distinct" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |  epoch_ms(ts) // 86400000 AS day FROM events),
        |f AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts_ms, event_id) = 1 AS first_ever FROM e),
        |p AS (SELECT day,
        |  CAST(SUM(CASE WHEN first_ever THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_users,
        |  COUNT(*) AS n_events FROM f GROUP BY day)
        |SELECT day, new_users, n_events,
        |  CAST(SUM(new_users) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM p ORDER BY day""".stripMargin,

    "f16_parse_url" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.org/' || lang || '/doc/' ||
        |  doc_id || '?utm_source=feed&id=' || doc_id || '#frag' AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |  regexp_extract(url, 'https://[^/]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '[?&]id=([^&#]*)', 1) AS qid,
        |  regexp_extract(url, 'https://([^/]+)', 1) ||
        |    regexp_extract(url, 'https://[^/]+([^?#]*)', 1) AS canonical
        |FROM u ORDER BY doc_id""".stripMargin,

    "agg_topk_group" -> {
      val pc = Fixtures.centsSql("l_extendedprice")
      s"""WITH li AS (SELECT l_returnflag, $pc AS v,
         |  l_orderkey * 100 + l_linenumber AS id FROM lineitem),
         |r AS (SELECT l_returnflag, v, id,
         |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
         |    ORDER BY v DESC, id ASC) AS rnk FROM li)
         |SELECT l_returnflag, CAST(rnk AS BIGINT) AS rnk,
         |  v AS price_cents, id AS lid
         |FROM r WHERE rnk <= 3
         |ORDER BY l_returnflag, rnk""".stripMargin
    },

    "scd2_pit_lookup" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
        |                  event_id FROM events),
        |m AS (SELECT *, lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev,
        |      row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts_ms, event_id) AS rn
        |      FROM e),
        |c AS (SELECT user_id, event_type, ts_ms, event_id FROM m
        |      WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |r AS (SELECT user_id, event_type, ts_ms AS valid_from,
        |      lead(ts_ms) OVER (PARTITION BY user_id
        |        ORDER BY ts_ms, event_id) AS valid_to FROM c),
        |p AS (SELECT user_id, event_id, epoch_ms(ts) - 3600000 AS p_ts
        |      FROM events WHERE event_id % 7 = 0)
        |SELECT p.user_id, p.event_id, p.p_ts,
        |  r.event_type AS state, r.valid_from
        |FROM p JOIN r ON p.user_id = r.user_id
        |  AND r.valid_from <= p.p_ts
        |  AND (r.valid_to IS NULL OR p.p_ts < r.valid_to)
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "agg_winsorize" -> {
      val pc = Fixtures.centsSql("l_extendedprice")
      s"""WITH li AS (SELECT l_returnflag, $pc AS pc FROM lineitem),
         |w AS (SELECT l_returnflag, pc,
         |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY pc)
         |      AS rn,
         |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM li),
         |p AS (SELECT l_returnflag,
         |    MIN(CASE WHEN rn >= (n + 19) // 20 THEN pc END) AS p05,
         |    MIN(CASE WHEN rn >= (19 * n + 19) // 20 THEN pc END) AS p95
         |  FROM w GROUP BY l_returnflag)
         |SELECT w.l_returnflag, p.p05 AS p05_cents, p.p95 AS p95_cents,
         |  CAST(SUM(LEAST(GREATEST(w.pc, p.p05), p.p95)) AS BIGINT)
         |    AS sum_wins_cents,
         |  CAST(SUM(CASE WHEN w.pc < p.p05 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lo,
         |  CAST(SUM(CASE WHEN w.pc > p.p95 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hi
         |FROM w JOIN p ON w.l_returnflag = p.l_returnflag
         |GROUP BY w.l_returnflag, p.p05, p.p95
         |ORDER BY w.l_returnflag""".stripMargin
    },

    "samp_interleave" ->
      """WITH rk AS (SELECT doc_id, source,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
        |    AS BIGINT) AS rnk
        |  FROM documents)
        |SELECT doc_id, source, rnk,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rnk, source) AS BIGINT) AS gpos
        |FROM rk ORDER BY gpos""".stripMargin,

    "dd_cluster_sizes" -> {
      import PipelineQueries.minhashPairsCtes
      s"""WITH RECURSIVE $minhashPairsCtes,
         |cedges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |           UNION SELECT b_id, a_id FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM dd
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id),
         |cc AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
         |sz AS (SELECT cluster, COUNT(*) AS sz FROM cc GROUP BY cluster)
         |SELECT sz, COUNT(*) AS n_clusters FROM sz GROUP BY sz
         |ORDER BY sz""".stripMargin
    },

    "approx_hll_merge" ->
      """SELECT epoch_ms(ts) // 604800000 AS week,
        |  COUNT(DISTINCT epoch_ms(ts) // 86400000) AS n_days,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS merge_ok
        |FROM events GROUP BY week ORDER BY week""".stripMargin,

    "sim_recall" -> {
      // composed from the two graded rankings' own oracles
      val ex = PipelineQueries.oracles("sim_cosine_topk")
      val iv = PipelineQueries.oracles("sim_ivf_topk")
      s"""WITH ex AS ($ex),
         |iv AS ($iv),
         |p AS (SELECT DISTINCT query_id FROM ex),
         |c AS (SELECT ex.query_id, COUNT(*) AS n FROM ex
         |  JOIN iv ON ex.query_id = iv.query_id
         |    AND ex.neighbor_id = iv.neighbor_id
         |  GROUP BY ex.query_id)
         |SELECT p.query_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_common
         |FROM p LEFT JOIN c ON p.query_id = c.query_id
         |ORDER BY p.query_id""".stripMargin
    },

    "dd_semantic" -> {
      import PipelineQueries.cosSql
      s"""WITH RECURSIVE we AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings
         |  WHERE vec_id % 20 = 0),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |  FROM embeddings WHERE vec_id % 61 = 0),
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT w.vec_id, w.embedding, c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY w.vec_id
         |        ORDER BY ${cosSql("w.embedding", "c.cent_emb")} DESC,
         |                 c.cent_id ASC) AS rn
         |    FROM we w, cents c) WHERE rn = 1),
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.999),
         |cedges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |           UNION SELECT b_id, a_id FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM we
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id)
         |SELECT id AS vec_id, MIN(lbl) AS cluster_id,
         |  MIN(lbl) = id AS is_canonical
         |FROM reach GROUP BY id
         |ORDER BY vec_id""".stripMargin
    },

    "txt_inverted" ->
      s"""WITH tok AS ($bigramTokSql)
         |SELECT w, COUNT(*) AS df,
         |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
         |    AS postings
         |FROM tok GROUP BY w
         |HAVING COUNT(*) BETWEEN 9 AND 12
         |ORDER BY w""".stripMargin
  )
}
