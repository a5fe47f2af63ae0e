package graft.queries

import org.apache.spark.sql.functions._
import graft.ops._
import Fixtures._

/** SURVEY §2 sync-algebra operators (S3, J1–J6, A1–A5, P2–P6, F1/F2/F6/F9,
  * W3) as graded queries over the `events`-as-SRI fixture. */
object SyncQueries {

  val queries: Map[String, Q] = Map(

    "j1_delete_semijoin" -> ((s, dir) => {
      Diff.deleteByKeys(sriTarget(s, dir), sriTombstones(s, dir), Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j2_prune_absent" -> ((s, dir) => {
      // full-sync prune: target rows whose key is absent from the snapshot
      // (snapshot = even-keyed events) are the delete set
      val snapshot = sri(s, dir).where(col("key").cast("long") % 2 === 0)
      Diff.pruneAbsent(sriTarget(s, dir), snapshot, Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j3_changed_rows" -> ((s, dir) => {
      Diff.changedRows(sriTarget(s, dir), sriStaged(s, dir), Seq("href"), "jsondata")
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j4_new_rows" -> ((s, dir) => {
      val deduped = Dedup.keepLatest(sriStaged(s, dir))
      Diff.newRows(sriTarget(s, dir), deduped, Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j5_keep_members" -> ((s, dir) => {
      // membership reconciliation: authoritative list = non-error events
      val members = sri(s, dir).where(col("resourcetype") =!= "error").select("href")
      Diff.keepMembers(sriTarget(s, dir), members, Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j6_missing_members" -> ((s, dir) => {
      val members = sri(s, dir).select("href")
      Diff.missingMembers(members, sriTarget(s, dir), Seq("href"))
        .orderBy("href")
    }),

    "a1_dedup_keep_latest" -> ((s, dir) => {
      // latest event per user: the A1 window on a key that actually has
      // duplicates (hrefs are unique in the fixture; user_id is not)
      val ev = graft.Tables.events(s, dir)
      Dedup.keepFirst(ev, Seq("user_id"),
          Seq(col("ts_ms").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
        .orderBy("user_id")
    }),

    "a2_watermark_max" -> ((s, dir) => Watermark.candidate(sriStaged(s, dir))),

    "a4_top1_latest" -> ((s, dir) => {
      // legacy newest-row probe (client.js:642-690): global top-1 by sort →
      // Spark plans TakeOrderedAndProject, not a full sort
      sri(s, dir).orderBy(col("modified_ms").desc, col("href").desc)
        .limit(1).select("href", "modified_ms")
    }),

    "a5_diag_counts" -> ((s, dir) => {
      // staging-table diagnostic counts (client.js:983-994): one row per
      // staging role, computed without any collect
      // updates/deletes/safedeltasync are all filters of the same feed:
      // ONE conditional-aggregation scan (map-side, no shuffle of rows)
      // instead of three separate table passes. Only the inserts count
      // genuinely needs a second pass (anti-join against the target).
      val base = sri(s, dir)
      val isErr = col("resourcetype") === "error"
      val inDelta = col("modified_ms") >= CutMs
      // coalesce: sum() over an empty feed is NULL, but the diagnostic
      // contract (and the COUNT(*)-based oracle) reports 0 counts
      val three = base.agg(
          coalesce(sum(when(inDelta && !isErr, 1L).otherwise(0L)), lit(0L))
            .as("updates"),
          coalesce(sum(when(inDelta && isErr, 1L).otherwise(0L)), lit(0L))
            .as("deletes"),
          coalesce(sum(when(!isErr, 1L).otherwise(0L)), lit(0L))
            .as("safedeltasync"))
        .select(expr("stack(3, 'updates', updates, 'deletes', deletes, " +
          "'safedeltasync', safedeltasync) AS (tbl, n)"))
      val members = base.where(!isErr).select("href")
      three
        .unionByName(
          Diff.missingMembers(members, sriTarget(s, dir), Seq("href"))
            .agg(count(lit(1)).as("n"))
            .select(lit("safedeltasyncinserts").as("tbl"), col("n")))
        .orderBy("tbl")
    }),

    "s3_envelope_explode" -> ((s, dir) => {
      // page envelopes rebuilt from rows (3.3-style list pages), then
      // normalized back to resources; key%3==0 simulates expand=NONE
      val rows = sri(s, dir).withColumn("expanded",
        when(col("key").cast("long") % 3 === 0, lit(null: String))
          .otherwise(col("jsondata")))
      val pages = rows
        .groupBy((col("key").cast("long") % 20).as("page"))
        .agg(collect_list(struct(col("href"), col("expanded"))).as("results"))
      Normalize.explodeEnvelope(pages).orderBy("href")
    }),

    "merge_delta" -> ((s, dir) => {
      Merge.delta(sriTarget(s, dir), sriStaged(s, dir), sriTombstones(s, dir))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "merge_safe" -> ((s, dir) => {
      // W4 composed: drop rows not in the member list, fetch + insert
      // members the target lacks (fetch simulated by a semi-join on the
      // full feed = the S2 point-lookup result)
      val members = sri(s, dir).where(col("resourcetype") =!= "error")
        .select("href")
      val target = sriTarget(s, dir)
      val missing = Diff.missingMembers(members, target, Seq("href"))
      val fetched = sri(s, dir).join(missing, Seq("href"), "left_semi")
      Merge.safe(target, members, fetched)
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "merge_counts" -> ((s, dir) => {
      Merge.deltaActionCounts(sriTarget(s, dir), sriStaged(s, dir),
        sriTombstones(s, dir)).orderBy("action")
    }),

    "p2_fix_resource" -> ((s, dir) => {
      // repair rows from a non-compliant API: null out key/modified for a
      // deterministic subset, then fixResourceForStoring restores them
      val broken = sri(s, dir)
        .withColumn("key",
          when(col("key").cast("long") % 5 === 0, lit(null: String))
            .otherwise(col("key")))
        .withColumn("modified_ms",
          when(col("key").isNull, lit(null: java.lang.Long))
            .otherwise(col("modified_ms")))
      Normalize.fixResource(broken, defaultModifiedMs = CutMs)
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "p4_source_predicates" -> ((s, dir) => {
      // pushdown predicate construction (client.js:1677-1703): tombstone
      // pass is UNfiltered, update pass keeps the user filter — both fenced
      // by the watermark
      val ev = graft.Tables.sriEvents(s, dir)
      val deletes = ev.where(col("modified_ms") >= CutMs &&
          col("resourcetype") === "error")
        .select(lit("deleted").as("pass"), col("href"))
      val updates = ev.where(col("modified_ms") >= CutMs &&
          col("resourcetype") === "click")
        .select(lit("updated").as("pass"), col("href"))
      deletes.unionByName(updates).orderBy("pass", "href")
    }),

    "p6_scope_fence" -> ((s, dir) => {
      // tenant fence: two tenants share the table; destructive scope is
      // constrained to one (baseurl, path) pair
      val multi = sri(s, dir)
        .withColumn("baseurl", lit("https://api.example.org"))
        .withColumn("path",
          when(col("key").cast("long") % 2 === 0, lit("/events"))
            .otherwise(lit("/events_b")))
      Normalize.scoped(multi, "https://api.example.org", "/events")
        .select("href", "baseurl", "path").orderBy("href")
    }),

    "f1_f2_href_fns" -> ((s, dir) => {
      sri(s, dir).select(
        col("href"),
        Normalize.keyFromHref(col("href")).as("derived_key"),
        Normalize.pathFromHref(col("href")).as("derived_path"),
        // F3 — legacy path-regex variant (client.js:148-154)
        regexp_extract(col("href"), "^((/[A-Za-z]+)+)/[^/]*$", 1)
          .as("derived_path_re"))
        .orderBy("href")
    }),

    "f5_expand_rewrite" -> ((s, dir) => {
      // F5 — setExpandOnPath (utils.js:74-80): add or replace the expand=
      // query param; three input shapes exercised deterministically
      val path = when(col("key").cast("long") % 3 === 0,
          concat(col("href"), lit("?expand=FULL&limit=5")))
        .when(col("key").cast("long") % 3 === 1,
          concat(col("href"), lit("?limit=5")))
        .otherwise(col("href"))
      val rewritten = when(path.contains("?") && path.contains("expand="),
          regexp_replace(path, "expand=[^&]*", "expand=NONE"))
        .when(path.contains("?"), concat(path, lit("&expand=NONE")))
        .otherwise(concat(path, lit("?expand=NONE")))
      sri(s, dir).select(col("href"), path.as("path"),
        rewritten.as("rewritten")).orderBy("href")
    }),

    "f6_time_roundtrip" -> ((s, dir) => {
      // ISO-8601 ↔ epoch-millis (client.js:1669-1674): format out, parse
      // back, prove the roundtrip is lossless
      val iso = date_format(timestamp_millis(col("modified_ms")),
        "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
      sri(s, dir).select(col("href"), iso.as("iso"),
          unix_millis(to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
            .as("rt_ms"))
        .orderBy("href")
    }),

    "f9_to_json" -> ((s, dir) => {
      // JSON.stringify of the resource row (client.js:269, 338)
      sri(s, dir).select(col("href"),
          to_json(struct(col("href"), col("key"), col("modified_ms"))).as("doc"))
        .orderBy("href")
    }),

    "p1_strip_dollar" -> ((s, dir) => {
      // custom Catalyst expression: recursive $$-field pruning at any
      // depth. Input synthesized with $$ keys nested 2 levels deep; the
      // oracle constructs the expected output string independently.
      graft.expr.GraftFunctions.register(s)
      val k = get_json_object(col("jsondata"), "$.k")
      val doc = concat(lit("""{"$$meta": {"type": "event"}, "k": """), k,
        lit(""", "$$expanded": {"x": 1}, "nested": {"$$ref": "r", "v": """),
        k, lit("}}"))
      sri(s, dir).select(col("href"),
          graft.expr.GraftFunctions.remove_dollar_fields(doc).as("stripped"))
        .orderBy("href")
    }),

    "f10_json_merge_patch" -> ((s, dir) => {
      // custom Catalyst expression: RFC 7386 merge-patch — replace k,
      // delete nothing, add a field; oracle constructs expected output
      graft.expr.GraftFunctions.register(s)
      sri(s, dir).select(col("href"),
          graft.expr.GraftFunctions.json_merge_patch(col("jsondata"),
            lit("""{"k": null, "patched": 7}""")).as("doc"))
        .orderBy("href")
    }),

    "inc_agg_merge" -> ((s, dir) => {
      // incremental aggregate maintenance: merge(agg(base), agg(delta))
      // must equal agg(base ∪ delta) — the oracle computes the full
      // aggregation directly, proving the incremental path exact
      val ev = graft.Tables.events(s, dir)
        .withColumn("v_cents", Fixtures.cents("value"))
      val base = ev.where(col("ts") < Fixtures.tsNtz(CutMs))
      val delta = ev.where(col("ts") >= Fixtures.tsNtz(CutMs))
      IncrementalAgg.merge(
          IncrementalAgg.partial(base, Seq("event_type"), "v_cents"),
          IncrementalAgg.partial(delta, Seq("event_type"), "v_cents"),
          Seq("event_type"))
        .select(col("event_type"), col("cnt"),
          (col("sum").cast("double") / 100).as("sum_value"))
        .orderBy("event_type")
    }),

    "inc_join_delta" -> ((s, dir) => {
      // incremental JOIN-view maintenance: the new pairs of the grown
      // join are exactly dA⋈B ∪ A⋈dB ∪ dA⋈dB; the oracle computes them
      // as "full join restricted to pairs touching a delta row",
      // proving the three-join delta algebra exact
      val ev = graft.Tables.events(s, dir)
      def side(t: String, idAs: String, tsAs: String) =
        ev.where(col("event_type") === t)
          .select(col("user_id"), col("event_id").as(idAs),
            col("ts_ms").as(tsAs))
      val p = side("purchase", "p_id", "p_ts")
      val c = side("click", "c_id", "c_ts")
      val delta = IncrementalAgg.joinInsertDelta(
        p.where(col("p_ts") < CutMs), p.where(col("p_ts") >= CutMs),
        c.where(col("c_ts") < CutMs), c.where(col("c_ts") >= CutMs),
        Seq("user_id"))
      delta.groupBy("user_id")
        .agg(count(lit(1)).as("n_new_pairs"),
          min(col("p_id") + col("c_id")).as("min_idsum"))
        .orderBy("user_id")
    }),

    "inc_join_retract" -> ((s, dir) => {
      // join-view maintenance with DELETES: purge a slice of purchases
      // (user_id%7=0 before the cut) and insert the post-Cut2 tail; the
      // maintained view must equal the direct join of the new state —
      // the oracle computes that direct join
      val ev = graft.Tables.events(s, dir)
      def side(t: String, idAs: String, tsAs: String) =
        ev.where(col("event_type") === t)
          .select(col("user_id"), col("event_id").as(idAs),
            col("ts_ms").as(tsAs))
      val p = side("purchase", "p_id", "p_ts")
      val c = side("click", "c_id", "c_ts").where(col("c_ts") < CutMs)
      val aOld = p.where(col("p_ts") < Cut2Ms)
      val dDel = aOld.where(col("user_id") % 7 === 0 && col("p_ts") < CutMs)
      val dIns = p.where(col("p_ts") >= Cut2Ms)
      val vOld = aOld.join(c, Seq("user_id"))
      IncrementalAgg.joinApplyDeltaA(vOld, dIns, dDel, c, Seq("user_id"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          min(col("p_id") + col("c_id")).as("min_idsum"))
        .orderBy("user_id")
    }),

    "f4_string_hash" -> ((s, dir) => {
      // custom codegen'd expression: 31*h+c int32 string hash
      graft.expr.GraftFunctions.register(s)
      sri(s, dir).select(col("href"),
          graft.expr.GraftFunctions.java_string_hash(col("href")).as("h"))
        .orderBy("href")
    })
  )

  val oracles: Map[String, String] = Map(

    "j1_delete_semijoin" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype
         |FROM starget w
         |WHERE NOT EXISTS (SELECT 1 FROM stomb t WHERE t.href = w.href)
         |ORDER BY href""".stripMargin,

    "j2_prune_absent" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype
         |FROM starget w
         |WHERE NOT EXISTS (SELECT 1 FROM sri i
         |  WHERE CAST(i.key AS BIGINT) % 2 = 0 AND i.href = w.href)
         |ORDER BY href""".stripMargin,

    "j3_changed_rows" ->
      s"""${sriCtes}SELECT s.href, s.key, s.modified_ms, s.jsondata, s.resourcetype
         |FROM sstaged s JOIN starget t ON s.href = t.href
         |WHERE s.jsondata IS DISTINCT FROM t.jsondata
         |ORDER BY s.href""".stripMargin,

    "j4_new_rows" ->
      s"""${sriCtes}SELECT d.href, d.key, d.modified_ms, d.jsondata, d.resourcetype
         |FROM sdedup d
         |WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = d.href)
         |ORDER BY d.href""".stripMargin,

    "j5_keep_members" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype
         |FROM starget w
         |WHERE EXISTS (SELECT 1 FROM sri m
         |  WHERE m.resourcetype <> 'error' AND m.href = w.href)
         |ORDER BY href""".stripMargin,

    "j6_missing_members" ->
      s"""${sriCtes}SELECT m.href FROM sri m
         |WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = m.href)
         |ORDER BY m.href""".stripMargin,

    "a1_dedup_keep_latest" ->
      """SELECT user_id, event_id, ts_ms, event_type FROM (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "a2_watermark_max" ->
      s"${sriCtes}SELECT MAX(modified_ms) AS last_modified_ms FROM sstaged",

    "a4_top1_latest" ->
      s"""${sriCtes}SELECT href, modified_ms FROM sri
         |ORDER BY modified_ms DESC, href DESC LIMIT 1""".stripMargin,

    "a5_diag_counts" ->
      s"""${sriCtes}SELECT tbl, n FROM (
         |  SELECT 'updates' AS tbl, COUNT(*) AS n FROM sstaged
         |  UNION ALL SELECT 'deletes', COUNT(*) FROM stomb
         |  UNION ALL SELECT 'safedeltasync', COUNT(*) FROM sri
         |    WHERE resourcetype <> 'error'
         |  UNION ALL SELECT 'safedeltasyncinserts', COUNT(*) FROM sri m
         |    WHERE m.resourcetype <> 'error'
         |      AND NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = m.href))
         |ORDER BY tbl""".stripMargin,

    "s3_envelope_explode" ->
      s"""${sriCtes}, env AS (
         |  SELECT CAST(key AS BIGINT) % 20 AS page,
         |         list(struct_pack(href := href,
         |           expanded := CASE WHEN CAST(key AS BIGINT) % 3 = 0
         |                            THEN NULL ELSE jsondata END)) AS results
         |  FROM sri GROUP BY 1)
         |SELECT r.href AS href, coalesce(r.expanded, r.href) AS jsondata
         |FROM (SELECT unnest(results) AS r FROM env)
         |ORDER BY href""".stripMargin,

    "merge_delta" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype FROM (
         |  SELECT t.href, t.key, t.modified_ms, t.jsondata, t.resourcetype
         |  FROM starget t
         |  WHERE NOT EXISTS (SELECT 1 FROM stomb x WHERE x.href = t.href)
         |    AND NOT EXISTS (SELECT 1 FROM slive l WHERE l.href = t.href)
         |  UNION ALL
         |  SELECT href, key, modified_ms, jsondata, resourcetype FROM slive)
         |ORDER BY href""".stripMargin,

    "merge_safe" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype FROM (
         |  SELECT t.href, t.key, t.modified_ms, t.jsondata, t.resourcetype
         |  FROM starget t
         |  WHERE EXISTS (SELECT 1 FROM sri m
         |    WHERE m.resourcetype <> 'error' AND m.href = t.href)
         |  UNION ALL
         |  SELECT f.href, f.key, f.modified_ms, f.jsondata, f.resourcetype
         |  FROM sri f
         |  WHERE EXISTS (SELECT 1 FROM sri m
         |      WHERE m.resourcetype <> 'error' AND m.href = f.href)
         |    AND NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = f.href))
         |ORDER BY href""".stripMargin,

    "merge_counts" ->
      s"""${sriCtes}SELECT action, n FROM (
         |  SELECT 'delete' AS action, COUNT(*) AS n FROM starget w
         |    WHERE EXISTS (SELECT 1 FROM stomb t WHERE t.href = w.href)
         |  UNION ALL
         |  SELECT 'update' AS action, COUNT(*) AS n FROM slive s
         |    JOIN starget t ON s.href = t.href
         |    WHERE s.jsondata IS DISTINCT FROM t.jsondata
         |  UNION ALL
         |  SELECT 'insert' AS action, COUNT(*) AS n FROM slive s
         |    WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = s.href))
         |ORDER BY action""".stripMargin,

    "p2_fix_resource" ->
      s"""${sriCtes}SELECT href,
         |  coalesce(key2, regexp_extract(href, '([^/]*)$$', 1)) AS key,
         |  coalesce(modified2, $CutMs) AS modified_ms,
         |  jsondata, resourcetype
         |FROM (
         |  SELECT href, jsondata, resourcetype,
         |    CASE WHEN CAST(key AS BIGINT) % 5 = 0 THEN NULL ELSE key END AS key2,
         |    CASE WHEN CAST(key AS BIGINT) % 5 = 0 THEN NULL
         |         ELSE modified_ms END AS modified2
         |  FROM sri)
         |ORDER BY href""".stripMargin,

    "p4_source_predicates" ->
      s"""${sriCtes}SELECT pass, href FROM (
         |  SELECT 'deleted' AS pass, href FROM sri
         |    WHERE modified_ms >= $CutMs AND resourcetype = 'error'
         |  UNION ALL
         |  SELECT 'updated', href FROM sri
         |    WHERE modified_ms >= $CutMs AND resourcetype = 'click')
         |ORDER BY pass, href""".stripMargin,

    "p6_scope_fence" ->
      s"""${sriCtes}SELECT href, 'https://api.example.org' AS baseurl,
         |  '/events' AS path
         |FROM sri WHERE CAST(key AS BIGINT) % 2 = 0
         |ORDER BY href""".stripMargin,

    "f1_f2_href_fns" ->
      s"""${sriCtes}SELECT href,
         |  regexp_extract(href, '([^/]*)$$', 1) AS derived_key,
         |  regexp_replace(href, '/[^/]*$$', '') AS derived_path,
         |  regexp_extract(href, '^((/[A-Za-z]+)+)/[^/]*$$', 1) AS derived_path_re
         |FROM sri ORDER BY href""".stripMargin,

    "f5_expand_rewrite" ->
      s"""${sriCtes}SELECT href, path,
         |  CASE WHEN path LIKE '%?%' AND path LIKE '%expand=%'
         |       THEN regexp_replace(path, 'expand=[^&]*', 'expand=NONE')
         |       WHEN path LIKE '%?%' THEN path || '&expand=NONE'
         |       ELSE path || '?expand=NONE' END AS rewritten
         |FROM (
         |  SELECT href,
         |    CASE WHEN CAST(key AS BIGINT) % 3 = 0
         |         THEN href || '?expand=FULL&limit=5'
         |         WHEN CAST(key AS BIGINT) % 3 = 1 THEN href || '?limit=5'
         |         ELSE href END AS path
         |  FROM sri)
         |ORDER BY href""".stripMargin,

    "f6_time_roundtrip" ->
      s"""${sriCtes}SELECT href,
         |  strftime(epoch_ms(modified_ms), '%Y-%m-%dT%H:%M:%S.%gZ') AS iso,
         |  epoch_ms(strptime(
         |    strftime(epoch_ms(modified_ms), '%Y-%m-%dT%H:%M:%S.%gZ'),
         |    '%Y-%m-%dT%H:%M:%S.%gZ')) AS rt_ms
         |FROM sri ORDER BY href""".stripMargin,

    "f9_to_json" ->
      s"""${sriCtes}SELECT href,
         |  to_json(struct_pack(href := href, key := key,
         |    modified_ms := modified_ms)) AS doc
         |FROM sri ORDER BY href""".stripMargin,

    "p1_strip_dollar" ->
      s"""${sriCtes}SELECT href,
         |  '{"$$$$meta":{"type":"event"},"k":' || json_extract_string(jsondata, '$$.k')
         |    || ',"nested":{"v":' || json_extract_string(jsondata, '$$.k')
         |    || '}}' AS stripped
         |FROM sri ORDER BY href""".stripMargin,

    "f10_json_merge_patch" ->
      s"""${sriCtes}SELECT href, '{"patched":7}' AS doc
         |FROM sri ORDER BY href""".stripMargin,

    "inc_agg_merge" ->
      s"""SELECT event_type, COUNT(*) AS cnt,
         |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
         |    AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "inc_join_delta" ->
      s"""WITH p AS (SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ts
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ts
         |      FROM events WHERE event_type = 'click')
         |SELECT user_id, COUNT(*) AS n_new_pairs,
         |  MIN(p_id + c_id) AS min_idsum
         |FROM p JOIN c USING (user_id)
         |WHERE p_ts >= $CutMs OR c_ts >= $CutMs
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "inc_join_retract" ->
      s"""WITH p AS (SELECT user_id, event_id AS p_id, epoch_ms(ts) AS p_ts
         |           FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ts
         |      FROM events WHERE event_type = 'click'
         |        AND epoch_ms(ts) < $CutMs),
         |anew AS (SELECT * FROM p
         |         WHERE NOT (user_id % 7 = 0 AND p_ts < $CutMs))
         |SELECT user_id, COUNT(*) AS n_pairs, MIN(p_id + c_id) AS min_idsum
         |FROM anew JOIN c USING (user_id)
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "f4_string_hash" ->
      s"""${sriCtes}SELECT href,
         |  CAST(list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split_regex(href, ''),
         |        c -> CAST(unicode(c) AS BIGINT))),
         |    (h, c) -> ((((h * 31 + c + 2147483648) % 4294967296)
         |      + 4294967296) % 4294967296) - 2147483648) AS INTEGER) AS h
         |FROM sri ORDER BY href""".stripMargin
  )
}
