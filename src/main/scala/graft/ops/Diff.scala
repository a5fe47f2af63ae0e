package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1–J6 — the reference's set-difference / change-detection join algebra.
  *
  * Every destructive SQL statement the reference generates is one of four
  * equi-join shapes on the logical key `(baseurl?, path?, href)`; here they
  * are pure `DataFrame => DataFrame` operators. Catalyst/AQE picks
  * broadcast-hash for the (typically small) delta side automatically —
  * exactly the plan you want at cluster scale, with no hints needed
  * (SURVEY §2.4 strategy note).
  */
object Diff {

  /** J1/D1 — tombstone deletion (delta sync): survivors of `target` after
    * removing rows whose key appears in `tombstones`.
    * Reference: `DELETE FROM write w USING ##deletes t WHERE w.href=t.href`
    * (src/lib/client.js:1033-1038 pg, 899-905 mssql). */
  def deleteByKeys(target: DataFrame, tombstones: DataFrame,
                   keys: Seq[String]): DataFrame =
    target.join(tombstones.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** J2/D2 — full-sync prune: rows of `target` absent from the fresh
    * `snapshot` are dropped.
    * Reference: `DELETE … WHERE NOT EXISTS (SELECT 1 FROM ##updates …)`
    * (src/lib/client.js:1006-1015 pg, 886-896 mssql). */
  def pruneAbsent(target: DataFrame, snapshot: DataFrame,
                  keys: Seq[String]): DataFrame =
    target.join(snapshot.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** J3/U1 + P5 — changed rows: staged rows whose key exists in `target`
    * but whose payload differs (null-safe: `<=>` negated).
    * Reference: `UPDATE … WHERE keys match AND (t.jsondata <> w.jsondata OR
    * exactly one side NULL)` (src/lib/client.js:1058-1065 pg, 925-933 mssql;
    * predicate src/lib/client.js:1064, 932). */
  def changedRows(target: DataFrame, staged: DataFrame,
                  keys: Seq[String], payload: String): DataFrame = {
    val t = target.select((keys :+ payload).map(col): _*)
      .withColumnRenamed(payload, "__t_payload")
    staged.join(t, keys, "inner")
      .where(!(col(payload) <=> col("__t_payload")))
      .drop("__t_payload")
  }

  /** J4/I1 — insert candidates: deduped staged rows whose key is NOT yet in
    * `target`. Reference: `INSERT … SELECT FROM (windowed dedup) t WHERE
    * rowNumber=1 AND NOT EXISTS (…)` (src/lib/client.js:1074-1110, 942-978). */
  def newRows(target: DataFrame, stagedDeduped: DataFrame,
              keys: Seq[String]): DataFrame =
    stagedDeduped.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** J5/D3 — membership reconciliation delete (safe sync): survivors of
    * `target` whose key IS in the authoritative `members` list.
    * Reference uses multi-column NOT IN / NOT EXISTS
    * (src/lib/client.js:1187-1198 pg, 1128-1146 mssql); `left_semi` has the
    * right semantics directly (hrefs are non-null — SURVEY §7.3 risk 4). */
  def keepMembers(target: DataFrame, members: DataFrame,
                  keys: Seq[String]): DataFrame =
    target.join(members.select(keys.map(col): _*).distinct(), keys, "left_semi")

  /** J6 — missing members: authoritative keys with no row in `target`;
    * drives the point-fetch pass of safe sync.
    * Reference: left-join-null idiom (src/lib/client.js:1268-1279 pg,
    * 1247-1265 mssql). */
  def missingMembers(members: DataFrame, target: DataFrame,
                     keys: Seq[String]): DataFrame =
    members.join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
