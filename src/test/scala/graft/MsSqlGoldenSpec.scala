package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sink.JdbcMergeSink
import graft.sink.JdbcMergeSink._

/** Golden SHAPE tests for the mssql merge/safe-sync SQL — the one
  * generated surface no engine in this sandbox can execute (DuckDB runs
  * the pg arm verbatim in tools/pg_check.py; Derby executes the
  * portable arm in JdbcLiveSpec; nothing here parses T-SQL). This is
  * the documented ceiling: each golden below is the statement the
  * REFERENCE's own mssql template emits when instantiated with this
  * repo's fixture config (schema brackets dropped, no baseurl/path
  * tenant arms, columns href/modified_ms/jsondata — the FIXTURES.md §B
  * mapping), cited to its client.js lines. Both sides are reduced to a
  * structural shape (verb, tables, key predicate, null-safe diff
  * triple, dedup window, guards) and compared — robust to the
  * semantically-equivalent spellings the two codebases choose
  * (INNER JOIN vs EXISTS semi-join, ON vs WHERE placement of the
  * change predicate, rowNumber vs rn).
  */
class MsSqlGoldenSpec extends AnyFunSuite {

  private val c = SinkConfig(url = "", table = "apptable",
    stagingTable = "staging", keys = Seq("href"), dialect = MsSql)
  private val cols = Seq("href", "modified_ms", "jsondata")

  private def norm(s: String): String =
    s.toLowerCase.replace("[", "").replace("]", "")
      .replaceAll("\\s+", " ").trim

  /** Key-equality columns: every `a.k = b.k` with matching column. */
  private def keyCols(n: String): Set[String] =
    "(\\w+)\\.(\\w+) = (\\w+)\\.(\\w+)".r.findAllMatchIn(n)
      .filter(m => m.group(2) == m.group(4) && m.group(1) != m.group(3))
      .map(_.group(2)).toSet

  /** The three arms of the null-safe change predicate, any operand
    * order: a <> b, (a null and b not null), (a not null and b null) —
    * the A+B arm pair covers both null-asymmetry directions whichever
    * alias each arm leads with, so accept either spelling (ours leads
    * with t in both arms; the reference leads with w in both). */
  private def nullSafeDiff(n: String): Boolean = {
    val neq = "(\\w+)\\.jsondata <> (\\w+)\\.jsondata".r
      .findFirstIn(n).isDefined
    val armA = "\\(\\s*(\\w+)\\.jsondata is null and (\\w+)\\.jsondata is not null\\s*\\)".r
      .findFirstMatchIn(n).map(m => Set(m.group(1), m.group(2)))
    val armB = "\\(\\s*(\\w+)\\.jsondata is not null and (\\w+)\\.jsondata is null\\s*\\)".r
      .findFirstMatchIn(n).map(m => Set(m.group(1), m.group(2)))
    neq && armA.isDefined && armA == armB &&
      armA.exists(_.size == 2) // two distinct aliases in each arm
  }

  private def window(n: String): Option[(String, String)] =
    "row_number\\(\\) over \\(\\s*partition by\\s+([\\w, ]+?)\\s+order by\\s+(\\w+) desc\\s*\\)".r
      .findFirstMatchIn(n)
      .map(m => (m.group(1).replace(" ", ""), m.group(2)))

  /** Semi/anti-join source: the table probed under (NOT) EXISTS or
    * joined with INNER JOIN. */
  private def probedTables(n: String): Set[String] =
    ("(?:not exists \\(\\s*select 1 from (\\w+)|" +
      "exists \\(\\s*select 1 from (\\w+)|inner join (\\w+)|join (\\w+))").r
      .findAllMatchIn(n)
      .flatMap(m => Seq(m.group(1), m.group(2), m.group(3), m.group(4)))
      .filter(_ != null).toSet

  private def antiJoined(n: String): Set[String] =
    "not exists \\(\\s*select 1 from (\\w+)".r
      .findAllMatchIn(n).map(_.group(1)).toSet

  // ---- goldens: the reference template at this fixture config ----

  /** client.js:899-905 (deltaSyncDeleteQuery). */
  private val goldenDelete = norm(
    """DELETE w FROM apptable w
      |INNER JOIN deletes t ON t.href = w.href""".stripMargin)

  /** client.js:886-896 (fullSyncDeleteQuery, non-deletesAll arm). */
  private val goldenPrune = norm(
    """DELETE w FROM apptable w
      |WHERE NOT EXISTS (SELECT 1 FROM staging i WHERE i.href = w.href)"""
      .stripMargin)

  /** client.js:925-933 (update; change predicate lives in the ON). */
  private val goldenUpdate = norm(
    """UPDATE w SET w.modified_ms = t.modified_ms, w.jsondata = t.jsondata
      |FROM staging t INNER JOIN apptable w ON t.href = w.href
      |AND (t.jsondata <> w.jsondata
      |  OR (w.jsondata IS NULL AND t.jsondata IS NOT NULL)
      |  OR (w.jsondata IS NOT NULL AND t.jsondata IS NULL))""".stripMargin)

  /** client.js:942-978 (window-deduped guarded insert). */
  private val goldenInsert = norm(
    """INSERT INTO apptable(href, modified_ms, jsondata)
      |SELECT t.href, t.modified_ms, t.jsondata
      |FROM (SELECT *, ROW_NUMBER() over (partition by href
      |        ORDER BY modified_ms DESC) as rowNumber
      |      FROM staging) t
      |WHERE t.rowNumber = 1
      |  AND NOT EXISTS (select 1 from apptable w
      |    where t.href = w.href)""".stripMargin)

  /** client.js:1128-1141 (safe-sync membership delete). */
  private val goldenSafeDelete = norm(
    """DELETE w FROM apptable w
      |WHERE NOT EXISTS (SELECT 1 FROM members i WHERE i.href = w.href)"""
      .stripMargin)

  /** client.js:1155-1173 (safe-sync deduped guarded insert). */
  private val goldenSafeInsert = norm(
    """INSERT INTO apptable(href, modified_ms, jsondata)
      |SELECT t.href, t.modified_ms, t.jsondata
      |FROM (SELECT *, ROW_NUMBER() over (partition by href
      |        ORDER BY modified_ms DESC) as rowNumber
      |      FROM missing) t
      |WHERE t.rowNumber = 1
      |  AND NOT EXISTS (select 1 from apptable w
      |    where t.href = w.href)""".stripMargin)

  private def insertCols(n: String): Option[String] =
    "insert into (\\w+)\\s*\\(([^)]*)\\)".r.findFirstMatchIn(n)
      .map(m => m.group(1) + ":" + m.group(2).replace(" ", ""))

  test("mssql delta delete matches the reference shape: DELETE-alias " +
      "semi-join of apptable against deletes on href") {
    val ours = norm(deleteSql(c, "deletes"))
    assert(ours.startsWith("delete w from apptable w"))
    assert(goldenDelete.startsWith("delete w from apptable w"))
    assert(keyCols(ours) === keyCols(goldenDelete))
    assert(probedTables(ours) === probedTables(goldenDelete).map {
      case t => t }, // both probe exactly {deletes}
      s"probed tables differ: $ours vs $goldenDelete")
    assert(probedTables(ours) === Set("deletes"))
    assert(antiJoined(ours).isEmpty && antiJoined(goldenDelete).isEmpty)
  }

  test("mssql full-sync prune matches the reference shape: aliased " +
      "DELETE w FROM + NOT EXISTS against staging (T-SQL cannot alias " +
      "a plain single-table DELETE FROM)") {
    val ours = norm(pruneSql(c))
    assert(ours.startsWith("delete w from apptable w"),
      s"T-SQL needs the 'DELETE w FROM t w' spelling, got: $ours")
    assert(keyCols(ours) === keyCols(goldenPrune))
    assert(antiJoined(ours) === Set("staging"))
    assert(antiJoined(goldenPrune) === Set("staging"))
  }

  test("mssql update matches the reference shape: aliased UPDATE..FROM " +
      "join of staging to apptable on href with the 3-arm null-safe " +
      "change predicate") {
    val ours = norm(updateSql(c))
    for (n <- Seq(ours, goldenUpdate)) {
      assert(n.startsWith("update w set w.modified_ms = t.modified_ms, " +
        "w.jsondata = t.jsondata from "))
      assert(n.contains("apptable w") && n.contains("staging t"))
      assert(keyCols(n).contains("href"))
      assert(nullSafeDiff(n), s"null-safe triple missing/asymmetric: $n")
    }
  }

  test("mssql insert matches the reference shape: window dedup " +
      "(partition href, modified desc, rn=1) + NOT EXISTS guard, same " +
      "column list") {
    val ours = norm(insertSql(c, cols))
    assert(insertCols(ours) === insertCols(goldenInsert))
    assert(window(ours) === window(goldenInsert))
    assert(window(ours) === Some(("href", "modified_ms")))
    assert(ours.matches(".*\\b(rn|rownumber) = 1.*") &&
      goldenInsert.matches(".*\\b(rn|rownumber) = 1.*"))
    assert(antiJoined(ours) === Set("apptable"))
    assert(antiJoined(goldenInsert) === Set("apptable"))
  }

  test("mssql safe-sync delete matches the reference shape (anti-join " +
      "against the member list)") {
    val ours = norm(safeDeleteSql(c, "members"))
    assert(ours.startsWith("delete w from apptable w"))
    assert(keyCols(ours) === keyCols(goldenSafeDelete))
    assert(antiJoined(ours) === Set("members"))
    assert(antiJoined(goldenSafeDelete) === Set("members"))
  }

  test("mssql safe-sync insert matches the reference shape (dedup " +
      "window over the fetched-missing table + NOT EXISTS guard)") {
    val ours = norm(safeInsertSql(c, cols, "missing"))
    assert(insertCols(ours) === insertCols(goldenSafeInsert))
    assert(window(ours) === window(goldenSafeInsert))
    assert(ours.contains("from missing") &&
      goldenSafeInsert.contains("from missing"))
    assert(antiJoined(ours) === Set("apptable"))
    assert(antiJoined(goldenSafeInsert) === Set("apptable"))
  }

  test("pg and derby prune keep the plain DELETE FROM alias spelling " +
      "(both engines accept it; executed in JdbcLiveSpec/pg_check)") {
    assert(norm(pruneSql(c.copy(dialect = Postgres)))
      .startsWith("delete from apptable w"))
    assert(norm(pruneSql(c.copy(dialect = Derby)))
      .startsWith("delete from apptable w"))
  }
}
