package graft.sink

/** Dumps the GENERATED merge SQL for every dialect as JSON, in the exact
  * order [[JdbcMergeSink.mergeAndCommit]] executes it — so driver-side
  * tooling can run the postgres arm through an engine with a
  * pg-compatible SQL surface (tools/pg_check.py uses DuckDB: DELETE
  * USING, UPDATE ... FROM, IS DISTINCT FROM, and partitioned ROW_NUMBER
  * all execute verbatim there) and assert it converges to the same
  * final state the Derby arm reaches under `JdbcLiveSpec`.
  *
  * The fixture config mirrors JdbcLiveSpec: target `apptable`, staging
  * `staging`, deletes table `deletes`, key `href`, columns
  * (href, modified_ms, jsondata). Usage:
  * {{{ runMain graft.sink.MergeSqlDump /path/out.json }}}
  */
object MergeSqlDump {
  import JdbcMergeSink._

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/merge_sql.json")
    val cols = Seq("href", "modified_ms", "jsondata")
    def q(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    val dialects = Seq(Postgres, MsSql, Derby).map { d =>
      val c = SinkConfig(url = "", table = "apptable",
        stagingTable = "staging", keys = Seq("href"), dialect = d)
      // delta-path statement order from mergeAndCommit: delete → update →
      // insert → state; plus the full-sync prune variant
      val fields = Seq(
        "delete" -> q(deleteSql(c, "deletes")),
        "prune" -> q(pruneSql(c)),
        "update" -> q(updateSql(c)),
        "insert" -> q(insertSql(c, cols)),
        // safe-sync arm (safeSyncAndCommit order: delete → insert);
        // members table `members`, fetched-missing table `missing`
        "safe_delete" -> q(safeDeleteSql(c, "members")),
        "safe_insert" -> q(safeInsertSql(c, cols, "missing")),
        "state" -> stateSql(c, "apptable", "delta", 200L, 1000L)
          .map(q).mkString("[", ",", "]"))
      q(d.name) + ":" +
        fields.map { case (k, v) => q(k) + ":" + v }.mkString("{", ",", "}")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (dialects.mkString("{", ",", "}") + "\n").getBytes("UTF-8"))
    println(s"wrote $out")
  }
}
