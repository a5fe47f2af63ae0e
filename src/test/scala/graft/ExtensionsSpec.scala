package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions deployment path: a cluster configured with
  * `spark.sql.extensions=graft.expr.GraftExtensions` gets the custom
  * functions in every session — SQL-only clients included — without any
  * register() call. */
class ExtensionsSpec extends SparkSuite {

  test("extension-injected functions resolve with no register() call") {
    spark.sparkContext // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is a STATIC conf read from the SparkContext
      // at session construction; with a context already running the
      // programmatic hook is the equivalent injection point (same
      // GraftExtensions class a cluster names in the static conf)
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.expr.GraftExtensions())
        .getOrCreate()
      val r = ext.sql(
        """select java_string_hash('abc') h,
          |  dot_ff(array(cast(1.5 as float), cast(-2.0 as float)),
          |         array(cast(4.0 as float), cast(0.5 as float))) d""".stripMargin)
        .collect().head
      assert(r.getInt(0) === "abc".hashCode)
      assert(r.getDouble(1) === 1.5d * 4.0d + -2.0d * 0.5d)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
