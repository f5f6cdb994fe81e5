package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions: a session BUILT with the extensions resolves the
  * native functions with no per-session register() call. */
class ExtensionsSpec extends SparkSuite {

  test("withExtensions installs vec_dot/vec_sqdist at session build time") {
    val suiteSession = spark // force the shared session (and context) up
    // getOrCreate returns an existing default session (ignoring new
    // extensions), so clear the defaults, build fresh over the SAME
    // SparkContext, and restore the suite session afterwards.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(!(ext eq suiteSession), "builder returned the old session — extensions not applied")
      val dot = ext.sql(
        "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
      assert(dot == 11.0, s"vec_dot via extensions = $dot")
      val sq = ext.sql(
        "SELECT vec_sqdist(array(1.0d, 2.0d), array(3.0d, 3.0d)) AS d").head().getDouble(0)
      assert(sq == 5.0, s"vec_sqdist via extensions = $sq")
    } finally {
      SparkSession.setDefaultSession(suiteSession)
      SparkSession.setActiveSession(suiteSession)
    }
  }
}
