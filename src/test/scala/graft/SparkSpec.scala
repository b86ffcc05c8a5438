package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test JVM).
  *
  * Built THROUGH `spark.sql.extensions` — the spark-submit deployment
  * path — so the whole suite continuously exercises the extension
  * injections next to the programmatic `register()`/`install()` twins
  * (both are idempotent, so suites calling them still pass). The driver's
  * own Verify/Bench mains run vanilla sessions, covering the no-extensions
  * path end-to-end.
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
