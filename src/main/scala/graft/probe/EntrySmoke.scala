package graft.probe

import org.apache.spark.sql.SparkSession

/** Flagship smoke: the driver's first gate is `SparkEntry.entry(spark)`
  * returning rows > 0 on sf0.001 — run it the way the driver does.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRY_ROWS=${rows.length}")
    rows.take(3).foreach(r => println(s"ENTRY_SAMPLE=$r"))
    assert(rows.nonEmpty, "entry() returned zero rows")
    spark.stop()
  }
}
