package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-provided testdata directory. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
