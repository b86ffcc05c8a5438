package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage timer for the Borůvka plan (not part of the driver
  * contract): splits the query into prologue / argmin / contraction /
  * round-2 legs to find where the wall-clock goes.
  */
object BoruvkaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // warm
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    val edges = graft.queries.TrainingDataQueries.lshPairDists(spark, dir).persist()
    val ne = tm("edges persist+count") { edges.count() }
    println(s"[probe] n_edges = $ne")
    val nodes = edges.select(col("id_a").as("node"))
      .unionByName(edges.select(col("id_b").as("node"))).distinct()
    val nNodes = tm("nodes count") { nodes.count() }
    println(s"[probe] n_nodes = $nNodes")
    val e1 = edges.select(col("id_a"), col("id_b"), col("dist"),
      col("id_a").as("la"), col("id_b").as("lb"))
    val contrib = e1.select(col("la").as("comp"), col("dist"),
        col("id_a"), col("id_b"), col("la"), col("lb"))
      .unionByName(e1.select(col("lb").as("comp"), col("dist"),
        col("id_a"), col("id_b"), col("la"), col("lb")))
    val s1 = contrib.withColumn("rk", row_number().over(
        Window.partitionBy("comp").orderBy(col("dist"), col("id_a"), col("id_b"))))
      .filter(col("rk") === 1)
      .select("id_a", "id_b", "dist", "la", "lb")
      .distinct()
    val s1c = tm("s1 argmin+checkpoint") { s1.localCheckpoint(true) }
    tm("s1 stats agg") { s1c.agg(count(lit(1)), sum("dist")).head }
    val lcc = tm("contraction CC") {
      val r = graft.queries.TrainingDataQueries.connectedComponents(
        s1c.select(col("la").as("doc_a"), col("lb").as("doc_b")))
      r.count(); r
    }
    val relab = lcc.select(col("node").as("old_label"), col("label").as("new_label"))
    val labels = tm("labels join+checkpoint") {
      nodes.join(relab, nodes("node") === relab("old_label"), "left")
        .select(col("node"), coalesce(col("new_label"), col("node")).as("label"))
        .localCheckpoint(true)
    }
    val e2 = edges
      .join(labels.select(col("node").as("id_a"), col("label").as("la")), "id_a")
      .join(labels.select(col("node").as("id_b"), col("label").as("lb")), "id_b")
      .filter(col("la") =!= col("lb"))
    val contrib2 = e2.select(col("la").as("comp"), col("dist"),
        col("id_a"), col("id_b"), col("la"), col("lb"))
      .unionByName(e2.select(col("lb").as("comp"), col("dist"),
        col("id_a"), col("id_b"), col("la"), col("lb")))
    val s2 = contrib2.withColumn("rk", row_number().over(
        Window.partitionBy("comp").orderBy(col("dist"), col("id_a"), col("id_b"))))
      .filter(col("rk") === 1)
      .select("id_a", "id_b", "dist", "la", "lb")
      .distinct()
    tm("s2 stats agg") { s2.agg(count(lit(1)), sum("dist")).head }
    spark.stop()
  }
}
