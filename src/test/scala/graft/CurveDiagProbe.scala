package graft
import graft.attacks.Attacks
import graft.experiments.Experiments
import graft.graph.KnnGraph
import graft.watermark.{Tvp, WmKey}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the sf0.1 TVP adaptive-deletion curve: prints each
  * group's post-embed vote margin and, per deletion fraction p, the realized
  * per-group (deleted-majority − deleted-minority) swing — to attribute bit
  * flips to thin margins vs an AI↔vote correlation.
  * Run: `sbt "Test/runMain graft.CurveDiagProbe [sfDir]"`.
  */
object CurveDiagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark,
      args.headOption.getOrElse("/root/testdata/sf0.1")).cache()
    val wm = "001010010101001010010"
    val wmKey = WmKey(seed = "20")
    val d = 64
    val ai = KnnGraph.accessibility(emb, KnnGraph.edges(emb, 8)).localCheckpoint()
    val wmDf = Tvp.embedAi(emb, wm, 0.54, 1.0, ai, d, wmKey).localCheckpoint()
    val bits = Tvp.bitsDf(spark, wm)

    // post-embed per-group vote stats
    val cls = Tvp.classify(wmDf, d, wm.length, wmKey).cache()
    val margins = cls.groupBy("group_id")
      .agg(count(lit(1)).as("n"), sum("hidden_bit").as("n_one"))
      .join(broadcast(bits), col("group_id") === col("bit_pos"))
      .withColumn("n_correct",
        when(col("wm_bit") === 1, col("n_one")).otherwise(col("n") - col("n_one")))
      .withColumn("margin", col("n_correct") * 2 - col("n"))
      .select("group_id", "n", "wm_bit", "n_correct", "margin")
      .orderBy("group_id")
    println("POST-EMBED margins (group, n, wm_bit, n_correct, margin):")
    margins.collect().foreach(r => println(
      f"  g=${r.getInt(0)}%2d n=${r.getLong(1)}%4d bit=${r.getInt(2)} " +
      f"correct=${r.getLong(3)}%4d margin=${r.getLong(4)}%4d"))

    for (p <- Seq(0.1, 0.2, 0.3, 0.4)) {
      val attacked = Attacks.adaptiveDelete(wmDf, ai, p)
      val aCls = Tvp.classify(attacked, d, wm.length, wmKey)
      val after = aCls.groupBy("group_id")
        .agg(count(lit(1)).as("n_a"), sum("hidden_bit").as("one_a"))
        .join(broadcast(bits), col("group_id") === col("bit_pos"))
        .withColumn("corr_a",
          when(col("wm_bit") === 1, col("one_a")).otherwise(col("n_a") - col("one_a")))
        .withColumn("margin_a", col("corr_a") * 2 - col("n_a"))
        .select(col("group_id"), col("n_a"), col("margin_a"))
      val joined = margins.join(after, "group_id")
        .withColumn("flipped", col("margin_a") <= 0)
        .orderBy("group_id").collect()
      val flips = joined.count(_.getAs[Boolean]("flipped"))
      println(f"p=$p: flips=$flips")
      joined.filter(r => r.getAs[Long]("margin_a") < 8).foreach(r => println(
        f"  g=${r.getInt(0)}%2d n=${r.getLong(1)}%4d margin=${r.getLong(4)}%4d -> " +
        f"n=${r.getAs[Long]("n_a")}%4d margin=${r.getAs[Long]("margin_a")}%4d" +
        (if (r.getAs[Boolean]("flipped")) "  FLIPPED" else "")))
    }
    spark.stop()
  }
}
