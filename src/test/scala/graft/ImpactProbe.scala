package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iteration probe: stage-by-stage wall times of the h_impact_compare /
  * impact_embed_missfalse pipeline at a given sf dir (not a test — a main,
  * like BenchProbe). */
object ImpactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    import graft.watermark.{Scpw, TabularMark, Tvp}
    import graft.graph.KnnGraph
    import graft.knn.Knn

    val emb = Tables.embeddings(spark, sfDir)
    t("emb.count")(emb.count())
    val raw = t("rawKnn build")(KnnGraph.rawKnn(emb, 17).persist())
    t("rawKnn count")(raw.count())
    // mirrors SparkEntry's private constants
    val D = 64; val WM = "10101"; val Strength = 0.6
    val key = graft.watermark.WmKey(seed = "20")
    val scpwKey = graft.watermark.ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
    val tmKey = graft.watermark.TmKey(nw = 100, p = 4.0, k = 40, position = 50)
    val cl   = t("classify ckpt")(Tvp.classify(emb, D, WM.length, key).localCheckpoint())
    val bits = Tvp.bitsDf(spark, WM)
    val rsC  = t("carriersRs ckpt")(Tvp.carriersRs(cl, bits, Strength, key.seed).localCheckpoint())
    val edges = t("edges")(KnnGraph.edges(emb, 8, Some(raw)))
    val aiDf  = t("accessibility")(KnnGraph.accessibility(emb, edges).persist())
    t("ai count")(aiDf.count())
    val tvC  = t("carriersAi ckpt")(Tvp.carriersAi(cl, bits, Strength, 0.1, aiDf).localCheckpoint())
    val scC  = t("scpw carriers ckpt")(Scpw.carriers(emb, WM, Strength, scpwKey).localCheckpoint())
    // --- new h_impact_compare shape, stage by stage ---
    val cases = Seq(
      ("rs",  Tvp.applyEmbed(emb, rsC, D, key), rsC.select(col("vec_id"))),
      ("tvp", Tvp.applyEmbed(emb, tvC, D, key), tvC.select(col("vec_id"))),
      ("tm",  TabularMark.embed(emb, tmKey),
        emb.filter(col("vec_id") < tmKey.nw).select(col("vec_id"))),
      ("scpw", t("scpw embed call")(Scpw.embed(emb, WM, Strength, scpwKey, Some(scC))),
        scC.select(col("vec_id"))))
    val tagOf = cases.map(_._1).zipWithIndex.toMap
    val modAll = t("modAll ckpt") {
      cases.map { case (n, wmDf, ids) =>
        wmDf.select(col("vec_id"), col("embedding"))
          .join(broadcast(ids), Seq("vec_id"), "left_semi")
          .withColumn("sch", lit(tagOf(n)))
      }.reduce(_ unionByName _).localCheckpoint()
    }
    val qAll = cases.map { case (n, _, _) =>
      emb.select(col("vec_id"), col("embedding")).withColumn("sch", lit(tagOf(n)))
    }.reduce(_ unionByName _)
    val modIds = modAll.select(col("sch").as("msch"), col("vec_id").as("mid"))
    val rawTag = cases.map { case (n, _, _) =>
      raw.select(col("query_id"), col("neighbor_id"), col("dist"))
        .withColumn("sch", lit(tagOf(n)))
    }.reduce(_ unionByName _)
    val surv = rawTag.join(broadcast(modIds),
        col("sch") === col("msch") && col("neighbor_id") === col("mid"), "left_anti")
    t("nShort count")(surv.groupBy("sch", "query_id").agg(count(lit(1)).as("c"))
      .filter(col("c") < 10).count())
    val modTop = t("exactGrouped modAll call")(
      Knn.exactGrouped(qAll, modAll, 10, "sch", kernel = "fold")
        .select(col("sch"), col("query_id"), col("neighbor_id"), col("dist")))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sch"), col("query_id")).orderBy(col("dist"), col("neighbor_id"))
    val afterAll = surv.unionByName(modTop)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= 10)
    t("afterAll count")(afterAll.count())
    val base10 = raw.filter(col("rank") <= 10)
    val carrTag = cases.map { case (n, _, ids) =>
      ids.withColumn("sch", lit(tagOf(n)))
    }.reduce(_ unionByName _).select(col("sch").as("csch"), col("vec_id").as("cid"))
    val hitsB = base10.join(broadcast(carrTag), col("neighbor_id") === col("cid"))
      .select(col("csch").as("sch"), col("cid").as("carrier"), col("query_id").as("query"))
    val hitsA = afterAll.join(broadcast(carrTag),
        col("sch") === col("csch") && col("neighbor_id") === col("cid"))
      .select(col("sch"), col("cid").as("carrier"), col("query_id").as("query"))
    t("metrics plan count")(
      hitsB.withColumn("in_base", lit(1))
        .join(hitsA.withColumn("in_after", lit(1)),
          Seq("sch", "carrier", "query"), "full_outer")
        .groupBy("sch", "carrier")
        .agg(sum(when(col("in_base").isNotNull && col("in_after").isNull, 1).otherwise(0)).as("miss"),
          sum(when(col("in_after").isNotNull && col("in_base").isNull, 1).otherwise(0)).as("false_hits"))
        .groupBy("sch")
        .agg(round(avg("miss"), 6).as("avg_miss"),
          round(avg("false_hits"), 6).as("avg_false"),
          count(lit(1)).as("n_carriers")).count())

    val rsWm = Tvp.applyEmbed(emb, rsC, D, key)
    val rsMod = t("rs mod frame")(
      rsWm.select(col("vec_id"), col("embedding"))
        .join(broadcast(rsC.select(col("vec_id"))), Seq("vec_id"), "left_semi").localCheckpoint())
    t("rs merge after + count")(
      Knn.topKAfterModify(emb, emb, raw, rsMod, 10).count())
    t("rs FULL exact after + count")(
      Knn.exact(emb, rsWm, 10, kernel = "fold").count())
    val scWm = t("scpw embed plan")(Scpw.embed(emb, WM, Strength, scpwKey, Some(scC)))
    val scMod = t("scpw mod frame")(
      scWm.select(col("vec_id"), col("embedding"))
        .join(broadcast(scC.select(col("vec_id"))), Seq("vec_id"), "left_semi").localCheckpoint())
    t("scpw merge after + count")(
      Knn.topKAfterModify(emb, emb, raw, scMod, 10).count())
    val tmWm = TabularMark.embed(emb, tmKey)
    val tmMod = t("tm mod frame")(
      tmWm.select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < tmKey.nw).localCheckpoint())
    t("tm merge after + count")(
      Knn.topKAfterModify(emb, emb, raw, tmMod, 10).count())
    spark.stop()
  }
}
