package graft

import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthetic-scale A/B for the three r13 batch join operators, at shapes the
  * fixture cannot reach. Run: `Test/runMain graft.JoinScaleProbe [nFact]`
  * (default 5,000,000).
  *
  * - as-of: union+window form at nFact fact rows ⋈ nFact/10 dim rows over
  *   1000 keys, vs the theta-join+argmax formulation at 1/25 the size
  *   (the theta form's work is |fact|·|dim-per-key| — at full probe scale
  *   it would evaluate 2.5·10⁹ pairs).
  * - range: bin-bucketed containment at nFact points ⋈ nFact/100
  *   intervals, vs the raw inequality join (BroadcastNestedLoopJoin) at
  *   1/25 the size.
  * - skew: salted vs plain shuffle join (AQE off, broadcast off) at nFact
  *   rows with 90% of the fact on one key.
  *
  * VERDICT (r13, 32 cores, n = 5M):
  * - as-of union+window: 5.3/2.1/1.5 s across passes at 5M⋈500k. At 1/25
  *   scale (200k⋈20k) the theta+argmax form already costs 1.75 s vs 0.98 s
  *   — and theta work is the PAIR count, which grows 625× back to full
  *   scale (≈ 18 min extrapolated vs 1.5 s measured). The union form's
  *   cost is the one exchange, linear in |fact|+|dim|.
  * - range binned: 2.1/1.2/1.0 s at 5M points ⋈ 50k intervals. The raw
  *   inequality join plans BroadcastNestedLoopJoin and costs 2.8 s at
  *   1/2500 of the pair volume (200k × 2k) — ≈ 2 h extrapolated to the
  *   full probe shape vs 1.0 s binned.
  * - skew salted: 1.16–1.98 s vs plain 2.07–2.81 s (~1.7× warm) with 90%
  *   of 5M rows on one key — census + ×32 dim replication included; the
  *   plain join's hot task holds 4.5M rows, the salted peak ~140k.
  * - as-of under the same 90%-hot-key shape: plain `backward` 12.4–14.6 s
  *   (ONE task sorts the hot key's 4.5M-row history, 31 cores idle) vs
  *   `backwardBucketed` 2.8–4.8 s warm (~4.5×) at 64 time-slice buckets —
  *   and the plain path's hot task grows linearly with the key's history
  *   while the bucketed path's grows with rows-per-slice, so the gap is
  *   unbounded at 100 TB.
  */
object JoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    def hashT(seed: String, m: Long) =
      conv(substring(md5(concat(lit(seed), col("id"))), 1, 12), 16, 10)
        .cast("long") % m

    // ---- as-of ----------------------------------------------------------
    val keys = 1000L
    val fact = spark.range(n).select((col("id") % keys).cast("string").as("k"),
      hashT("f", 1000000000L).as("t"), col("id").as("fid")).cache()
    val dim = spark.range(n / 10).select((col("id") % keys).cast("string").as("k"),
      hashT("d", 1000000000L).as("t"), (col("id") * 7L).as("v"))
      .groupBy("k", "t").agg(max("v").as("v")).cache()
    println(s"asof: fact ${fact.count()} dim ${dim.count()} keys $keys")
    (1 to 3).foreach { p =>
      time(s"asof union+window p$p") {
        AsOfJoin.backward(fact, dim, "k", "t", Seq("v"))
          .agg(count(lit(1)), sum("v")).collect()
      }
    }
    val sn = n / 25
    val sFact = fact.filter(col("fid") < sn).cache(); sFact.count()
    val sDim = dim.sample(0.04, 7).cache(); sDim.count()
    time(s"asof theta+argmax 1/25") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fid").orderBy(col("dt").desc_nulls_last)
      sFact.join(sDim.select(col("k"), col("t").as("dt"), col("v")),
          sFact("k") === sDim("k") && col("dt") <= sFact("t"), "left")
        .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .agg(count(lit(1)), sum("v")).collect()
    }
    time(s"asof union+window 1/25") {
      AsOfJoin.backward(sFact, sDim, "k", "t", Seq("v"))
        .agg(count(lit(1)), sum("v")).collect()
    }

    // ---- as-of under key skew: plain (one task per key) vs bucketed -----
    val hotFact = spark.range(n).select(
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("c"), (col("id") % 97).cast("string"))).as("k"),
      hashT("hf", 1000000000L).as("t"), col("id").as("fid")).cache()
    val hotDim = spark.range(n / 50).select(
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("c"), (col("id") % 97).cast("string"))).as("k"),
      hashT("hd", 1000000000L).as("t"), (col("id") * 7L).as("v"))
      .groupBy("k", "t").agg(max("v").as("v")).cache()
    println(s"asof-skew: fact ${hotFact.count()} dim ${hotDim.count()} (90% one key)")
    (1 to 3).foreach { p =>
      time(s"asof plain hot p$p") {
        AsOfJoin.backward(hotFact, hotDim, "k", "t", Seq("v"))
          .agg(count(lit(1)), sum("v")).collect()
      }
      time(s"asof bucketed hot p$p") {
        AsOfJoin.backwardBucketed(hotFact, hotDim, "k", "t", Seq("v"),
            bucketWidth = 1000000000L / 64)
          .agg(count(lit(1)), sum("v")).collect()
      }
    }

    // ---- range ----------------------------------------------------------
    val pts = spark.range(n).select(hashT("p", 1000000000L).as("t"),
      col("id").as("pid")).cache()
    val iv = spark.range(n / 100).select(hashT("i", 1000000000L).as("s"),
      col("id").as("iid")).withColumn("e", col("s") + 2000L).cache()
    println(s"range: points ${pts.count()} intervals ${iv.count()}")
    (1 to 3).foreach { p =>
      time(s"range binned p$p") {
        RangeJoin.pointInInterval(pts, iv, "t", "s", "e", binWidth = 2000L)
          .agg(count(lit(1))).collect()
      }
    }
    val sPts = pts.filter(col("pid") < sn).cache(); sPts.count()
    val sIv = iv.filter(col("iid") < n / 2500).cache(); sIv.count()
    time("range theta (BNLJ) 1/25") {
      sPts.join(sIv, col("t") >= col("s") && col("t") < col("e"))
        .agg(count(lit(1))).collect()
    }
    time("range binned 1/25") {
      RangeJoin.pointInInterval(sPts, sIv, "t", "s", "e", binWidth = 2000L)
        .agg(count(lit(1))).collect()
    }

    // ---- skew -----------------------------------------------------------
    val skew = spark.range(n).select(
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("c"), (col("id") % 97).cast("string"))).as("k"),
      col("id").as("rid")).cache()
    val sdim = skew.groupBy("k").agg(count(lit(1)).as("attr")).cache()
    println(s"skew: fact ${skew.count()} keys ${sdim.count()}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 3).foreach { p =>
      time(s"skew plain p$p") {
        skew.join(sdim, "k").agg(count(lit(1)), sum("attr")).collect()
      }
      time(s"skew salted p$p") {
        SkewJoin.innerSalted(skew, sdim, "k", col("rid"), nSalt = 32,
            heavyThreshold = n / 20, modelBigDim = false)
          .agg(count(lit(1)), sum("attr")).collect()
      }
    }
    spark.stop()
  }
}
