package graft

import graft.experiments.Experiments
import graft.graph.KnnGraph
import graft.metrics.Metrics
import graft.watermark.{ScpwKey, Tvp, WmKey}
import org.scalatest.funsuite.AnyFunSuite

class ExperimentsSpec extends AnyFunSuite {
  lazy val spark   = TestSpark.spark
  lazy val emb     = Tables.embeddings(spark, TestSpark.sf0001).cache()
  val wmKey        = WmKey(seed = "20")
  val scpwKey      = ScpwKey(topK = 20, position = 30, stdE = 0.05, seed = "20")
  lazy val aiDf    = KnnGraph.accessibility(emb, KnnGraph.edges(emb, 8)).cache()

  test("every attack type runs through the harness; BER = 0 unattacked") {
    for (attack <- Seq("none", "random_delete", "adaptive_delete",
                       "random_modify", "adaptive_modify", "insert")) {
      val p   = if (attack == "none") 0.0 else 0.2
      val ber = Experiments.cell(emb, Experiments.SchemeRs, attack, p, rep = 0,
        wm = "10101", strength = 0.7, th = 0.5, d = 64,
        wmKey = wmKey, scpwKey = scpwKey, ai = Some(aiDf))
      assert(ber >= 0.0 && ber <= 1.0, s"$attack ber=$ber")
      if (attack == "none") assert(ber == 0.0, s"unattacked BER must be 0")
    }
  }

  test("TVP through the harness with adaptive deletion: grid shape + invariants") {
    val grid = Experiments.robustnessGrid(emb,
      schemes = Seq(Experiments.SchemeTvp), attacks = Seq("adaptive_delete"),
      ps = Seq(0.0, 0.6), reps = 2, wm = "10110", strength = 0.7, th = 1.0,
      d = 64, wmKey = wmKey, scpwKey = scpwKey).collect()
    assert(grid.length == 4)
    val atZero = grid.filter(_.getDouble(2) == 0.0)
    assert(atZero.forall(_.getDouble(4) == 0.0), s"BER at p=0: ${atZero.mkString(",")}")
    // reps re-roll the attack draw, so the two rows may differ — both must
    // still be valid BERs
    assert(grid.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("H3 impact sweep: shape and sane magnitudes") {
    val sweep = Experiments.impactSweep(emb, ths = Seq(0.5, 1.0), wm = "10101",
      strength = 0.7, k = 10, d = 64, wmKey = wmKey).collect()
    assert(sweep.length == 2)
    sweep.foreach { r =>
      assert(r.getLong(1) > 0, "carriers selected")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 10, s"avg_miss ${r.getDouble(2)}")
      assert(r.getDouble(4) > 0, "carriers receive query traffic")
    }
  }

  test("swept carrier selection matches per-th carriersAi row-for-row") {
    import org.apache.spark.sql.functions.col
    val classified = Tvp.classify(emb, 64, 5, wmKey).cache()
    val bits       = Tvp.bitsDf(spark, "10101")
    val ths        = Seq(0.3, 0.5, 1.0)
    val swept      = Tvp.carriersAiSwept(classified, bits, 0.6, ths, aiDf).cache()
    for (th <- ths) {
      val single = Tvp.carriersAi(classified, bits, 0.6, th, aiDf)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val batch = swept.filter(col("th") === th)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(batch == single, s"th=$th: swept ${batch.size} vs single ${single.size}")
    }
  }

  test("batched berGrid matches the per-cell extract path cell-for-cell") {
    import graft.attacks.Attacks
    val wm      = "10110"
    val attacks = Seq("random_delete", "adaptive_delete", "random_modify",
      "adaptive_modify", "insert")
    val ps      = Seq(0.0, 0.4, 0.7)
    for (scheme <- Seq(Experiments.SchemeRs, Experiments.SchemeScpw)) {
      val wmDf = Experiments.embedFor(emb, scheme, wm, strength = 0.7,
        th = 0.5, d = 64, wmKey = wmKey, scpwKey = scpwKey, ai = Some(aiDf)).cache()
      val batched = Experiments.berGrid(wmDf, scheme, rep = 1, attacks, ps, wm,
        d = 64, wmKey = wmKey, scpwKey = scpwKey, ai = Some(aiDf))
        .map { case (a, p, ber) => (a, p) -> ber }.toMap
      for (attack <- attacks; p <- ps) {
        val attacked = Experiments.attackFor(wmDf, attack, p, s"${wmKey.seed}-r1", 64, Some(aiDf))
        val single = Tvp.ber(Tvp.bitsDf(spark, wm),
          Experiments.extractFor(attacked, scheme, wm.length, 64, wmKey, scpwKey))
        assert(batched((attack, p)) == single,
          s"$scheme/$attack/p=$p: batched ${batched((attack, p))} vs single $single")
      }
      wmDf.unpersist()
    }
  }

  test("randomDeleteRepCurve matches robustnessGrid cell-for-cell") {
    // the one-plan suffix-sum curve must be row-identical to the generic
    // per-rep grid path (same embed, same keyed rankings, same votes)
    val ps = Seq(0.1, 0.4, 0.7)
    for (scheme <- Seq(Experiments.SchemeTvp, Experiments.SchemeRs)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("p", "rep", "ber").collect()
          .map(r => (r.getDouble(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val fused = rows(Experiments.randomDeleteRepCurve(emb, scheme, ps,
        reps = 3, wm = "10110", strength = 0.7, th = 1.0, d = 64,
        wmKey = wmKey, scpwKey = scpwKey, sharedAi = Some(aiDf)))
      val generic = rows(Experiments.robustnessGrid(emb, Seq(scheme),
        Seq("random_delete"), ps, reps = 3, wm = "10110", strength = 0.7,
        th = 1.0, d = 64, wmKey = wmKey, scpwKey = scpwKey,
        sharedAi = Some(aiDf)))
      assert(fused.keySet == generic.keySet, s"$scheme cell sets differ")
      for (k <- generic.keySet)
        assert(fused(k) == generic(k), s"$scheme cell $k: ${fused(k)} vs ${generic(k)}")
    }
  }

  test("P16 mean distortion: zero for identity, small positive after embed") {
    assert(Metrics.meanDistortion(emb, emb) == 0.0)
    val wmDf = Tvp.embedRs(emb, "10101", 0.6, 64, wmKey)
    val d    = Metrics.meanDistortion(emb, wmDf)
    // LSB embedding touches low-order fraction bits of one dim per carrier
    assert(d > 0.0 && d < 0.1, s"distortion $d")
  }
}
