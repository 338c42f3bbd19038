package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for GraftCache.stage — the r19 lazy per-round checkpoint the
  * iterative operators (beam search, CC stars, BFS, NN-descent, pipeline
  * stages) now run on:
  *   1. the logical plan truncates at the stage() call exactly like the
  *      old eager localCheckpoint (the consumer plans against a
  *      LogicalRDD leaf — the reason the checkpoints exist);
  *   2. no job runs at the call (materialization is deferred to the
  *      consuming action — the whole point of the change);
  *   3. rows are identical to the eager form;
  *   4. clear() drains the retained pins (no cross-pass accumulation).
  */
class StageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stage truncates the logical plan to a LogicalRDD leaf") {
    import spark.implicits._
    val df = (1 to 100).toDF("x").groupBy(($"x" % 7).as("k")).agg(sum("x").as("s"))
    val staged = GraftCache.stage(df)
    assert(staged.queryExecution.logical.isInstanceOf[LogicalRDD],
      s"expected a LogicalRDD leaf, got:\n${staged.queryExecution.logical}")
  }

  test("stage defers the result stage; the consuming action materializes") {
    import spark.implicits._
    StageSpecCounter.ran.set(0)
    val ran = StageSpecCounter.ran // module-static: task closures resolve the
    val bump = udf { (x: Int) => StageSpecCounter.ran.incrementAndGet(); x }
    // the UDF sits ABOVE the exchange: AQE still materializes shuffle map
    // stages at the stage() call (toRdd), but the RESULT stage — where the
    // old eager checkpoint paid its dedicated job — is what defers
    val staged = GraftCache.stage(
      (1 to 10).toDF("x").repartition(2).select(bump($"x").as("x")))
    assert(ran.get() == 0, "stage() must not run the result stage at the call")
    assert(staged.count() == 10L)
    assert(ran.get() >= 10, "the consuming action materializes the rounds")
  }

  test("staged rounds equal the eager-checkpoint rounds row-for-row") {
    import spark.implicits._
    def rounds(stagefn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      var cur = (1L to 50L).toDF("v")
      (1 to 3).foreach { _ =>
        cur = stagefn(cur.withColumn("v", $"v" * 2 + 1).filter($"v" % 3 =!= 0))
      }
      cur.orderBy("v").collect().map(_.getLong(0)).toSeq
    }
    assert(rounds(GraftCache.stage) == rounds(_.localCheckpoint()))
  }

  test("clear() drains the retained pins") {
    import spark.implicits._
    val before = GraftCache.retainedCount
    GraftCache.stage((1 to 5).toDF("x")).count()
    assert(GraftCache.retainedCount > before)
    GraftCache.clear()
    assert(GraftCache.retainedCount == 0)
  }
}

/** JVM-static counter: local-mode tasks deserialize closures, so an
  * AtomicInteger captured by value would count in a copy; a module field
  * resolves to this singleton in the shared JVM.
  */
object StageSpecCounter {
  val ran = new java.util.concurrent.atomic.AtomicInteger(0)
}
