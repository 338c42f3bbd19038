package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The foreachBatch MERGE's hazards, driven batch by batch with CONFLICTING
  * keys (the fixture replay's duplicates are identical, so the update path
  * needs its own gate): a later batch must update keys it shares with the
  * table, preserve the rest of a shared day, insert new days, and leave
  * untouched days' FILES alone (dynamic overwrite, not truncate-and-write).
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def row(id: Long, ts: Long, day: String, t: String, us: Long) =
    (id, ts, java.sql.Date.valueOf(day), t, us)

  private def df(rows: Seq[(Long, Long, java.sql.Date, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_ns", "day", "event_type", "us")
  }

  test("update, preserve, insert, and file-identity across three batches") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec").toFile.getAbsolutePath
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val up = StreamOps.upsertBatch(target) _
      up(df(Seq(
        row(1, 100, "2024-01-01", "click", 10),
        row(2, 110, "2024-01-01", "view", 20),
        row(3, 120, "2024-01-02", "click", 30))), 0)
      // batch 2: UPDATE key 1 (later ts, new value), INSERT key 4 same day,
      // key 2 untouched but in a touched day, day 2024-01-02 untouched
      val day2Files = new java.io.File(s"$target/day=2024-01-02")
        .listFiles().map(f => (f.getName, f.lastModified())).toSet
      up(df(Seq(
        row(1, 200, "2024-01-01", "click", 99),
        row(4, 130, "2024-01-01", "view", 40))), 1)
      // batch 3: new day only
      up(df(Seq(row(5, 140, "2024-01-03", "error", 50))), 2)

      val got = spark.read.option("basePath", target).parquet(target)
        .select("event_id", "ts_ns", "us").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, 200L, 99L), (2L, 110L, 20L), (3L, 120L, 30L),
        (4L, 130L, 40L), (5L, 140L, 50L)),
        s"merge semantics broke: $got")
      // dynamic overwrite: the untouched day's files were never rewritten
      val day2After = new java.io.File(s"$target/day=2024-01-02")
        .listFiles().map(f => (f.getName, f.lastModified())).toSet
      assert(day2After == day2Files,
        "an untouched day partition was rewritten — static-overwrite semantics leaked in")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("log-backed merge: same final state, no conf, and the history stays readable") {
    import graft.sources.TableLog
    val table = java.nio.file.Files
      .createTempDirectory("graft_upsert_log_spec").toFile.getAbsolutePath
    val up = StreamOps.upsertBatchLog(table) _
    up(df(Seq(
      row(1, 100, "2024-01-01", "click", 10),
      row(2, 110, "2024-01-01", "view", 20),
      row(3, 120, "2024-01-02", "click", 30))), 0)
    up(df(Seq(
      row(1, 200, "2024-01-01", "click", 99),
      row(4, 130, "2024-01-01", "view", 40))), 1)
    up(df(Seq(row(5, 140, "2024-01-03", "error", 50))), 2)

    val got = TableLog.read(spark, table)
      .select("event_id", "ts_ns", "us").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 200L, 99L), (2L, 110L, 20L), (3L, 120L, 30L),
      (4L, 130L, 40L), (5L, 140L, 50L)), s"log merge semantics broke: $got")
    // every micro-batch's commit is a retained version: v1 is the
    // PRE-UPDATE state (event 1 still at us=10, events 4/5 absent)
    assert(TableLog.headVersion(table) == 3)
    val v1 = TableLog.read(spark, table, Some(1))
      .select("event_id", "us").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v1 == Seq((1L, 10L), (2L, 20L), (3L, 30L)),
      s"the upsert's history drifted — v1 must be the pre-update state: $v1")
    val v2 = TableLog.read(spark, table, Some(2))
      .select("event_id", "us").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(v2 == Seq((1L, 99L), (2L, 20L), (3L, 30L), (4L, 40L)),
      s"v2 must show the update applied but day 3 absent: $v2")
  }

  private def cdc(rows: Seq[(String, Long, Long, java.sql.Date, String, Long)]) = {
    import spark.implicits._
    rows.toDF("op", "event_id", "ts_ns", "day", "event_type", "us")
  }
  private def u(id: Long, ts: Long, day: String, t: String, us: Long) =
    ("U", id, ts, java.sql.Date.valueOf(day), t, us)
  private def d(id: Long, day: String) =
    ("D", id, 0L, java.sql.Date.valueOf(day), "", 0L)

  test("CDC raw path: delete beats same-batch upsert, later reinsert wins, emptied day dies") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_cdc_raw_spec").toFile.getAbsolutePath
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val up = StreamOps.upsertBatchCdc(target) _
      up(cdc(Seq(
        u(1, 100, "2024-01-01", "click", 10),
        u(2, 110, "2024-01-01", "view", 20),
        u(3, 120, "2024-01-02", "click", 30))), 0)
      // batch 2: tombstone key 1 AND upsert it in the same batch — the
      // tombstone wins; also update key 2
      up(cdc(Seq(
        u(1, 200, "2024-01-01", "click", 99),
        d(1, "2024-01-01"),
        u(2, 210, "2024-01-01", "view", 21))), 1)
      val afterDel = spark.read.option("basePath", target).parquet(target)
        .select("event_id", "us").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(afterDel == Seq((2L, 21L), (3L, 30L)),
        s"same-batch tombstone must beat the upsert: $afterDel")
      // batch 3: REINSERT key 1 — a delete is not a tombstone forever
      up(cdc(Seq(u(1, 300, "2024-01-01", "click", 55))), 2)
      val afterRe = spark.read.option("basePath", target).parquet(target)
        .select("event_id", "us").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(afterRe == Seq((1L, 55L), (2L, 21L), (3L, 30L)),
        s"delete-then-reinsert broke: $afterRe")
      // batch 4: tombstone day 2's ONLY row — dynamic overwrite writes
      // nothing for the day, so the path must delete the stale partition
      // directory explicitly (the raw path's out-of-band mutation)
      up(cdc(Seq(d(3, "2024-01-02"))), 3)
      assert(!new java.io.File(s"$target/day=2024-01-02").exists(),
        "an emptied day's partition directory survived the tombstone batch")
      val fin = spark.read.option("basePath", target).parquet(target)
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(fin == Seq(1L, 2L), s"final CDC state drifted: $fin")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("CDC log path: same semantics, the delete IS a version, emptied day is a dropped entry") {
    import graft.sources.TableLog
    val table = java.nio.file.Files
      .createTempDirectory("graft_cdc_log_spec").toFile.getAbsolutePath
    val up = StreamOps.upsertBatchLogCdc(table) _
    up(cdc(Seq(
      u(1, 100, "2024-01-01", "click", 10),
      u(2, 110, "2024-01-01", "view", 20),
      u(3, 120, "2024-01-02", "click", 30))), 0)
    up(cdc(Seq(
      u(1, 200, "2024-01-01", "click", 99),
      d(1, "2024-01-01"),
      u(2, 210, "2024-01-01", "view", 21))), 1)
    up(cdc(Seq(u(1, 300, "2024-01-01", "click", 55))), 2)
    up(cdc(Seq(d(3, "2024-01-02"))), 3)
    val fin = TableLog.read(spark, table)
      .select("event_id", "us").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fin == Seq((1L, 55L), (2L, 21L)), s"log CDC final state drifted: $fin")
    // the emptied day left no manifest entry (not an empty dir read)
    assert(TableLog.pruneDirs(table, _ == "2024-01-02").isEmpty,
      "the fully-tombstoned day must vanish from the head manifest")
    // every batch — including the pure-tombstone ones — is a VERSION:
    // v2 shows key 1 deleted, v3 shows it reinserted, v4 shows day 2 gone
    assert(TableLog.headVersion(table) == 4)
    def ids(v: Int) = TableLog.read(spark, table, Some(v))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) == Seq(1L, 2L, 3L))
    assert(ids(2) == Seq(2L, 3L), "v2 must record the delete")
    assert(ids(3) == Seq(1L, 2L, 3L), "v3 must record the reinsert")
    assert(ids(4) == Seq(1L, 2L), "v4 must record the emptied day")
    // and the change feed across the delete version shows it row-level
    import spark.implicits._
    val feed = TableLog.changeFeed(spark, table, 1, 2)
      .select("_change_type", "event_id").as[(String, Long)]
      .collect().sorted.toSeq
    assert(feed == Seq(("delete", 1L), ("delete", 2L), ("insert", 2L)),
      s"feed across the tombstone version drifted: $feed")
  }

  test("upsertBatch refuses to run outside the dynamic-overwrite scope") {
    val target = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec2").toFile.getAbsolutePath
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    try {
      val e = intercept[IllegalArgumentException] {
        StreamOps.upsertBatch(target)(
          df(Seq(row(1, 100, "2024-01-01", "click", 10))), 0)
      }
      assert(e.getMessage.contains("dynamic"))
    } finally prev.foreach(v =>
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
  }
}
