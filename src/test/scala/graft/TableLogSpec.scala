package graft

import graft.sources.TableLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest log's contracts: version history is immutable and
  * reproducible (time travel), a resolved reader never sees a later commit
  * (snapshot isolation — the property the raw-parquet upsert lacks), and
  * racing optimistic commits serialize with no lost update.
  */
class TableLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpTable() = java.nio.file.Files
    .createTempDirectory("graft_tablelog").toFile.getAbsolutePath

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.toDF("id")
  }

  test("overwrite/append build a versioned history; every version stays readable") {
    val t = tmpTable()
    assert(TableLog.overwrite(df(1, 2), t) == 1)
    assert(TableLog.append(df(3), t) == 2)
    assert(TableLog.overwrite(df(9), t) == 3)
    def ids(v: Int) = TableLog.read(spark, t, Some(v))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) == Seq(1L, 2L), "v1 drifted")
    assert(ids(2) == Seq(1L, 2L, 3L), "v2 (append) drifted")
    assert(ids(3) == Seq(9L), "v3 (overwrite) must hold only the new data")
    assert(TableLog.headVersion(t) == 3)
    assert(TableLog.read(spark, t).collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("snapshot isolation: a resolved reader is immune to later commits") {
    val t = tmpTable()
    TableLog.overwrite(df(1, 2), t)
    val pinned = TableLog.read(spark, t) // resolves the v1 manifest NOW
    TableLog.overwrite(df(99), t)        // v2 lands mid-"query"
    assert(pinned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "a commit changed what an already-resolved reader sees — snapshot " +
        "isolation broke (this is exactly the raw-overwrite hazard)")
    assert(TableLog.read(spark, t).collect().map(_.getLong(0)).toSeq == Seq(99L))
  }

  test("racing appenders serialize optimistically with no lost update") {
    val t = tmpTable()
    TableLog.overwrite(df(0), t)
    val threads = (1 to 8).map { i =>
      new Thread(() => { TableLog.append(df(i * 100L), t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(TableLog.headVersion(t) == 9,
      "8 racing appends over v1 must serialize to exactly v9")
    val got = TableLog.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (Seq(0L) ++ (1 to 8).map(_ * 100L)),
      s"an append was lost or duplicated: $got")
  }

  test("compact + vacuum: retention reclaims exactly the unreferenced history") {
    val t = tmpTable()
    TableLog.overwrite(df(1, 2), t) // v1 -> c1
    TableLog.overwrite(df(3), t)    // v2 -> c2 (c1 now unreferenced by v2+)
    TableLog.append(df(4), t)       // v3 -> c2 + c3
    val pinned = TableLog.read(spark, t, Some(3))
    val reclaimed = TableLog.vacuum(t, keepFromVersion = 2)
    assert(reclaimed == 1, s"exactly v1's data dir should go, got $reclaimed")
    // retained versions and already-resolved readers are untouched
    assert(TableLog.read(spark, t, Some(2)).collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(pinned.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // vacuumed history fails loudly, not silently-empty
    val e = intercept[IllegalArgumentException] { TableLog.read(spark, t, Some(1)) }
    assert(e.getMessage.contains("no committed version 1"))
    // compact rewrites the head row-identically as a fresh version
    val v = TableLog.compact(spark, t)
    assert(v == 4)
    assert(TableLog.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(TableLog.manifest(t, v).size == 1, "compaction must leave one data dir")
  }

  test("orphaned data from lost races stays invisible") {
    val t = tmpTable()
    TableLog.overwrite(df(1), t)
    TableLog.append(df(2), t)
    val live = TableLog.manifest(t, TableLog.headVersion(t)).toSet
    val onDisk = new java.io.File(t, "data").listFiles().map("data/" + _.getName).toSet
    assert(live.subsetOf(onDisk), "manifest references a missing data dir")
    // any orphan (onDisk -- live) is legal and must simply not be read
    val n = TableLog.read(spark, t).count()
    assert(n == 2, s"reader saw $n rows — an orphan leaked into the scan?")
  }
}
