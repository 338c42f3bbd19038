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

  test("racing appenders stay lossless through the rename publisher (object-store seam)") {
    // the portable non-hardlink publish path: Files.move without
    // replace-existing — the local stand-in for an object store's
    // conditional put (S3 If-None-Match: *). Same contention contract:
    // 8 racers, 8 surviving commits, EEXIST-only retries.
    System.setProperty("graft.tablelog.publish", "rename")
    try {
      val t = tmpTable()
      TableLog.overwrite(df(0), t)
      val threads = (1 to 8).map { i =>
        new Thread(() => { TableLog.append(df(i * 100L), t); () })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(TableLog.headVersion(t) == 9,
        "8 racing appends over v1 must serialize to exactly v9 (rename path)")
      val got = TableLog.read(spark, t).collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (Seq(0L) ++ (1 to 8).map(_ * 100L)),
        s"an append was lost or duplicated through the rename publisher: $got")
    } finally System.clearProperty("graft.tablelog.publish")
  }

  test("per-dir column stats: commits record min/max; range pruning skips provably-empty dirs") {
    import spark.implicits._
    val t = tmpTable()
    // three day-partitions with disjoint value ranges, stats on v
    TableLog.overwritePartitions(
      Seq((10L, "d1"), (19L, "d1"), (20L, "d2"), (29L, "d2"), (30L, "d3"))
        .toDF("v", "day"),
      t, "day", statsCols = Seq("v"))
    val entries = TableLog.manifest(t, 1)
    val byTag = entries.map(e => e.split("\\|")(1) -> TableLog.entryStats(e)).toMap
    assert(byTag("d1")("v") == (10L, 19L) && byTag("d2")("v") == (20L, 29L) &&
      byTag("d3")("v") == (30L, 30L), s"stats drifted: $byTag")
    // a range inside d2 prunes to one dir; reading it returns d2's rows
    val pruned = TableLog.pruneDirsRange(t, "v", 21L, 28L)
    assert(pruned.size == 1, s"range [21,28] must resolve ONE dir: $pruned")
    val rows = TableLog.readWhereRange(spark, t, "v", 21L, 28L)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows == Seq(20L, 29L),
      s"kept dir must surface ALL its rows (row filter is the caller's): $rows")
    // boundary overlap keeps both adjacent dirs
    assert(TableLog.pruneDirsRange(t, "v", 19L, 20L).size == 2)
    // a stats-less append is always kept (conservative), never wrong
    TableLog.append(Seq((1000L, "dX")).toDF("v", "day"), t)
    assert(TableLog.pruneDirsRange(t, "v", 21L, 28L).size == 2,
      "an entry without stats for the column must survive every range predicate")
    // an unknown stats column keeps everything
    assert(TableLog.pruneDirsRange(t, "nope", 0L, 1L).size == 4)
    // date columns long-encode as epoch days
    val t2 = tmpTable()
    TableLog.overwrite(
      Seq(("2024-01-05", 1L)).toDF("d0", "v")
        .select(col("d0").cast("date").as("d"), col("v")),
      t2, statsCols = Seq("d", "v"))
    val st = TableLog.entryStats(TableLog.manifest(t2, 1).head)
    val epochDay = java.time.LocalDate.parse("2024-01-05").toEpochDay
    assert(st("d") == (epochDay, epochDay) && st("v") == (1L, 1L), s"$st")
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

  test("headVersion survives the five-digit rollover (v100000 is found)") {
    val t = tmpTable()
    TableLog.overwrite(df(1), t)
    // simulate a table whose history crossed 99999: the %05d rendering
    // naturally widens to six digits, so resolution must match v(\d+), not
    // exactly five digits — a 5-digit-only match would pin the head at
    // 99999 and every subsequent commit would retry the same taken version
    val body = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_log", "v00001.json"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_log", "v100000.json"), body)
    // the manufactured jump (v2..v99999 absent) is impossible under the
    // commit protocol — drop the hint so the LISTING path (whose regex is
    // this test's subject) resolves the head
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(t, "_log", "_head.hint"))
    assert(TableLog.headVersion(t) == 100000,
      "six-digit manifest invisible — head stuck below the rollover")
    assert(TableLog.read(spark, t, Some(100000)).count() == 1)
    assert(TableLog.append(df(2), t) == 100001, "commit past the rollover")
  }

  test("checkpoint hints: head/oldest lookup at a 1000-commit log is O(1) — no _log listing") {
    val t = tmpTable()
    TableLog.overwrite(df(1), t) // v1 (real commit — writes the head hint)
    // manufacture the other 999 versions the way the protocol would lay
    // them out (gap-free, each manifest complete); 1000 real Spark commits
    // would test the same resolution path at 100× the wall-clock
    val body = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_log", "v00001.json"))
    (2 to 1000).foreach { v =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(t, "_log", f"v$v%05d.json"), body)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "_log", "_head.hint"),
      "1000".getBytes("UTF-8"))
    val scans0 = TableLog.listingScansFor(t)
    assert(TableLog.headVersion(t) == 1000)
    assert(TableLog.oldestVersion(t) == 1)
    assert(TableLog.listingScansFor(t) == scans0,
      "a fresh hint must resolve head AND oldest without listing _log")
    // a stale hint (writer crashed before the hint write, or another
    // writer committed since) probes FORWARD — still no listing
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "_log", "_head.hint"),
      "997".getBytes("UTF-8"))
    assert(TableLog.headVersion(t) == 1000 &&
      TableLog.listingScansFor(t) == scans0,
      "a stale hint must probe forward to the true head without listing")
    // every degraded hint state falls back to the listing, never to a
    // wrong answer: corrupt content, then a missing file
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "_log", "_head.hint"),
      "not-a-version".getBytes("UTF-8"))
    assert(TableLog.headVersion(t) == 1000, "corrupt hint broke resolution")
    java.nio.file.Files.delete(java.nio.file.Paths.get(t, "_log", "_head.hint"))
    assert(TableLog.headVersion(t) == 1000, "missing hint broke resolution")
    assert(TableLog.listingScansFor(t) > scans0,
      "the degraded states must have taken the listing fallback")
    // a real commit on top restores the O(1) path
    assert(TableLog.append(df(2), t) == 1001)
    val scans1 = TableLog.listingScansFor(t)
    assert(TableLog.headVersion(t) == 1001 &&
      TableLog.listingScansFor(t) == scans1,
      "the commit's own hint write must restore listing-free resolution")
  }

  test("checkpoint hints: vacuum records the oldest version; stale/corrupt oldest hints stay correct") {
    val t = tmpTable()
    TableLog.overwrite(df(1), t)              // v1
    (2 to 6).foreach(i => TableLog.append(df(i.toLong), t)) // v2..v6
    TableLog.vacuum(t, keepFromVersion = 4)
    val scans0 = TableLog.listingScansFor(t)
    assert(TableLog.oldestVersion(t) == 4)
    assert(TableLog.listingScansFor(t) == scans0,
      "vacuum's oldest hint must resolve without listing _log")
    // a SECOND vacuum moves the floor; suppress its hint write by
    // restoring the stale one — the verify (predecessor must be absent)
    // rejects it and the listing answers correctly
    TableLog.vacuum(t, keepFromVersion = 6)
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "_log", "_oldest.hint"),
      "4".getBytes("UTF-8"))
    assert(TableLog.oldestVersion(t) == 6,
      "a stale oldest hint (its manifest vacuumed) must fall back, not lie")
    java.nio.file.Files.write(java.nio.file.Paths.get(t, "_log", "_oldest.hint"),
      "garbage".getBytes("UTF-8"))
    assert(TableLog.oldestVersion(t) == 6, "corrupt oldest hint broke resolution")
  }

  test("readWhere prunes at the manifest: fewer dirs resolved, same rows as a filter") {
    import spark.implicits._
    val t = tmpTable()
    val d = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "day")
    TableLog.overwritePartitions(d, t, "day")
    val all = TableLog.manifest(t, TableLog.headVersion(t))
    assert(all.size == 3, s"expected one tagged entry per day: $all")
    val pruned = TableLog.pruneDirs(t, _ == "2024-01-02")
    assert(pruned.size == 1,
      s"a day-equality predicate must resolve ONE directory, got $pruned")
    val rows = TableLog.readWhere(spark, t, _ == "2024-01-02")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(2L), s"pruned read returned $rows")
    // untagged entries carry no partition semantics — a tag predicate must
    // keep them (conservative, never wrong), not silently drop their rows
    TableLog.append(df(99), t)
    val withUntagged = TableLog.pruneDirs(t, _ == "2024-01-02")
    assert(withUntagged.size == 2,
      "the untagged append must survive every tag predicate")
  }

  test("changeFeed nets row-level inserts/deletes; compaction diffs empty") {
    import spark.implicits._
    val t = tmpTable()
    val v1 = TableLog.overwritePartitions(
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day"), t, "day")
    // replace d2 (2 -> 20) and add d3: the feed must show exactly that
    val v2 = TableLog.overwritePartitions(
      Seq((20L, "d2"), (3L, "d3")).toDF("id", "day"), t, "day")
    val feed = TableLog.changeFeed(spark, t, v1, v2)
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(feed == Seq(("delete", 2L), ("insert", 3L), ("insert", 20L)),
      s"wrong net change set: $feed")
    // d1 was untouched: its dir is in both manifests, so the feed never
    // even reads it — and a pure compaction (same content, new layout)
    // must diff EMPTY, not as a spurious full-table rewrite
    val v3 = TableLog.compact(spark, t)
    assert(TableLog.changeFeed(spark, t, v2, v3).count() == 0,
      "content-identical compaction produced a non-empty change feed")
    // and across the compaction boundary the net diff is still v1->v2's
    val across = TableLog.changeFeed(spark, t, v1, v3)
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(across == feed, s"diff across a compaction drifted: $across")
    // IVM contract: old state + feed == new state, as MULTISETS — the feed
    // is sufficient to maintain any derived table without re-reading the
    // unchanged partitions (q_events_changefeed_apply is the query form)
    val f = TableLog.changeFeed(spark, t, v1, v2)
    val applied = TableLog.read(spark, t, Some(v1))
      .unionByName(f.filter(col("_change_type") === "insert").drop("_change_type"))
      .exceptAll(f.filter(col("_change_type") === "delete").drop("_change_type"))
    val direct = TableLog.read(spark, t, Some(v2))
    assert(applied.exceptAll(direct).isEmpty && direct.exceptAll(applied).isEmpty,
      "base ∪ inserts − deletes must equal the direct read of the target version")
  }

  test("changeFeed survives a pure-drop commit (empty add-set, empty manifest)") {
    import spark.implicits._
    val t = tmpTable()
    val v1 = TableLog.overwritePartitions(
      Seq((1L, "d1"), (2L, "d1")).toDF("id", "day"), t, "day")
    // tombstone the table's only partition: zero-row source + alsoReplace —
    // the commit writes NO data dir and the new manifest is EMPTY (the
    // r15 fallback read(vB).limit(0) threw on exactly this shape)
    val v2 = TableLog.overwritePartitions(
      Seq.empty[(Long, String)].toDF("id", "day"), t, "day",
      alsoReplace = Set("d1"))
    assert(TableLog.manifest(t, v2).isEmpty, "pure drop must empty the manifest")
    val feed = TableLog.changeFeed(spark, t, v1, v2)
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(feed == Seq(("delete", 1L), ("delete", 2L)),
      s"pure-drop feed must be all deletes: $feed")
    // and the reverse direction (resurrection from empty) is all inserts
    val back = TableLog.changeFeed(spark, t, v2, v1)
      .select("_change_type", "id").as[(String, Long)].collect().sorted.toSeq
    assert(back == Seq(("insert", 1L), ("insert", 2L)), s"reverse feed: $back")
  }

  test("vacuum honors the grace window: young unreferenced dirs survive") {
    val t = tmpTable()
    TableLog.overwrite(df(1), t)
    TableLog.overwrite(df(2), t) // v1's dir now unreferenced by keepFrom=2
    assert(TableLog.vacuum(t, keepFromVersion = 2, graceMs = 3600L * 1000) == 0,
      "a dir younger than the grace window was reclaimed — a racing " +
        "writer's in-flight attempt would die exactly like this")
    assert(TableLog.vacuum(t, keepFromVersion = 2) == 1,
      "past the window (grace 0 = maintenance mode) it must be reclaimed")
  }

  test("partition values containing manifest delimiters are rejected loudly") {
    import spark.implicits._
    val t = tmpTable()
    val e = intercept[IllegalArgumentException] {
      TableLog.overwritePartitions(
        Seq((1L, "a|b")).toDF("id", "day"), t, "day")
    }
    assert(e.getMessage.contains("manifest delimiter"))
    val e2 = intercept[IllegalArgumentException] {
      TableLog.overwritePartitions(
        Seq((1L, "a\"b")).toDF("id", "day"), t, "day")
    }
    assert(e2.getMessage.contains("manifest delimiter"))
    // a NULL partition value is legal and round-trips as the Hive default
    // tag, consistently replace-able
    val d = Seq((1L, Option.empty[String]), (2L, Some("d1"))).toDF("id", "day")
    TableLog.overwritePartitions(d, t, "day")
    val d2 = Seq((10L, Option.empty[String])).toDF("id", "day")
    TableLog.overwritePartitions(d2, t, "day")
    val got = TableLog.read(spark, t).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 10L),
      s"null-partition replace-where must swap the null partition only: $got")
  }

  test("schema evolution: a later add-column commit reads back with NULL backfill, old versions keep their shape") {
    import spark.implicits._
    val t = tmpTable()
    TableLog.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    TableLog.append(Seq((3L, "c", 30L)).toDF("id", "name", "score"), t)
    // head: union schema, newest column order wins, old rows null-backfilled
    val head = TableLog.read(spark, t)
    assert(head.columns.toSeq == Seq("id", "name", "score"))
    val rows = head.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
    // time travel: v1 keeps its committed two-column shape
    assert(TableLog.read(spark, t, Some(1)).columns.toSeq == Seq("id", "name"))
    // change feed across the boundary: only the added row, aligned to the
    // union schema
    val feed = TableLog.changeFeed(spark, t, 1, 2).collect()
    assert(feed.length == 1 && feed.head.getLong(0) == 3L &&
      feed.head.getString(3) == "insert")
    // compact lands one directory carrying the union schema; rows unchanged
    TableLog.compact(spark, t)
    val compacted = TableLog.read(spark, t)
    assert(compacted.columns.toSeq == Seq("id", "name", "score"))
    assert(compacted.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq == rows)
    // and a post-compaction feed is EMPTY: null-backfill is not a change
    assert(TableLog.changeFeed(spark, t, 2, 3).count() == 0,
      "compaction across an evolution boundary must diff empty")
  }

  test("overwriteClustered: curve buckets give multi-dimensional manifest skipping") {
    import spark.implicits._
    // one row per cell of a 32×32 grid — every cell occupied, so dir
    // counts below are exact, not probabilistic
    val g = spark.range(1024)
      .select(expr("id % 32").as("x"), expr("id div 32").as("y"))
    val t = tmpTable()
    TableLog.overwrite(g, t)
    val curve = graft.functions.ZOrder.hilbert2(col("x"), col("y"), bits = 5)
    TableLog.overwriteClustered(TableLog.read(spark, t, Some(1)), t,
      shiftright(curve, 6), statsCols = Seq("x", "y"))
    // row-identical (clustering only moves rows), data schema unchanged
    val back = TableLog.read(spark, t)
    assert(back.columns.toSeq == Seq("x", "y"), "bucket column leaked into data")
    assert(back.count() == 1024 && back.exceptAll(g).count() == 0)
    // 16 dirs — the top-4-bit Hilbert cells, each an 8×8 quadrant
    assert(TableLog.manifest(t, 2).size == 16)
    // a 1-D slice prunes to its quadrant row/column: 4 of 16; the
    // conjunctive box multiplies: exactly ONE dir (64 rows = one cell)
    assert(TableLog.pruneDirsRange(t, "x", 0, 7).size == 4)
    assert(TableLog.pruneDirsRange(t, "y", 0, 7).size == 4)
    val box = TableLog.readWhereRanges(spark, t, Seq(("x", 0L, 7L), ("y", 0L, 7L)))
    assert(box.count() == 64, "box predicate must resolve exactly one 8×8 cell")
    // and the unclustered v1 can't skip at all: one dir holds everything
    assert(TableLog.pruneDirsRange(t, "x", 0, 7, Some(1)).size == 1)
  }

  test("restore: a historical state becomes the head without copying; history and retention hold") {
    val t = tmpTable()
    TableLog.overwrite(df(1, 2), t)        // v1
    TableLog.overwrite(df(9), t)           // v2 — the "mistake"
    val v3 = TableLog.restore(t, 1)        // undo
    assert(v3 == 3)
    def ids(v: Int) = TableLog.read(spark, t, Some(v))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(3) == Seq(1L, 2L), "restored head must equal the restored version")
    assert(ids(2) == Seq(9L), "the pre-restore head must stay readable")
    // zero copy: v3 references exactly v1's data dirs
    assert(TableLog.manifest(t, 3) == TableLog.manifest(t, 1))
    // retention: vacuuming everything below the restore keeps the restored
    // head's dirs (they are referenced by a RETAINED manifest)
    TableLog.vacuum(t, keepFromVersion = 3)
    assert(ids(3) == Seq(1L, 2L), "vacuum reclaimed dirs the restored head references")
    intercept[IllegalArgumentException](TableLog.read(spark, t, Some(2)))
  }

  test("overwritePartitions write-write conflicts: same-partition loser fails loudly, disjoint writers both commit") {
    import spark.implicits._
    val t = tmpTable()
    def part(day: String, xs: Long*) = xs.map(x => (day, x)).toDF("day", "x")
    def dayVals(day: String) = TableLog.read(spark, t)
      .filter(col("day") === day).select("x")
      .collect().map(_.getLong(0)).toSet
    TableLog.overwritePartitions(
      part("a", 1L, 2L).unionByName(part("b", 10L)), t, "day") // v1: days a, b
    // CONFLICT: a concurrent winner replaces day a inside this writer's
    // snapshot→publish window (the seam injects it deterministically —
    // a thread race hits this window only sometimes). The loser must fail
    // with a named conflict, never silently discard the winner's rows.
    var once = true
    TableLog.setInterleaveForTest(t, () => if (once) {
      once = false
      TableLog.overwritePartitions(part("a", 99L), t, "day") // the winner
    })
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        TableLog.overwritePartitions(part("a", 50L), t, "day")
      }
      assert(e.getMessage.contains("[a]"), s"conflict must name the partition: ${e.getMessage}")
    } finally TableLog.clearInterleaveForTest(t)
    assert(dayVals("a") == Set(99L),
      "the concurrent winner's day-a state must survive the failed loser")
    assert(dayVals("b") == Set(10L), "day b was never in play")
    // DISJOINT: the same interleave shape, but the concurrent winner
    // touches day b — both commits land, neither loses data.
    var once2 = true
    TableLog.setInterleaveForTest(t, () => if (once2) {
      once2 = false
      TableLog.overwritePartitions(part("b", 77L), t, "day")
    })
    try TableLog.overwritePartitions(part("a", 51L), t, "day")
    finally TableLog.clearInterleaveForTest(t)
    assert(dayVals("a") == Set(51L) && dayVals("b") == Set(77L),
      "disjoint partition-overwriters must both commit")
    // alsoReplace tags (replace-where with an empty source) conflict too
    var once3 = true
    TableLog.setInterleaveForTest(t, () => if (once3) {
      once3 = false
      TableLog.overwritePartitions(part("b", 78L), t, "day")
    })
    try {
      intercept[java.util.ConcurrentModificationException] {
        TableLog.overwritePartitions(part("a", 52L), t, "day",
          alsoReplace = Set("b"))
      }
      ()
    } finally TableLog.clearInterleaveForTest(t)
    assert(dayVals("b") == Set(78L),
      "the winner's day-b state must survive the alsoReplace loser")
  }

  test("selectivityBound: manifest-only row-count arithmetic; conservative without counts") {
    import spark.implicits._
    val t = tmpTable()
    val data = (1L to 80L).map(i => (i, i % 4)).toDF("id", "lbl") // 20 rows per label
    TableLog.overwritePartitions(data, t, "lbl", statsCols = Seq("lbl"))
    // label-aligned layout → the bound IS the true fraction
    assert(TableLog.selectivityBound(t, "lbl", 3, 3) == 0.25)
    assert(TableLog.selectivityBound(t, "lbl", 2, 3) == 0.5)
    assert(TableLog.selectivityBound(t, "lbl", 9, 9) == 0.0,
      "a range every directory provably misses must bound to zero")
    assert(TableLog.selectivityBound(t, "lbl", 0, 9) == 1.0)
    // a column with no committed stats keeps every directory — bound 1.0
    assert(TableLog.selectivityBound(t, "id", 1, 1) == 1.0)
    // counts ride statsCols: a table committed WITHOUT them degrades to
    // the conservative 1.0, never a wrong number
    val t2 = tmpTable()
    TableLog.overwritePartitions(data, t2, "lbl")
    assert(TableLog.selectivityBound(t2, "lbl", 3, 3) == 1.0)
    // append path records counts too (frameStats)
    val t3 = tmpTable()
    TableLog.append(data.filter(col("lbl") === 0), t3, statsCols = Seq("lbl"))
    TableLog.append(data.filter(col("lbl") =!= 0), t3, statsCols = Seq("lbl"))
    assert(TableLog.selectivityBound(t3, "lbl", 0, 0) == 0.25)
    // survivorBound: the numerator as an integer, multi-range (complement
    // predicates) — the beam-sizing form (GraphAnn.filteredBeam's input)
    assert(TableLog.survivorBound(t, "lbl", Seq((3L, 3L))) == Some(20L))
    assert(TableLog.survivorBound(t, "lbl",
      Seq((Long.MinValue, 2L), (4L, Long.MaxValue))) == Some(60L),
      "complement ranges must bound 'lbl != 3' exactly on the aligned layout")
    assert(TableLog.survivorBound(t, "lbl", Seq((9L, 9L))) == Some(0L))
    // a column without stats keeps every directory — upper bound = total
    assert(TableLog.survivorBound(t, "id", Seq((1L, 1L))) == Some(80L))
    // missing counts → None (never a fake count)
    assert(TableLog.survivorBound(t2, "lbl", Seq((3L, 3L))).isEmpty)
  }

  test("overwritePartitions baseVersion: a commit in the read→write gap fails the pinned transaction loudly; unpinned it is a silent lost update") {
    import spark.implicits._
    val t = tmpTable()
    def part(day: String, xs: Long*) = xs.map(x => (day, x)).toDF("day", "x")
    def dayVals(day: String) = TableLog.read(spark, t)
      .filter(col("day") === day).select("x")
      .collect().map(_.getLong(0)).toSet
    TableLog.overwritePartitions(part("a", 1L).unionByName(part("b", 10L)), t, "day") // v1
    // A read-modify-write transaction: "read" at v1 …
    val readV = TableLog.headVersion(t)
    // … then a concurrent commit lands in the read→write gap (this is the
    // window the first-attempt snapshot can never see — the write below is
    // this writer's FIRST attempt, so without the pin its snapshot is the
    // post-winner manifest and the check passes vacuously).
    TableLog.overwritePartitions(part("a", 99L), t, "day") // the winner
    // PINNED: the transaction validates against its READ version and fails
    // loudly naming the partition.
    val e = intercept[java.util.ConcurrentModificationException] {
      TableLog.overwritePartitions(part("a", 50L), t, "day",
        baseVersion = Some(readV))
    }
    assert(e.getMessage.contains("[a]"), s"conflict must name the partition: ${e.getMessage}")
    assert(dayVals("a") == Set(99L), "the winner's state must survive the failed transaction")
    // DISJOINT partitions don't conflict even across the gap.
    TableLog.overwritePartitions(part("b", 77L), t, "day", baseVersion = Some(readV))
    assert(dayVals("b") == Set(77L))
    // UNPINNED (old behavior, documented): the same shape silently
    // discards the winner — exactly the lost update baseVersion closes.
    TableLog.overwritePartitions(part("a", 88L), t, "day") // a new winner
    TableLog.overwritePartitions(part("a", 51L), t, "day") // unpinned RMW write
    assert(dayVals("a") == Set(51L), "unpinned blind overwrite wins by design")
    // baseVersion = 0 pins "read before any commit": any prior commit to a
    // replaced partition conflicts.
    val t2 = tmpTable()
    TableLog.overwritePartitions(part("a", 1L), t2, "day")
    intercept[java.util.ConcurrentModificationException] {
      TableLog.overwritePartitions(part("a", 2L), t2, "day", baseVersion = Some(0))
    }
    ()
  }

  test("compact with statsCols re-records manifest stats; without them pruning degrades conservatively") {
    import spark.implicits._
    val t = tmpTable()
    val data = (1L to 80L).map(i => (i, i % 4)).toDF("id", "lbl")
    TableLog.overwritePartitions(data, t, "lbl", statsCols = Seq("lbl"))
    assert(TableLog.selectivityBound(t, "lbl", 3, 3) == 0.25)
    // compact WITHOUT statsCols: row-identical, but the rewrite carries no
    // stats — the bound degrades to the conservative 1.0 (never wrong)
    TableLog.compact(spark, t)
    assert(TableLog.read(spark, t).count() == 80)
    assert(TableLog.selectivityBound(t, "lbl", 3, 3) == 1.0)
    // compact WITH statsCols: stats re-recorded on the rewrite. The
    // compacted layout is one overwrite commit (not label-partitioned), so
    // the bound is whatever the new directories' min/max admit — still a
    // true upper bound, and readWhereRange pruning still works.
    TableLog.compact(spark, t, statsCols = Seq("lbl"))
    val b = TableLog.selectivityBound(t, "lbl", 3, 3)
    assert(b > 0.0 && b <= 1.0)
    assert(TableLog.readWhereRange(spark, t, "lbl", 3, 3)
      .filter(col("lbl") === 3).count() == 20)
    // a clustered rewrite (which REPLACES the whole manifest — an
    // overwritePartitions can't address the compact's untagged entries)
    // restores tightness: one directory per label, bound = true fraction
    TableLog.overwriteClustered(TableLog.read(spark, t), t, col("lbl"),
      statsCols = Seq("lbl"))
    assert(TableLog.selectivityBound(t, "lbl", 3, 3) == 0.25)
    assert(TableLog.read(spark, t).count() == 80)
  }

  test("orphaned data from lost races stays invisible") {
    val t = tmpTable()
    TableLog.overwrite(df(1), t)
    TableLog.append(df(2), t)
    // entries are path|tag|stats|schema — compare the path field
    val live = TableLog.manifest(t, TableLog.headVersion(t))
      .map(_.split("\\|")(0)).toSet
    val onDisk = new java.io.File(t, "data").listFiles().map("data/" + _.getName).toSet
    assert(live.subsetOf(onDisk), "manifest references a missing data dir")
    // any orphan (onDisk -- live) is legal and must simply not be read
    val n = TableLog.read(spark, t).count()
    assert(n == 2, s"reader saw $n rows — an orphan leaked into the scan?")
  }
}
