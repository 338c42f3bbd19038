package graft

import java.nio.file.{Files, StandardCopyOption}

/** Write-once artifact directories with crash/concurrency-safe publication.
  *
  * Artifacts under a content-derived key (replay splits, the IVF index, the
  * kNN graph) are built by whichever JVM first needs them and then shared —
  * bench passes and test suites run concurrently against the same temp dir,
  * so a plain `mode("overwrite")` write races: one JVM can delete/rewrite the
  * directory while another is mid-read. The discipline here (originally
  * StreamOps.multiBatchDir's, now shared):
  *
  *  1. A VALID artifact under the key is reused as-is — content derives
  *     deterministically from the key, so whoever built it, it is the same.
  *  2. Builds go to a process-unique staging dir next to the target.
  *  3. Publication is ONE atomic rename. The loser of a race keeps the
  *     winner's copy and discards its own staging — the target is never
  *     deleted once published, so a concurrent reader can't observe a
  *     half-built or vanishing directory.
  *  4. Only a target that exists but FAILS validation (pre-atomic crash
  *     leftovers) is replaced, and only behind the same atomic rename.
  */
object ArtifactIO {

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
  }

  /** Digest every regular file under `f` as a (relative path, size, mtime)
    * tuple. Stronger than summed-scalar digests (per-file attribution means
    * one file's same-size rewrite can't be masked by another's), but still
    * metadata-only: a same-size rewrite of a single file landing within the
    * filesystem's mtime granularity is invisible. Fine for the fixtures this
    * keys (driver-generated parquet, rewritten wholesale); include content
    * bytes if that edge ever matters.
    */
  def fingerprintInto(md: java.security.MessageDigest, base: java.nio.file.Path,
                      f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids == null)
      md.update(s"${base.relativize(f.toPath)}|${f.length()}|${f.lastModified()}\n"
        .getBytes("UTF-8"))
    else kids.sortBy(_.getName).foreach(fingerprintInto(md, base, _))
  }

  /** MD5 key of a seed string plus the fingerprint of a fixture path. */
  def contentKey(seed: String, fixture: java.io.File): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"$seed|".getBytes("UTF-8"))
    fingerprintInto(md, fixture.toPath.getParent, fixture)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Ensure `out` holds a valid artifact, building it if absent. `build`
    * receives the staging directory (created empty) and must leave the
    * complete artifact in it; `valid` decides whether an existing directory
    * under this key is complete. Returns `out`'s absolute path.
    */
  def publishDir(out: java.io.File, valid: java.io.File => Boolean)
                (build: java.io.File => Unit): String = this.synchronized {
    if (!(out.isDirectory && valid(out))) {
      val staging = new java.io.File(out.getParentFile,
        out.getName + s".staging-${java.lang.ProcessHandle.current().pid()}")
      deleteRec(staging)
      staging.mkdirs()
      // staging names embed the pid, so a later run (different pid) would
      // never reclaim a leftover — clean up on EVERY exit path, including a
      // throwing build.
      try {
        build(staging)
        try
          Files.move(staging.toPath, out.toPath, StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another process published under this key first; its copy is
          // interchangeable (content derives from the key) — UNLESS what sits
          // there fails validation (a pre-atomic crash leftover): replace it,
          // still behind an atomic rename.
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.AccessDeniedException |
               _: java.nio.file.FileSystemException =>
            if (!(out.isDirectory && valid(out))) {
              deleteRec(out)
              try
                Files.move(staging.toPath, out.toPath, StandardCopyOption.ATOMIC_MOVE)
              catch {
                case _: java.nio.file.FileSystemException =>
                  if (!(out.isDirectory && valid(out))) throw new IllegalStateException(
                    s"artifact publish failed and $out is absent or invalid")
              }
            }
        }
      } finally deleteRec(staging)
    }
    out.getAbsolutePath
  }

  /** Write `df` as a BUCKETED parquet table at `path` — hash buckets on
    * `bucketCol`, sorted within, ONE file per bucket via a matching
    * pre-write repartition (single-file buckets are what lets a reader
    * trust the sort order) — through the only bucket-writing API Spark has
    * (saveAsTable); the temp catalog entry is dropped right after
    * (external: files persist). Pair with `readBucketed`, which re-declares
    * the spec — bucket metadata lives in the catalog, not the files, and a
    * plain spark.read.parquet would silently forget the layout.
    */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, path: String,
                    bucketCol: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    val tmpName = s"graft_bw_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(tmpName)
    spark.sql(s"DROP TABLE IF EXISTS $tmpName")
  }

  /** Register (once per session, keyed by path) an external bucketed table
    * over files written by `writeBucketed` and return it. `schemaDdl` must
    * state the written schema exactly (e.g. "src BIGINT, dst BIGINT").
    */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, path: String,
                   schemaDdl: String, bucketCol: String, nBuckets: Int)
      : org.apache.spark.sql.DataFrame = {
    val name = "graft_bt_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(path.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    if (!spark.catalog.tableExists(name))
      spark.sql(
        s"""CREATE TABLE $name ($schemaDdl)
           |USING parquet CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $nBuckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    spark.table(name)
  }
}
