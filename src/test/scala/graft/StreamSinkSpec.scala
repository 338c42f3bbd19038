package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the streaming parquet file sink (q_stream_sink's mechanism):
  * exactly-once across a STOP/RESTART on the same checkpoint — the property
  * the _spark_metadata commit log exists for. A naive re-run of a batch job
  * over a growing directory either re-reads everything (duplicates) or
  * needs external bookkeeping; the file sink's log makes the second run
  * resume from the committed offset and the metadata-aware read see each
  * row exactly once.
  */
class StreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rm(f: java.io.File): Unit = {
    val k = f.listFiles(); if (k != null) k.foreach(rm); f.delete()
  }

  test("restart on the same checkpoint lands every row exactly once") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink_").toFile
    try {
      val srcDir = new java.io.File(tmp, "src"); srcDir.mkdirs()
      val outDir = new java.io.File(tmp, "out").getAbsolutePath
      val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath

      def writeOne(rows: Seq[(Long, String)], name: String, mtime: Long): Unit = {
        val raw = new java.io.File(tmp, s"raw_$name")
        rows.toDF("id", "grp").coalesce(1)
          .write.mode("overwrite").parquet(raw.getAbsolutePath)
        val part = raw.listFiles((f: java.io.File) =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
        val dst = new java.io.File(srcDir, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(mtime); rm(raw)
      }
      val schema = Seq((1L, "a")).toDF("id", "grp").schema
      def run(): Unit = {
        val q = spark.readStream.schema(schema)
          .option("pathGlobFilter", "*.parquet").parquet(srcDir.getAbsolutePath)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        q.processAllAvailable(); q.stop()
      }

      val t0 = System.currentTimeMillis() - 60000L
      writeOne((0L until 50L).map(i => (i, "a")), "b0", t0)
      run() // first incarnation commits batch 0
      writeOne((50L until 80L).map(i => (i, "b")), "b1", t0 + 5000L)
      run() // RESTART: must resume past b0, land only b1

      val got = spark.read.parquet(outDir)
      assert(got.count() == 80L, "restart duplicated or dropped a batch")
      assert(got.select("id").distinct().count() == 80L, "duplicate rows landed")
      assert(new java.io.File(outDir, "_spark_metadata").isDirectory,
        "no sink commit log — reads lose the exactly-once guarantee")
    } finally rm(tmp)
  }
}
