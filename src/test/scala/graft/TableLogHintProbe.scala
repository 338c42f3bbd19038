package graft
import graft.sources.TableLog

/** Quantifies the r17 hint-file version resolution: headVersion/
  * oldestVersion cost at a 1000-commit log, hinted vs listing-fallback
  * (hint file removed). Pure filesystem — no Spark session. The absolute
  * numbers are local-fs noise-level; the SHAPE (O(1) stats vs O(versions)
  * listing, and how the gap widens with version count) is the claim.
  * Run: `Test/runMain graft.TableLogHintProbe [versions] [calls]`.
  */
object TableLogHintProbe {
  def main(args: Array[String]): Unit = {
    val versions = args.headOption.map(_.toInt).getOrElse(1000)
    val calls    = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val t = java.nio.file.Files.createTempDirectory("graft_hintprobe").toFile.getAbsolutePath
    val log = new java.io.File(t, "_log"); log.mkdirs()
    val body = "[\"data/c1-0-probe\"]".getBytes("UTF-8")
    (1 to versions).foreach { v =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(t, "_log", f"v$v%05d.json"), body)
    }
    def timeCalls(tag: String): Unit = {
      // warm once, then time
      TableLog.headVersion(t); TableLog.oldestVersion(t)
      val t0 = System.nanoTime()
      var i = 0
      while (i < calls) {
        require(TableLog.headVersion(t) == versions)
        require(TableLog.oldestVersion(t) == 1)
        i += 1
      }
      val us = (System.nanoTime() - t0) / 1e3 / calls
      println(f"[hintprobe] $tag%-28s $us%8.1f us/call-pair ($versions versions)")
    }
    val hint = java.nio.file.Paths.get(t, "_log", "_head.hint")
    java.nio.file.Files.write(hint, versions.toString.getBytes("UTF-8"))
    timeCalls("hinted (O(1) stats)")
    java.nio.file.Files.delete(hint)
    timeCalls("listing fallback (O(n))")
  }
}
