package graft.tools

import graft.sources.GenManifest

/** Cross-PROCESS manifest-race driver: performs `n` append commits of
  * one tiny entry each (`race-<tag>-<i>`) against `dir`, then prints
  * `DONE <tag> <finalVersion>`. Deliberately Spark-free — the
  * manifest protocol is pure filesystem, which is the point:
  * ManifestSpec spawns two of these as SEPARATE JVMs racing its own
  * in-process commits, proving the create-if-absent arbitration
  * (hard-link publish on POSIX, rename elsewhere) holds across
  * process boundaries where no JVM-level lock can mask a broken
  * primitive. Losers retry inside [[GenManifest.append]]; the spec
  * asserts no version is lost and no record vanishes.
  */
object RaceCommit {
  def main(args: Array[String]): Unit = {
    val (dir, tag, n) = (args(0), args(1), args(2).toInt)
    val conf = new org.apache.hadoop.conf.Configuration()
    (1 to n).foreach { i =>
      GenManifest.append(dir, conf, Seq(GenManifest.Entry(
        s"race-$tag-$i.proto.zst", 1L, 1L, sorted = false, "", "")))
    }
    val v = GenManifest.read(dir, conf).map(_.version).getOrElse(-1L)
    println(s"DONE $tag $v")
  }
}
