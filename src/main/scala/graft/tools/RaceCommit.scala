package graft.tools

import graft.sources.GenManifest

/** Cross-PROCESS manifest-race driver. Deliberately Spark-free — the
  * manifest protocol is pure filesystem, which is the point:
  * ManifestSpec spawns these as SEPARATE JVMs racing its own
  * in-process commits, proving the create-if-absent arbitration
  * (hard-link publish on POSIX, rename elsewhere) holds across
  * process boundaries where no JVM-level lock can mask a broken
  * primitive.
  *
  * Two modes:
  *   - `dir tag n` (append): `n` append commits of one tiny entry each
  *     (`race-<tag>-<i>`), then `DONE <tag> <finalVersion>`. Losers
  *     retry inside [[GenManifest.append]]; the spec asserts no
  *     version is lost and no record vanishes.
  *   - `dir tag rounds replace`: the CONDITIONAL-replace race. For
  *     each round `r`, attempt the maintenance swap
  *     `replace({small-r-1, small-r-2} -> pack-r-<tag>)` against
  *     smalls the spec pre-seeded; print `ROUND r WIN` on commit or
  *     `ROUND r LOSE` when [[GenManifest.ConcurrentMaintenanceException]]
  *     says the other racer's swap already retired them. Two racers
  *     attempting every round MUST split each round exactly one
  *     WIN / one LOSE — a double WIN is the doubled-rows bug the
  *     conditional replace exists to kill, a double LOSE is a lost
  *     commit. Ends with `DONE <tag> <wins>`.
  */
object RaceCommit {
  def main(args: Array[String]): Unit = {
    val (dir, tag, n) = (args(0), args(1), args(2).toInt)
    val conf = new org.apache.hadoop.conf.Configuration()
    if (args.length > 3 && args(3) == "replace") {
      var wins = 0
      (1 to n).foreach { r =>
        val res =
          try {
            GenManifest.replace(dir, conf,
              Set(s"small-$r-1.proto.zst", s"small-$r-2.proto.zst"),
              Seq(GenManifest.Entry(s"pack-$r-$tag.proto.zst", 2L, 2L,
                sorted = false, "", "")))
            wins += 1; "WIN"
          } catch {
            case _: GenManifest.ConcurrentMaintenanceException => "LOSE"
          }
        println(s"ROUND $r $res")
      }
      println(s"DONE $tag $wins")
    } else {
      (1 to n).foreach { i =>
        GenManifest.append(dir, conf, Seq(GenManifest.Entry(
          s"race-$tag-$i.proto.zst", 1L, 1L, sorted = false, "", "")))
      }
      val v = GenManifest.read(dir, conf).map(_.version).getOrElse(-1L)
      println(s"DONE $tag $v")
    }
  }
}
