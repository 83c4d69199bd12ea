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
  * Three modes:
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
  *   - `dir tag n mixed <seed>`: the FULL-WORKLOAD stress — the
  *     discipline that caught the torn-readdir ghost commit, widened
  *     from append-only to the complete maintenance surface. Each
  *     racer walks `n` deterministic LCG-chosen ops (seeded
  *     `seed ^ tag` — reproducible per (seed, tag)): APPEND a real
  *     on-disk data file + manifest entry; OWN-PACK two of its own
  *     committed smalls via the conditional replace (its names are
  *     private, so a refusal here is a protocol bug — exit 2);
  *     SHARED-PACK the spec-seeded `small-r-*` pair (the contended
  *     replace — WIN/LOSE printed per round, the staged pack file
  *     cleaned up on LOSE, the retired smalls deleted on WIN exactly
  *     like the eight real call sites); or VACUUM
  *     (`SinkMaintain.vacuumUnreferenced`, 30 s grace) — the sweep
  *     racing live commits, which must delete spec-seeded stale junk
  *     yet never a manifest-referenced file or a freshly staged one.
  *     Log-GC runs implicitly under every commit (the checkpoint
  *     cadence). Emits a machine-checkable op journal — `ADD <tag>
  *     <name>`, `OWNPACK <tag> <packName> <nameA> <nameB>`,
  *     `ROUND r WIN|LOSE`, `VACUUM <removed>` — then
  *     `DONE <tag> <commits>`; the spec's quiescent verifier replays
  *     the journals against the final checkpoint+tail state: version
  *     arithmetic exact, every journaled name accounted for, no
  *     doubles, no vacuumed live files.
  */
object RaceCommit {
  def main(args: Array[String]): Unit = {
    val (dir, tag, n) = (args(0), args(1), args(2).toInt)
    val conf = new org.apache.hadoop.conf.Configuration()
    if (args.length > 4 && args(3) == "mixed") mixed(dir, tag, n,
      args(4).toLong, conf)
    else if (args.length > 3 && args(3) == "replace") {
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

  private def mixed(dir: String, tag: String, n: Int, seed: Long,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val root = java.nio.file.Paths.get(dir)
    def mkFile(name: String): Unit =
      java.nio.file.Files.write(root.resolve(name), Array[Byte](0x0a, 0x00))
    def rmFile(name: String): Unit =
      java.nio.file.Files.deleteIfExists(root.resolve(name))
    def entry(name: String) =
      GenManifest.Entry(name, 2L, 2L, sorted = false, "", "")
    // explicit LCG, not scala.util.Random: the op walk must replay
    // bit-identically from (seed, tag) forever, across scala versions
    var rng = seed ^ tag.hashCode.toLong
    def next(): Long = {
      rng = rng * 6364136223846793005L + 1442695040888963407L
      rng >>> 33
    }
    var commits = 0
    var sharedRound = 0
    val ownSmalls = scala.collection.mutable.Queue.empty[String]
    def append(i: Int): Unit = {
      val name = s"mx-$tag-$i.proto.zst"
      mkFile(name)
      GenManifest.append(dir, conf, Seq(entry(name)))
      ownSmalls += name
      commits += 1
      println(s"ADD $tag $name")
    }
    (1 to n).foreach { i =>
      (next() % 4).toInt match {
        case 1 if ownSmalls.length >= 2 =>
          val (a, b) = (ownSmalls.dequeue(), ownSmalls.dequeue())
          val pack = s"mxpack-$tag-$i.proto.zst"
          mkFile(pack)
          try GenManifest.replace(dir, conf, Set(a, b), Seq(entry(pack)))
          catch {
            case e: GenManifest.ConcurrentMaintenanceException =>
              // nobody else may touch THIS racer's names — a refusal
              // here is the protocol losing a private commit
              println(s"MIXED-CME-OWN $tag: $e"); sys.exit(2)
          }
          rmFile(a); rmFile(b)
          commits += 1
          println(s"OWNPACK $tag $pack $a $b")
        case 2 => // shared contended swap; rounds past the seeded set
          // MUST lose by the typed refusal (names never existed)
          sharedRound += 1
          val r = sharedRound
          val pack = s"spack-$r-$tag.proto.zst"
          mkFile(pack)
          val res = try {
            GenManifest.replace(dir, conf,
              Set(s"small-$r-1.proto.zst", s"small-$r-2.proto.zst"),
              Seq(entry(pack)))
            rmFile(s"small-$r-1.proto.zst"); rmFile(s"small-$r-2.proto.zst")
            commits += 1; "WIN"
          } catch {
            case _: GenManifest.ConcurrentMaintenanceException =>
              rmFile(pack); "LOSE"
          }
          println(s"ROUND $r $res")
        case 3 =>
          val removed = graft.operators.SinkMaintain
            .vacuumUnreferenced(dir, graceMs = 30000L)
          println(s"VACUUM $removed")
        case _ => append(i)
      }
    }
    println(s"DONE $tag $commits")
  }
}
