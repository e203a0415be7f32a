package graft.tools

/** Per-entry bench-noise tripwire: adjudicates "regression vs ambient
  * noise" mechanically instead of by eyeball. Compares a fresh medians line
  * (Bench's `/tmp/bench_medians.json`, or any file in the same one-line
  * format) against the committed steady snapshot `BENCH_MEDIANS.json` and
  * exits nonzero ONLY on entries that moved more than `RatioBar`× AND more
  * than `AbsFloorSec` seconds — the same two-sided test Bench's
  * TIMING_DELTA uses, because single-stage entries routinely read 2–3× on
  * identical bytes under ambient load while staying under 0.3 s absolute.
  *
  * Protocol (see README): the snapshot refreshes ONLY in a commit whose
  * diff changes query-path code; on unchanged code a red BenchGuard run is
  * by definition a measurement problem (re-run it), a green one clears the
  * entries. Scale factors must match — comparing sf0.001 against an sf0.1
  * snapshot is refused (exit 2) rather than reported as 58 regressions.
  */
object BenchGuard {
  val RatioBar = 1.3
  val AbsFloorSec = 0.3

  final case class Violation(name: String, freshSec: Double, snapSec: Double) {
    def ratio: Double = freshSec / snapSec
    override def toString: String =
      f"$name: $freshSec%.3fs vs snapshot $snapSec%.3fs (${ratio}%.2fx)"
  }

  /** Pull the `"medians":{...}` map out of a bench JSON line. Regex-scoped
    * to the medians object on purpose — no JSON library ships with the
    * build, and the format is machine-written by Bench. */
  def parseMedians(json: String): Map[String, Double] = {
    val obj = """"medians"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(json)
      .map(_.group(1))
      .getOrElse(sys.error("input has no \"medians\":{...} object"))
    """"([A-Za-z0-9_]+)"\s*:\s*([-0-9.eE+]+)""".r.findAllMatchIn(obj)
      .map(g => g.group(1) -> g.group(2).toDouble).toMap
  }

  /** The recorded scale-factor dir, if the line carries one. */
  def parseSf(json: String): Option[String] =
    """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(json).map(_.group(1))

  /** Entries whose fresh median moved beyond BOTH bars vs the snapshot.
    * Entries absent from the snapshot (new since it was taken) are not
    * violations — they have no baseline yet. */
  def compare(fresh: Map[String, Double], snapshot: Map[String, Double],
              ratioBar: Double = RatioBar,
              absFloor: Double = AbsFloorSec): Seq[Violation] =
    fresh.toSeq.sorted.flatMap { case (name, v) =>
      snapshot.get(name) match {
        case Some(s) if v > ratioBar * s && v - s > absFloor =>
          Some(Violation(name, v, s))
        case _ => None
      }
    }

  def main(args: Array[String]): Unit = {
    val freshPath = if (args.length > 0) args(0) else "/tmp/bench_medians.json"
    val snapPath = if (args.length > 1) args(1) else "BENCH_MEDIANS.json"
    val fresh = java.nio.file.Files.readString(java.nio.file.Path.of(freshPath))
    val snap = java.nio.file.Files.readString(java.nio.file.Path.of(snapPath))
    (parseSf(fresh), parseSf(snap)) match {
      case (Some(a), Some(b)) if a != b =>
        System.err.println(s"BENCH_GUARD sf mismatch: fresh=$a snapshot=$b — not comparable")
        sys.exit(2)
      case _ => ()
    }
    val fm = parseMedians(fresh)
    val sm = parseMedians(snap)
    val vs = compare(fm, sm)
    val newEntries = (fm.keySet -- sm.keySet).toSeq.sorted
    if (newEntries.nonEmpty)
      println(s"BENCH_GUARD new entries (no baseline): ${newEntries.mkString(", ")}")
    if (vs.isEmpty) {
      println(s"BENCH_GUARD ok: ${fm.size} entries within ${RatioBar}x/${AbsFloorSec}s of $snapPath")
    } else {
      vs.foreach(v => println(s"BENCH_GUARD violation $v"))
      println(s"BENCH_GUARD ${vs.size} violation(s) — regression if query-path code changed, re-measure if not")
      sys.exit(1)
    }
  }
}
