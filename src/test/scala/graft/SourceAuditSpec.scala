package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Structural source audit: corpus-sized driver materialization.
  *
  * The plan-level audits (PlanSpec) prove no unpartitioned windows and no
  * cartesian products survive optimization; this one closes the remaining
  * manually-reviewed shape — `collect()`-style actions that pull rows onto
  * the driver. Every such site in src/main must carry a
  * `bounded-collect: <why the row count is bounded>` marker within the six
  * preceding lines, and every marker must actually cover a site (a stale
  * marker with no collect under it fails too), so the whitelist cannot
  * drift from the code the way a named-query list can.
  *
  * Out of scope by design, with reasons:
  *  - `Bench.scala` / `Verify.scala`: driver mains — materializing results
  *    is their contract (and their only `.collect {` uses are Scala
  *    partial-function collects on local Seqs, not Dataset actions).
  *  - `Probe.scala`: documented dev-only scratch main, never on a query path.
  */
class SourceAuditSpec extends AnyFunSuite {

  private val SkipFiles = Set("Bench.scala", "Verify.scala", "Probe.scala")
  // Dataset driver materializations. `\.collect\(\)` does not match Scala's
  // partial-function `.collect { ... }`; collectAsList/toLocalIterator have
  // no common Scala-collection homonym; approxQuantile returns its result
  // array to the driver (a sketch — but still a per-call materialization
  // that must be boundedness-justified).
  private val SitePattern =
    raw"\.collect\(\)|\.collectAsList\(|\.toLocalIterator|\.approxQuantile\(".r
  private val Marker = "bounded-collect:"
  private val LookBack = 6

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src", "main", "scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => SkipFiles.contains(p.getFileName.toString))
      .toSeq.sortBy(_.toString)
  }

  private def isComment(line: String): Boolean = {
    val t = line.trim
    t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
  }

  test("every driver collect in src/main carries a bounded-collect justification") {
    val unmarked = for {
      path <- mainSources
      lines = Files.readAllLines(path).asScala.toVector
      (line, idx) <- lines.zipWithIndex
      if SitePattern.findFirstIn(line).isDefined && !isComment(line)
      window = lines.slice(math.max(0, idx - LookBack), idx + 1)
      if !window.exists(_.contains(Marker))
    } yield s"$path:${idx + 1}: ${line.trim}"
    assert(unmarked.isEmpty,
      s"\nDriver collect sites without a '$Marker' justification (add the marker " +
        s"within $LookBack lines above, stating why the row count is bounded):\n" +
        unmarked.mkString("\n"))
  }

  test("every bounded-collect marker covers a live collect site") {
    val stale = for {
      path <- mainSources
      lines = Files.readAllLines(path).asScala.toVector
      (line, idx) <- lines.zipWithIndex
      if line.contains(Marker)
      window = lines.slice(idx + 1, idx + 1 + LookBack)
      if !window.exists(l => SitePattern.findFirstIn(l).isDefined && !isComment(l))
    } yield s"$path:${idx + 1}: ${line.trim}"
    assert(stale.isEmpty,
      "\nStale bounded-collect markers (no collect site within " +
        s"$LookBack lines below — delete or move them):\n" + stale.mkString("\n"))
  }

  test("no operator mutates the shared session's shuffle width") {
    // Scoped shuffle-width overrides belong on a session CLONE
    // (DedupOps.loopFrames / StreamJoinOps.withStatePartitions): a
    // set-and-restore on the caller's session silently rescopes any other
    // query planned inside the window, and is unsafe the moment two queries
    // share a session. Structural rule: the exact mutation call on a
    // receiver named `spark` (the caller-session parameter convention
    // throughout src/main) must not exist; clones are locally named `s`,
    // `s2`, or `loop`.
    val offenders = for {
      path <- mainSources
      if !Set("PlanDigest.scala").contains(path.getFileName.toString)
      lines = Files.readAllLines(path).asScala.toVector
      (line, idx) <- lines.zipWithIndex
      if line.contains("spark.conf.set(\"spark.sql.shuffle.partitions\"") && !isComment(line)
    } yield s"$path:${idx + 1}: ${line.trim}"
    assert(offenders.isEmpty,
      "\nShared-session shuffle-width mutation (use a session clone — " +
        "DedupOps.loopFrames or GraftSqlBridge.cloneSession — instead):\n" +
        offenders.mkString("\n"))
  }
}
