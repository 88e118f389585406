package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-snapshot regression gate: the normalized formatted plan of every
  * [[PlanDigest.pinned]] query must equal its checked-in snapshot under
  * `src/test/resources/plans/`. On an INTENTIONAL plan change, regenerate
  * with `tools/run.sh graft.PlanDigestGen` and review the git diff; on an
  * unintentional one, this test is the tripwire (the actual plan is written
  * to `target/plans/` for side-by-side diffing).
  */
class PlanDigestSpec extends AnyFunSuite {
  import TestSpark._

  PlanDigest.pinned.foreach { name =>
    test(s"plan snapshot: $name") {
      val expectedFile = new java.io.File(PlanDigest.snapshotDir, s"$name.txt")
      assert(expectedFile.exists(),
        s"missing snapshot ${expectedFile.getPath} — run tools/run.sh graft.PlanDigestGen")
      val expected = new String(
        java.nio.file.Files.readAllBytes(expectedFile.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val actual = PlanDigest.planFor(spark, name, sf)
      if (actual != expected) {
        val outDir = new java.io.File("target/plans"); outDir.mkdirs()
        val f = new java.io.File(outDir, s"$name.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.write(actual) finally w.close()
        val firstDiff = actual.linesIterator.zipAll(expected.linesIterator, "<EOF>", "<EOF>")
          .zipWithIndex.find { case ((a, e), _) => a != e }
        fail(s"plan changed for $name (first diff at line " +
          s"${firstDiff.map(_._2 + 1).getOrElse(-1)}: " +
          s"expected '${firstDiff.map(_._1._2).getOrElse("")}' got " +
          s"'${firstDiff.map(_._1._1).getOrElse("")}'). Actual written to ${f.getPath}; " +
          "if intentional, regenerate with tools/run.sh graft.PlanDigestGen")
      }
    }
  }
}
