package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ScaleProbeCoverage]]'s three invariants (r10 VERDICT #7): the
  * probe ledger is total over the driver surface, references only real
  * probe labels (re-parsed from ScaleProbe.scala so the sets cannot
  * drift), and justifies every probe-less key. Pure metadata — no Spark
  * session needed. */
class ScaleProbeCoverageSpec extends AnyFunSuite {

  test("probeKeys equals the time()/dirKey() labels in ScaleProbe.scala") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/ScaleProbe.scala")),
      "UTF-8")
    val labels = """(?:time|dirKey)\("([a-z0-9_]+)"\)""".r
      .findAllMatchIn(src).map(_.group(1)).toSet
    val missing = labels -- ScaleProbeCoverage.probeKeys
    val stale = ScaleProbeCoverage.probeKeys -- labels
    assert(missing.isEmpty && stale.isEmpty,
      s"probeKeys drift — missing: ${missing.toSeq.sorted}, " +
        s"stale: ${stale.toSeq.sorted}")
  }

  test("every driver query key has a 24x probe or a justified absence") {
    val keys = SparkEntry.queries.keySet
    val cov = ScaleProbeCoverage.coverage
    val unmapped = keys -- cov.keySet
    val stale = cov.keySet -- keys
    assert(unmapped.isEmpty, s"keys with no coverage entry: " +
      s"${unmapped.toSeq.sorted} — add a probe or a justification")
    assert(stale.isEmpty, s"coverage entries for dead keys: " +
      s"${stale.toSeq.sorted}")
    cov.toSeq.sortBy(_._1).foreach { case (k, (probes, note)) =>
      probes.foreach(p => assert(ScaleProbeCoverage.probeKeys(p),
        s"$k references unknown probe label '$p'"))
      assert(probes.nonEmpty || note.trim.nonEmpty,
        s"$k: no probe and no justification")
    }
  }
}
