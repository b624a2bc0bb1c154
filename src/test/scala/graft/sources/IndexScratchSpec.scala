package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class IndexScratchSpec extends AnyFunSuite {

  private def mkCorpus(parent: java.io.File, name: String): java.io.File = {
    val d = new java.io.File(parent, name)
    assert(d.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(d, "documents.parquet").toPath,
      "same bytes".getBytes("UTF-8"))
    d
  }

  test("hashCode-colliding data dirs derive distinct index paths") {
    val parent =
      java.nio.file.Files.createTempDirectory("graft_is_").toFile
    // "Aa" and "BB" are the classic String.hashCode collision; with equal
    // prefixes the full paths collide too — exactly what r5's
    // dir.hashCode key would have aliased onto ONE index
    val a = mkCorpus(parent, "Aa")
    val b = mkCorpus(parent, "BB")
    assert(a.getPath.hashCode === b.getPath.hashCode)
    assert(IndexScratch.path("t", a.getPath) !==
      IndexScratch.path("t", b.getPath))
  }

  test("changed corpus under the same path derives a new index path") {
    val parent =
      java.nio.file.Files.createTempDirectory("graft_is_").toFile
    val d = mkCorpus(parent, "c")
    val p1 = IndexScratch.path("t", d.getPath)
    java.nio.file.Files.write(
      new java.io.File(d, "documents.parquet").toPath,
      "different length bytes".getBytes("UTF-8"))
    assert(IndexScratch.path("t", d.getPath) !== p1)
  }

  test("ensure builds once per path, atomically, and memoizes") {
    val parent =
      java.nio.file.Files.createTempDirectory("graft_is_").toFile
    val p = new java.io.File(parent, "idx").getPath
    var builds = 0
    IndexScratch.ensure(p) { tmp =>
      builds += 1
      assert(tmp !== p, "build must land in a temp dir, not the final path")
      assert(new java.io.File(tmp).mkdirs())
      java.nio.file.Files.write(
        new java.io.File(tmp, "part-0").toPath, "idx".getBytes("UTF-8"))
    }
    IndexScratch.ensure(p)(_ => builds += 1)
    assert(builds === 1)
    assert(new java.io.File(new java.io.File(p), "part-0").isFile)
  }
}
