package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-count drift guard (VERDICT r11 #2: COVERAGE.md shipped a stale
  * "429 catalog entries" for a full round). The CURRENT-count phrases in
  * README.md and COVERAGE.md must equal SparkEntry.catalog.size, so any
  * catalog growth that skips the doc sync fails CI instead of waiting
  * for an auditor. Historical per-round counts (SCALE.md's round notes)
  * are deliberately not matched — only the two canonical live phrases.
  */
class DocsSyncSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("README/COVERAGE current catalog counts match SparkEntry.catalog") {
    val n = SparkEntry.catalog.size
    val ingest = SparkEntry.catalog.count(_.name.startsWith("ingest_"))
    val readme = read("README.md")
    assert(readme.contains(s"the $n-entry operator catalog"),
      s"README.md's catalog-size phrase is stale (catalog has $n entries)")
    val coverage = read("COVERAGE.md")
    assert(coverage.contains(s"$n catalog entries (${n - ingest}"),
      s"COVERAGE.md's Harness count is stale (catalog has $n entries, " +
        s"${n - ingest} queries + $ingest ingest)")
  }
}
