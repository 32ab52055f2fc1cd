package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps SURVEY.md §2.13's registry count honest: the number in the doc
  * must equal the actual `SparkEntry.queries` size (it went stale three
  * rounds running when hand-maintained). Also pins the registry's two
  * structural invariants the driver relies on.
  */
class SurveyCountsSpec extends AnyFunSuite {

  test("SURVEY.md §2.13 registry count equals SparkEntry.queries.size") {
    val path = Seq("SURVEY.md", "/root/repo/SURVEY.md")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
      .getOrElse(fail("SURVEY.md not found from the test working directory"))
    val survey = new String(
      java.nio.file.Files.readAllBytes(path), java.nio.charset.StandardCharsets.UTF_8)
    val claimed = "(\\d+) registry queries total".r.findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY.md no longer carries the 'N registry queries total' line"))
      .group(1).toInt
    assert(claimed == SparkEntry.queries.size,
      s"SURVEY.md claims $claimed registry queries but SparkEntry has " +
        s"${SparkEntry.queries.size} - update the doc")
  }

  test("every oracle key has a query; EVERY query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracleSql keys without a query: ${o -- q}")
    // Since round 17 there is NO oracle-less key: the two engine-default
    // fast-hash variants (text_cdc_chunks, text_fingerprint — xxhash64,
    // which DuckDB cannot bit-replicate) now project oracle-checkable
    // INVARIANTS (reassembly md5, coverage, boundary rule, equality
    // partitions) instead of bypassing the gate, and their `_md5` twins
    // keep the bit-exact value oracles. Any future key must carry an
    // oracle — invariant-shaped if its values aren't DuckDB-expressible.
    assert((q -- o).isEmpty,
      s"every registry query must carry an oracle; missing: ${q -- o}")
  }
}
