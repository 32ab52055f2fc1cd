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

  test("every oracle key has a query; every query has an oracle or an md5 twin") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracleSql keys without a query: ${o -- q}")
    // the driver records a weaker rows-only check for oracle-less
    // queries. The ONLY keys allowed to be oracle-less are the
    // engine-default fast-hash variants (xxhash64 — DuckDB cannot
    // replicate it), and each must have a dedicated `<key>_md5` twin
    // that IS oracle-compared bit-exactly, so every operator's logic
    // stays externally verified.
    val fastAllowlist = Set("text_cdc_chunks", "text_fingerprint")
    assert((q -- o) == fastAllowlist,
      s"oracle-less queries must be exactly the fast-hash allowlist: ${q -- o}")
    fastAllowlist.foreach { k =>
      assert(o.contains(s"${k}_md5"),
        s"fast-hash key $k needs its oracle-backed ${k}_md5 twin")
    }
  }
}
