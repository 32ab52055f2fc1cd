package graft

import org.scalatest.funsuite.AnyFunSuite

/** The warm-fixture base contract: build exactly once per (key, sfDir),
  * and — because `getOrElseUpdate` caches nothing when the build throws
  * — a retry after a mid-build failure must start from a WIPED base,
  * never on top of the failed attempt's debris (half-written files turn
  * into path-exists write failures or doubled commits for the rest of
  * the JVM).
  */
class WarmFixtureSpec extends AnyFunSuite {

  test("warmBaseDir wipes debris from a build that threw, then memoizes the rebuild") {
    val key = "warm_retry_spec"
    val sf = "/tmp/warm-spec-sf"
    var calls = 0
    intercept[RuntimeException] {
      MetaQueries.warmBaseDir(key, sf) { b =>
        calls += 1
        java.nio.file.Files.write(
          java.nio.file.Paths.get(b, "debris.txt"), "x".getBytes("UTF-8")): Unit
        throw new RuntimeException("mid-build failure")
      }
    }
    val base = MetaQueries.warmBaseDir(key, sf) { b =>
      calls += 1
      assert(!new java.io.File(b, "debris.txt").exists(),
        "retry must start from a wiped base, not the failed attempt's debris")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(b, "ok.txt"), "y".getBytes("UTF-8")): Unit
    }
    assert(calls == 2)
    assert(new java.io.File(base, "ok.txt").exists())
    // a successful build memoizes: no third invocation of the builder
    MetaQueries.warmBaseDir(key, sf)(_ => calls += 1): Unit
    assert(calls == 2, "a green base must never rebuild within the JVM")
  }
}
