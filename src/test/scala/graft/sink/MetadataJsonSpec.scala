package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** The metadata JSON tokenizer: full escape handling, structural
  * characters inside strings (the exact class the old shape-regex
  * parsers were fragile against), strict failure on malformed input.
  */
class MetadataJsonSpec extends AnyFunSuite {

  import MetadataJson._

  test("structural characters inside strings parse exactly") {
    // the old regex parser anchored on }, ], "," — all legal INSIDE a
    // JSON string; the tokenizer must treat them as content
    val v = parse("""{"a":"x},\"y\",[z:{","b":["p,q","r}s"]}""").asObj
    assert(v("a").asStr == """x},"y",[z:{""")
    assert(v("b").asArr.map(_.asStr) == Seq("p,q", "r}s"))
  }

  test("escapes round-trip: backslash, quote, \\uXXXX, control chars") {
    val v = parse("""{"k":"a\\b\"c]	d\n"}""").asObj
    assert(v("k").asStr == "a\\b\"c]\td\n")
  }

  test("numbers keep integral precision; booleans and null") {
    val o = parse("""{"big":9007199254740993,"neg":-5,"t":true,"f":false,"n":null}""").asObj
    // 2^53 + 1: a double round-trip would corrupt this snapshot id
    assert(o("big").asLong == 9007199254740993L)
    assert(o("neg").asLong == -5L)
    assert(o("t").asBool && !o("f").asBool)
    assert(o("n") == JNull)
  }

  test("empty containers, nesting, whitespace tolerance") {
    val v = parse(" { \"a\" : [ ] , \"b\" : { } , \"c\" : [ [ 1 ] ] } ").asObj
    assert(v("a").asArr.isEmpty && v("b").asObj.isEmpty)
    assert(v("c").asArr.head.asArr.head.asLong == 1L)
  }

  test("malformed input fails loudly with the offset, never half-parses") {
    for (bad <- Seq("""{"a":1""", """[1,]""", """{"a" 1}""", """{"a":"x}""",
      """{"a":1}trailing""", """{'a':1}""")) {
      val e = intercept[ParseException](parse(bad))
      assert(e.getMessage.contains("offset"), s"$bad -> ${e.getMessage}")
    }
  }

  test("corrupt \\u escapes fail as ParseException, never NumberFormatException") {
    // callers degrade on ParseException only (stats sidecars are never a
    // correctness input) — a NumberFormatException leaking from parseInt
    // would fail a whole read instead; and parseInt's sign tolerance
    // ("+1aF") must not make junk parse
    for (bad <- Seq("ZZZZ", "+1aF", "12 4", "-123").map(h => "{\"k\":\"\\u" + h + "\"}")) {
      val e = intercept[ParseException](parse(bad))
      assert(e.getMessage.contains("\\u"), s"$bad -> ${e.getMessage}")
    }
    // well-formed hex still round-trips, both cases
    assert(parse("{\"k\":\"\\u0041\\u00e9\\u00E9\"}").asObj("k").asStr == "Aéé")
  }

  test("typed accessors fail actionably on shape mismatch") {
    val e = intercept[ParseException](parse("""[1]""").asObj)
    assert(e.getMessage.contains("expected object"))
    val e2 = intercept[ParseException](parse("""{"a":"s"}""").asObj("a").asLong)
    assert(e2.getMessage.contains("expected number"))
  }
}
