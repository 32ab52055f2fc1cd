package graft.text

import org.scalacheck.{Gen, Prop, Properties}

/** The vocab-scale encoder's EQUIVALENCE CONTRACT as a property: for
  * any merge list that is causally ordered (every operand is a base
  * character or the product of an earlier merge) with unique product
  * strings — the two invariants both trainers guarantee by
  * construction — min-rank-first merging (BpeMergeTable) must equal
  * applying the replace chain in rank order, bit for bit, on any word.
  *
  * Why generate merge lists directly instead of training: Spark-trained
  * fixtures (BpeScaledSpec) cover the trained-model path, but the class
  * contract is stated over the PRECONDITION, not over training — this
  * generator explores merge DAGs (deep chains, shared operands, token
  * reuse across merges) that small trained corpora never produce. The
  * proof sketch the property checks: a pair, once exhausted, can only
  * reappear if a later merge's product EQUALS one of its operands; the
  * operand already existed earlier, so that would require two merges
  * with the same product string — excluded by product uniqueness.
  */
object BpeEncodeProps extends Properties("BpeEncodeScaled") {

  private val alphabet = "abcde"

  /** The shared JVM reference for replace-chain semantics. */
  private def chainRef(word: String, merges: Seq[(String, String)]): String =
    BpeChainRef(word, merges)

  /** A causally-ordered, product-unique merge list: operands drawn from
    * base chars plus earlier products; candidates whose product already
    * exists are skipped (seeds may collide — the list just ends up
    * shorter, never invalid).
    */
  private val genMerges: Gen[List[(String, String)]] = for {
    n <- Gen.choose(1, 24)
    picks <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 63), Gen.choose(0, 63)))
  } yield {
    val tokens = scala.collection.mutable.ArrayBuffer(alphabet.map(_.toString): _*)
    val products = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    picks.foreach { case (i, j) =>
      val l = tokens(i % tokens.size)
      val r = tokens(j % tokens.size)
      if (!products(l + r) && (l + r).length <= 12) {
        products += (l + r)
        tokens += (l + r)
        out += ((l, r))
      }
    }
    out.toList
  }

  private val genWord: Gen[String] = for {
    n <- Gen.choose(0, 16)
    cs <- Gen.listOfN(n, Gen.oneOf(alphabet.toSeq))
  } yield cs.mkString

  property("min-rank-first == rank-order replace chain on any causal model") =
    Prop.forAll(genMerges, Gen.listOfN(30, genWord)) { (merges, words) =>
      val table = new graft.functions.BpeMergeTable(
        merges.map(_._1).toArray, merges.map(_._2).toArray)
      words.forall { w =>
        val got = table.encodeWrapped(w)
        val want = chainRef(w, merges)
        if (got != want)
          println(s"DIVERGED on '$w' under $merges: scaled=$got chain=$want")
        got == want
      }
    }

  property("token counts: concatenation of tokens reassembles the word") =
    Prop.forAll(genMerges, genWord) { (merges, w) =>
      val table = new graft.functions.BpeMergeTable(
        merges.map(_._1).toArray, merges.map(_._2).toArray)
      val wrapped = table.encodeWrapped(w)
      // strip the wrapping: tokens concatenated must equal the word
      val tokens =
        if (wrapped.isEmpty) Nil
        else wrapped.substring(1, wrapped.length - 1).split("><", -1).toSeq
      tokens.mkString == w && table.tokenCount(w) == tokens.length
    }
}
