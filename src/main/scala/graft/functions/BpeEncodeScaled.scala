package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** The VOCAB-SCALE BPE encoder state: the learned merge list held as
  * rank-indexed operand arrays plus a pair→rank hash map, with a
  * min-rank-first per-word encoder — the standard production encoder
  * shape (tiktoken / HF tokenizers): per word, repeatedly find the
  * LOWEST-ranked merge present among adjacent token pairs, apply it to
  * all its occurrences left-to-right, and rescan, until no adjacent
  * pair is a learned merge.
  *
  * Why this exists next to [[graft.text.Bpe.applyMerges]]: the replace
  * chain folds ONE string `replace` per merge into the Catalyst
  * expression tree — bit-exact and oracle-replicable at the fixture's
  * K = 8/12, but a 32 000-merge production vocab would build a
  * 32 000-deep expression that neither plans nor codegens. Here the
  * whole model is ONE reference object (broadcast once per executor in
  * the serialized expression), and per-word cost is O(len · applied
  * merges) — independent of K.
  *
  * EQUIVALENCE contract: for merge lists produced by [[graft.text.Bpe]]
  * trainers, min-rank-first encoding is bit-identical to applying the
  * replace chain in rank order. Trained lists are CAUSALLY ORDERED —
  * every operand token is either a base character or the product of an
  * earlier merge, and a product string is never re-learned via a second
  * derivation — so a pair, once exhausted, can never be re-created by a
  * later merge, which makes "exhaust merges in rank order" and "always
  * apply the lowest rank present" the same computation. (Both trainers
  * guarantee this by construction: `train` learns over the globally
  * merged vocab state; `trainBatched` only accepts token-disjoint
  * merges per round.) BpeScaledSpec pins the equivalence differentially
  * on trained models; within one pair, occurrences merge left-to-right
  * non-overlapping, exactly like `replace`.
  */
final class BpeMergeTable(val lefts: Array[String], val rights: Array[String])
    extends Serializable {
  require(lefts.length == rights.length,
    s"operand arrays disagree: ${lefts.length} vs ${rights.length}")
  // the rank map keys pairs as `left SEP right`; a token containing the
  // separator would alias two different pairs onto one key, and the
  // apply loop could then find a "best" rank whose operands never match
  // an adjacent pair — an infinite loop. Impossible for Bpe.words
  // tokens ([a-z] only), but the constructor is public: fail loudly.
  require(lefts.forall(!_.contains(BpeMergeTable.Sep)) &&
      rights.forall(!_.contains(BpeMergeTable.Sep)),
    "merge operand tokens must not contain the reserved separator NUL (U+0000)")

  def numMerges: Int = lefts.length

  // rebuilt lazily after executor-side deserialization; first (lowest)
  // rank wins should a pair ever repeat
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](lefts.length * 2)
    var i = 0
    while (i < lefts.length) {
      m.putIfAbsent(lefts(i) + BpeMergeTable.Sep + rights(i), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Token list of `word` under min-rank-first merging. */
  private def encodeTokens(word: String): java.util.ArrayList[String] = {
    val n = word.length
    var ts = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) {
      val w = Character.charCount(word.codePointAt(i))
      ts.add(word.substring(i, i + w))
      i += w
    }
    var done = ts.size < 2
    while (!done) {
      var best = Integer.MAX_VALUE
      var j = 0
      val sz = ts.size
      while (j < sz - 1) {
        val r = rank.get(ts.get(j) + BpeMergeTable.Sep + ts.get(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Integer.MAX_VALUE) done = true
      else {
        val l = lefts(best)
        val rr = rights(best)
        val prod = l + rr
        val out = new java.util.ArrayList[String](sz)
        var k = 0
        while (k < sz) {
          if (k < sz - 1 && ts.get(k) == l && ts.get(k + 1) == rr) {
            out.add(prod); k += 2 // left-to-right, non-overlapping
          } else {
            out.add(ts.get(k)); k += 1
          }
        }
        ts = out
        if (ts.size < 2) done = true
      }
    }
    ts
  }

  /** Number of tokens `word` encodes to. */
  def tokenCount(word: String): Int = encodeTokens(word).size

  /** The wrapped token-string form `<t1><t2>...` — bit-comparable with
    * `Bpe.applyMerges(Bpe.wrapChars(word), merges)` for trained models.
    */
  def encodeWrapped(word: String): String = {
    val ts = encodeTokens(word)
    val sb = new java.lang.StringBuilder(word.length * 3)
    var i = 0
    while (i < ts.size) {
      sb.append('<').append(ts.get(i)).append('>')
      i += 1
    }
    sb.toString
  }
}

object BpeMergeTable {
  /** Pair-key separator: the actual NUL character (U+0000). A single
    * char that can never self-overlap keeps the key injective; the
    * constructor require bars it from operand tokens. (Before r18 this
    * was the SIX-char literal `\u0000` — injective too, since the
    * require barred that literal, but the guard did not match what the
    * comments claimed: a token containing a real NUL was accepted.)
    */
  private[functions] val Sep = "\u0000"
}

/** Per-word BPE token counts over a word array, as ONE native codegen
  * expression: `array<string>` of normalized words in, `array<int>` of
  * token counts out. The merge table rides along as a single reference
  * object (the whole vocab serialized once per task, O(1) lookups per
  * adjacent pair), so the expression's size and plan cost are
  * INDEPENDENT of the vocab size — the property the replace-chain
  * encoder lacks. Null elements count 0 tokens (the word normalizer
  * never produces them).
  */
case class BpeTokenCounts(child: Expression, table: BpeMergeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"bpe_token_counts expects array<string>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val res = new Array[Int](n)
    var i = 0
    while (i < n) {
      res(i) = if (arr.isNullAt(i)) 0 else table.tokenCount(arr.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeMergeTable", table, classOf[BpeMergeTable].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      s"""
         |int $n = $a.numElements();
         |int[] $res = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $res[$i] = $a.isNullAt($i)
         |    ? 0 : $tbl.tokenCount($a.getUTF8String($i).toString());
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCounts =
    copy(child = newChild)
}

object BpeTokenCounts {
  /** Column surface. */
  def bpeTokenCounts(words: Column, table: BpeMergeTable): Column =
    GraftSqlBridge.toColumn(
      BpeTokenCounts(GraftSqlBridge.toExpression(words), table))
}
