package graft.text

/** THE JVM reference for the replace-chain encoder's semantics — shared
  * by BpeScaledSpec and BpeEncodeProps so the equivalence contract has
  * exactly one right-hand side: wrap chars, then one left-to-right
  * `String.replace` per merge in rank order, exactly what
  * [[Bpe.applyMerges]] compiles into Catalyst, minus the expression
  * tree.
  */
object BpeChainRef {
  def apply(word: String, pairs: Seq[(String, String)]): String = {
    val wrapped = word.map(c => s"<$c>").mkString
    pairs.foldLeft(wrapped) { case (s, (l, r)) =>
      s.replace(s"<$l><$r>", s"<$l$r>")
    }
  }

  def apply(word: String, merges: Seq[Bpe.Merge])(implicit d: DummyImplicit): String =
    apply(word, merges.sortBy(_.rank).map(m => (m.left, m.right)))
}
