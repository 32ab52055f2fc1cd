package graft

object SimilarityQueries {
  def defs: Map[String, QueryDef] = Map()
}
