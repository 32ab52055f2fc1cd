package graft

object DedupQueries {
  def defs: Map[String, QueryDef] = Map()
}
