package graft

object PatternQueries {
  def defs: Map[String, QueryDef] = Map()
}
