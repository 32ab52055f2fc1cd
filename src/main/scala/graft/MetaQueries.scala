package graft

object MetaQueries {
  def defs: Map[String, QueryDef] = Map()
}
