package graft

object TextQueries {
  def defs: Map[String, QueryDef] = Map()
}
