package graft

object RelationalQueries {
  def defs: Map[String, QueryDef] = Map()
}
