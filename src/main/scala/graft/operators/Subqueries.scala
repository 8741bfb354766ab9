package graft.operators
import graft.QueryDef
object Subqueries {
  val all: Seq[QueryDef] = Seq()
}
