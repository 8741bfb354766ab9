package graft.operators
import graft.QueryDef
object SortLimit {
  val all: Seq[QueryDef] = Seq()
}
