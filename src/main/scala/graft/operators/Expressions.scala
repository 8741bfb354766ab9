package graft.operators
import graft.QueryDef
object Expressions {
  val all: Seq[QueryDef] = Seq()
}
