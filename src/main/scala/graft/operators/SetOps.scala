package graft.operators
import graft.QueryDef
object SetOps {
  val all: Seq[QueryDef] = Seq()
}
