package graft.operators
import graft.QueryDef
object Windows {
  val all: Seq[QueryDef] = Seq()
}
