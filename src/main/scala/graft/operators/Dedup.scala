package graft.operators
import graft.QueryDef
object Dedup {
  val all: Seq[QueryDef] = Seq()
}
