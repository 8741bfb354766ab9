package graft.operators
import graft.QueryDef
object Similarity {
  val all: Seq[QueryDef] = Seq()
}
