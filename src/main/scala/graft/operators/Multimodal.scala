package graft.operators
import graft.QueryDef
object Multimodal {
  val all: Seq[QueryDef] = Seq()
}
