package graft.operators
import graft.QueryDef
object TextAnalysis {
  val all: Seq[QueryDef] = Seq()
}
