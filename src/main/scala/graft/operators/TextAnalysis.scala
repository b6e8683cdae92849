package graft.operators

import graft.GraftQuery

object TextAnalysis {
  val all: Seq[GraftQuery] = Seq()
}
