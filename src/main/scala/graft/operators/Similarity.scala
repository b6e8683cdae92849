package graft.operators

import graft.GraftQuery

object Similarity {
  val all: Seq[GraftQuery] = Seq()
}
