package graft.operators

import graft.GraftQuery

object Multimodal {
  val all: Seq[GraftQuery] = Seq()
}
