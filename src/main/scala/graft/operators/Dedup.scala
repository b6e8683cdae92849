package graft.operators

import graft.GraftQuery

object Dedup {
  val all: Seq[GraftQuery] = Seq()
}
