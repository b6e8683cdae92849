package graft.operators

import graft.GraftQuery

object CdcQueries {
  val all: Seq[GraftQuery] = Seq()
}
