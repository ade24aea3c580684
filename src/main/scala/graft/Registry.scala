package graft

import graft.core.QueryDef
import graft.operators._

/** Single registry of every declared operator/query (SURVEY.md §2.B plus
  * the training-pipeline extensions). SparkEntry derives the driver maps
  * from here, so a query and its oracle can never drift apart.
  */
object Registry {
  val all: Seq[(String, QueryDef)] =
    ScanQueries.defs ++ CdcQueries.defs ++ JoinQueries.defs ++
      AggQueries.defs ++ WindowQueries.defs ++ StreamQueries.defs ++
      TextQueries.defs ++ SimilarityQueries.defs ++ MultimodalQueries.defs

  require(all.map(_._1).distinct.size == all.size, "duplicate query key")
}
