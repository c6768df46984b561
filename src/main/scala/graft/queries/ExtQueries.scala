package graft.queries

import graft.{GQuery, QueryGroup}

/** LLM-data-pipeline extension operators (BASELINE.json north star):
  * dedup, similarity search, text analysis, multimodal plumbing,
  * streaming. Populated milestone by milestone.
  */
object ExtQueries extends QueryGroup {
  override val queries: Seq[GQuery] = Seq()
}
