package graft.queries
object SimilarityQueries {
  val queries: Seq[Q] = Seq()
}
