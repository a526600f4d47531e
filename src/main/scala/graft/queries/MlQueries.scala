package graft.queries
object MlQueries {
  val queries: Seq[Q] = Seq()
}
