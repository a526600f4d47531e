package graft.queries
object TextQueries {
  val queries: Seq[Q] = Seq()
}
