package graft.queries
object Series {
  val queries: Seq[Q] = Seq()
}
