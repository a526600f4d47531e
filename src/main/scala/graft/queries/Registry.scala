package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Contract (driver's Verify/correctness gate):
  *  - the Spark result and the oracle result must agree on column NAMES
  *    (compare sorts columns by name before hashing) and values;
  *  - results must be deterministic: every query ends in a total ORDER BY
  *    and every derived double is round()ed identically on both sides;
  *  - queries whose semantics are not SQL-expressible (iterative ML
  *    model fits: q63/q64/q65/q66/q76/q88/q91) or not cross-engine
  *    deterministic (the true `rand(seed)` dropout path q102, whose
  *    draws depend on partition layout) carry no oracle and get a
  *    rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  lazy val all: Seq[Q] =
    Relational.queries ++
      Series.queries ++
      SeqQueries.queries ++
      CpcQueries.queries ++
      TrajectoryQueries.queries ++
      TimeSeriesQueries.queries ++
      StreamingQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      MultimodalQueries.queries ++
      MlQueries.queries

  lazy val byName: Map[String, Q] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
