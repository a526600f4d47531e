package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata layout
  * (TESTDATA.md): one parquet file per table under an sf directory.
  *
  * All queries read through here so scans stay uniform: column pruning
  * and predicate pushdown reach the parquet reader via Catalyst — do not
  * cache or materialize at this layer.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    parquetCached(spark, s"$dir/$name.parquet")

  private val schemaCache = new java.util.concurrent
    .ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** schema-cached parquet read: static tables and persisted indexes
    * are read MANY times per session (every warm serve re-opens
    * dict/stats/postings/manifest), and each bare spark.read.parquet
    * pays a 1-task schema-inference job per call — measured 16 of
    * q187's 64 warm-serve jobs. Caching the inferred schema per
    * (path, mtime, size) makes warm reads job-free at the reader
    * while a regenerated fixture still re-infers. Columnar pruning
    * and pushdown are unaffected — only inference is skipped. */
  def parquetCached(spark: SparkSession, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(fingerprint(path),
      _ => spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** freshness key for a parquet file OR directory: a directory's own
    * length is a filesystem constant and its mtime granularity can be
    * a full second, so an in-place rewrite within one tick could
    * serve a stale cache entry — fold in the children's (name, mtime,
    * size) instead. One driver-side listing, no job. */
  private[graft] def fingerprint(path: String): String = {
    val f = new java.io.File(path)
    val kids = Option(f.listFiles()).getOrElse(Array.empty)
      .map(c => s"${c.getName}:${c.lastModified}:${c.length}")
      .sorted.mkString(",")
    s"$path:${f.lastModified}:${f.length}:${kids.hashCode}"
  }

  /** events.parquet has shipped with two `ts` physical layouts across
    * testdata generations: INT64 TIMESTAMP(NANOS) (readable only as
    * long nanos under the legacy nanosAsLong conf) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (surfacing as
    * TIMESTAMP_NTZ). Read with the legacy conf on (harmless for
    * micros) and normalize whatever arrives to one session-tz
    * TimestampType column, so every query sees the same `ts`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(parquetCached(s, s"$d/events.parquet"))
  }

  /** Schema-sensitive `ts` normalization (shared with the streaming
    * source): long nanos → microsecond TimestampType (integer `div`,
    * NOT `/` — double division loses precision at 1e18 ns); NTZ (or
    * any timestamp flavor) → session-tz timestamp, a value-identical
    * relabel under the project-wide UTC session timezone. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private val eventRowCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Partition count for materialized (localCheckpoint) per-user rep
    * tables that feed probe-grid fits: one partition per ~250k source
    * event rows, capped at the session's parallelism. The rowcount is
    * ONE count job over the raw parquet (column-pruned to zero columns,
    * so the scan serves it from row-group metadata rather than data
    * pages), memoized per sf dir so repeated q76/q88/q91 invocations
    * don't re-run it. At sf0.1 this stays 1 (the rep table is a few
    * thousand rows — more partitions would only add scheduling overhead
    * to tiny fits); at 100× the checkpoint fans out so grid fits read a
    * parallel input instead of one task. */
  def checkpointPartitions(s: SparkSession, d: String): Int = {
    val eventRows: Long = eventRowCache.computeIfAbsent(d,
      _ => {
        // same nanosAsLong guard as `events` — without it a FRESH
        // session whose first events touch is this count would throw on
        // the INT64 TIMESTAMP(NANOS) column during schema conversion
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(s"$d/events.parquet").count()
      })
    val target = math.max(1L, eventRows / 250000L)
    math.min(target, s.sparkContext.defaultParallelism.toLong).toInt
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
