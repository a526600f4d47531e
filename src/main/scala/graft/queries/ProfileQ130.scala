package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling main for q130 phase timing (not registered). */
object ProfileQ130 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    s.read.parquet(s"$dir/documents.parquet").count()
    val screen = DedupQueries.BloomScreen
    val blob = t("benchBlob (1st)") { screen.benchBlob(s, dir) }
    t("benchBlob (2nd)") { screen.benchBlob(s, dir) }
    t("batch screen") {
      screen.withShingles(
          screen.withBenchSplit(s.read.parquet(s"$dir/documents.parquet")
            .select("doc_id", "text", "source"))
          .filter(col("hx") >= screen.BenchMax))
        .filter(!exists(col("shs"),
          sh => graft.expr.GraftFunctions.bloomContains(s, lit(blob), sh)))
        .select(col("doc_id"), col("source"))
        .write.mode("overwrite").format("noop").save()
    }
    t("full q130 (stream)") {
      Registry.byName("q130_stream_decontaminate")
        .run(s, dir).write.mode("overwrite").format("noop").save()
    }
    t("full q130 again") {
      Registry.byName("q130_stream_decontaminate")
        .run(s, dir).write.mode("overwrite").format("noop").save()
    }
    s.stop()
  }
}
