package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Behavioral pins for q134 sub-document segment dedup, independent of
  * the DuckDB oracle: a planted corpus with known duplicate segments
  * pins keep-first semantics and the fixed-offset alignment caveat,
  * and a corpus-level invariant ties survivor count to the distinct
  * segment count on real data. */
class SegmentDedupSpec extends SparkSpec {

  /** planted corpus: doc 2 is an exact copy of doc 1 (every aligned
    * K=3 segment dups), doc 3 is unique, doc 4 repeats doc 1's run
    * shifted by ONE token — no aligned segment matches, so fixed-
    * offset segmentation keeps all of it (the documented Lee et al.
    * limitation; production mitigates with overlapping windows). */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = Scratch.tempDirDeletedOnExit("graft_segdedup")
    Seq(
      (1L, "a b c d e f", "en", "srcA", 11L),
      (2L, "a b c d e f", "en", "srcB", 11L),
      (3L, "x y z w", "en", "srcC", 7L),
      (4L, "p a b c d e f", "en", "srcD", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("keep-first: an exact-copy doc loses every segment to the lower id") {
    val rows = Registry.byName("q134_segment_dedup").run(spark, plantedDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // srcA (doc 1): 2 segments ("a b c", "d e f"), all kept
    assert(rows("srcA") == ((2L, 2L, 6L, 6L, 0L)), rows("srcA"))
    // srcB (doc 2, exact copy): both segments removed, checksum 2+2
    assert(rows("srcB") == ((2L, 0L, 6L, 0L, 4L)), rows("srcB"))
    // srcC (doc 3, unique): 2 segments ("x y z", "w"), all kept
    assert(rows("srcC") == ((2L, 2L, 4L, 4L, 0L)), rows("srcC"))
  }

  test("fixed-offset alignment: a one-token shift escapes segment dedup") {
    val rows = Registry.byName("q134_segment_dedup").run(spark, plantedDir)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(6)))
      .toMap
    // srcD (doc 4) repeats doc 1's tokens shifted by one: segments
    // "p a b", "c d e", "f" share no aligned content — all 3 kept
    assert(rows("srcD") == ((3L, 0L)), rows("srcD"))
  }

  test("invariant: corpus-wide survivors == distinct segments (sf0.001)") {
    val out = Registry.byName("q134_segment_dedup").run(spark, sf)
    val kept = out.agg(sum("segs_kept")).collect()(0).getLong(0)
    val total = out.agg(sum("segs_total")).collect()(0).getLong(0)
    // keep-first retains exactly one occurrence per distinct segment
    val distinctSegs = graft.Tables.documents(spark, sf)
      .select(explode(expr(
        "transform(sequence(0, (size(split(text, ' ')) - 1) div 3), " +
          "j -> concat_ws(' ', slice(split(text, ' '), j*3 + 1, 3)))"))
        .as("seg"))
      .agg(countDistinct("seg")).collect()(0).getLong(0)
    assert(kept == distinctSegs, s"kept=$kept distinct=$distinctSegs")
    assert(kept <= total)
  }
}
