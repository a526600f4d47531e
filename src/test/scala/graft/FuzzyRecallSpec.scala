package graft

import org.apache.spark.sql.functions._

/** Quality contract for the q119 edit-distance fuzzy-dedup blocking
  * (the analogue of LshRecallSpec/AnnRecallSpec for the Levenshtein
  * family): on a PLANTED corpus of (original, perturbed) near-dup pairs
  * the production candidate generator must recover ≥ 0.9 of the true
  * pairs — including the adversarial case the home-band-only blocking
  * provably misses, a pair whose lengths straddle a length÷32 band
  * boundary (63 vs 65 chars land in bands 1 and 2). The generator
  * probes each probe's two adjacent bands for exactly this reason.
  */
class FuzzyRecallSpec extends SparkSpec {

  import graft.queries.DedupQueries

  /** deterministic filler text: repeated "w<i>" words cut to `len`
    * chars, prefixed with a per-doc first token (the block key). */
  private def doc(tag: String, len: Int): String = {
    val body = (0 until 40).map(i => s"w$i").mkString(" ")
    (tag + " " + body).take(len)
  }

  test("planted fuzzy pairs: recall >= 0.9, boundary-straddlers included") {
    val s = spark
    import s.implicits._

    // 20 originals with lengths marching across the 32-char band grid
    // (48..105), each with one perturbed near-dup: 4 chars inserted
    // after the first token — edit distance 4 on the 64-char prefix,
    // same first token, length pushed ACROSS a band boundary for the
    // originals sitting within 4 chars of one (60..63, 92..95, ...).
    val originals = (0 until 20).map { i =>
      (i.toLong, doc(s"t$i", 48 + 3 * i))
    }
    val perturbed = originals.map { case (id, text) =>
      val sp = text.indexOf(' ')
      (id + 1000L, text.substring(0, sp) + " XYZ" + text.substring(sp))
    }
    val corpus = (originals ++ perturbed).toDF("doc_id", "text")
    val straddlers = originals.filter { case (_, t) =>
      t.length / 32 != (t.length + 4) / 32
    }.map(_._1)
    assert(straddlers.nonEmpty, "corpus plants no boundary-straddling pair")

    val probes = originals.map(_._1).toDF("doc_id")
    val found = DedupQueries.fuzzyCandidates(corpus, probes)
      .select($"probe_id", $"match_id").as[(Long, Long)].collect().toSet

    val truePairs = originals.map { case (id, _) => (id, id + 1000L) }
    val recall = truePairs.count(found.contains).toDouble / truePairs.size
    assert(recall >= 0.9, s"fuzzy recall $recall " +
      s"(${truePairs.count(found.contains)}/${truePairs.size})")
    straddlers.foreach { id =>
      assert(found.contains((id, id + 1000L)),
        s"boundary-straddling pair ($id, ${id + 1000L}) missed")
    }
  }

  test("candidates stay within the edit-distance contract (precision)") {
    val s = spark
    import s.implicits._
    val corpus = (0 until 8).map(i => (i.toLong, doc(s"t${i % 2}", 80 + i)))
      .toDF("doc_id", "text")
    val probes = corpus.select($"doc_id")
    val rows = DedupQueries.fuzzyCandidates(corpus, probes).collect()
    // every emitted candidate must satisfy dist <= 16 and share tok1
    rows.foreach(r => assert(r.getAs[Int]("dist") <= 16))
    // and no self-pairs
    rows.foreach(r =>
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("match_id")))
  }
}
