package graft

import graft.queries.{Registry, TextQueries}

/** q191's unigram-LM chain on a corpus where the optimum is computable
  * by hand, plus non-vacuity on the real corpus (the registry gate
  * pins cross-engine equality; this pins the SEMANTICS — seed counts,
  * Viterbi choice, EM recount). */
class UnigramSpec extends SparkSpec {

  test("worked example: seed counts, Viterbi picks the whole-word piece, M-step recounts") {
    import spark.implicits._
    // corpus: "ab ab b" — words ab(×2), b(×1).
    // substrings (occurrence-weighted): a ← 2 (in ab twice),
    // b ← 3 (in ab twice + bare b), ab ← 2. All are vocab (singles
    // a, b kept; ab is the only multi-char candidate). T0 = 7.
    // cost(ab) = cost(a) = −ln(2/7) > cost(b) = −ln(3/7); the
    // segmentation "ab" = [ab] costs −ln(2/7) while [a|b] costs
    // −ln(2/7) − ln(3/7) — strictly worse, so Viterbi keeps the
    // whole word. M-step: f1(ab) = 2, f1(b) = 1, f1(a) = 0.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val (words, vocab, best) = TextQueries.unigramChain(docs)
    assert(words.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet == Set(("ab", 2L), ("b", 1L)))
    val v = vocab.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v.keySet == Set("a", "b", "ab"), v)
    assert(v("a")._1 == 2L && v("b")._1 == 3L && v("ab")._1 == 2L, v)
    // same seed frequency ⇒ same integer cost; rarer ⇒ costlier
    assert(v("a")._2 == v("ab")._2 && v("b")._2 < v("a")._2, v)
    val b = best.collect()
      .map(r => r.getString(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(b == Map("ab" -> ((1, "ab")), "b" -> ((1, "b"))), b)
  }

  test("unseen multi-char pieces fall back to single-char segmentation") {
    import spark.implicits._
    // "xy" appears once among high-frequency filler so 'xy' misses the
    // top-V cut only if V is exceeded — with V=48 everything fits, so
    // instead plant a word whose only segmentations mix: a 5-char word
    // has no single piece (UniMaxPiece = 4) and must split
    val docs = Seq((1L, "abcde abcde")).toDF("doc_id", "text")
    val (_, _, best) = TextQueries.unigramChain(docs)
    val b = best.collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(3))).head
    // optimal is 2 pieces (one ≤4-char split); exhaustive enumeration
    // guarantees no 1-piece answer exists for len 5
    assert(b._1 == "abcde" && b._2 == 2, b)
  }

  test("q195 round 2: re-costing from Viterbi counts, unused single kept at the sentinel") {
    import spark.implicits._
    // "ab ab b" (the worked example): round-1 Viterbi used ab(2), b(1)
    // and never a. Round 2 keeps a (single-char floor, sentinel cost),
    // re-costs from T1 = 3: cost(ab) = ln(3/2) -> 405465 micro-units,
    // cost(b) = ln(3) -> 1098612; the second E-step is a fixed point
    // (f2 = f1).
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val rows = TextQueries.unigramRound2(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("a", "b", "ab"), rows)
    assert(rows("ab") == ((2L, 405465L, 2L)), rows("ab"))
    assert(rows("b") == ((1L, 1098612L, 1L)), rows("b"))
    assert(rows("a")._1 == 0L && rows("a")._3 == 0L &&
      rows("a")._2 > 1000000000L, rows("a"))
  }

  test("q195 pruning: a seeded multi-char piece the Viterbi never used is dropped") {
    import spark.implicits._
    // "abc abc": the seed vocabulary contains ab, bc, abc (each f0=2)
    // but round-1 Viterbi segments [abc] whole — ab and bc end round 1
    // with f1 = 0 and must be PRUNED, while abc survives at
    // cost2 = ln(2/2) = 0 and singles stay as the sentinel floor.
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val rows = TextQueries.unigramRound2(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("a", "b", "c", "abc"), rows)
    assert(rows("abc") == ((2L, 0L, 2L)), rows("abc"))
  }

  test("q202 EM-to-target: hand-computed deep prune (target 1, six rounds)") {
    import spark.implicits._
    // corpus "ab cd cd": seed f0 a1 b1 c2 d2 ab1 cd2 (T0 = 9); the
    // round-1 Viterbi keeps whole words (one piece beats two at these
    // costs) so f = {ab→1, cd→2, singles→0}. target = 1 ⇒ R =
    // ceil(log2(48)) = 6 rounds with caps 24,12,6,3,2,1: rounds 1-5
    // keep both multis (T = 3: cost(ab) = ln(3) → 1098612,
    // cost(cd) = ln(3/2) → 405465, unused singles at the sentinel);
    // round 6 caps at 1 ⇒ ab is pruned (lower count), cd survives at
    // cost ln(2/2) = 0.
    assert(TextQueries.uniPruneRounds(1) == 6)
    val docs = Seq((1L, "ab cd cd")).toDF("doc_id", "text")
    val rows = TextQueries.unigramToTarget(docs, 1).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val sentinel = 1000000000000L
    for (r <- 1L to 5L) {
      assert(rows((r, "ab")) == ((1L, 1098612L)), s"round $r ab")
      assert(rows((r, "cd")) == ((2L, 405465L)), s"round $r cd")
      Seq("a", "b", "c", "d").foreach { p =>
        assert(rows((r, p)) == ((0L, sentinel)), s"round $r $p")
      }
    }
    assert(rows((6L, "cd")) == ((2L, 0L)), rows.get((6L, "cd")))
    assert(!rows.contains((6L, "ab")), "ab survived the round-6 cap")
    assert(rows.size == 6 * 5 + 5, rows.size) // 6/round r1-5, 5 in r6
  }

  test("q202 on the real corpus: multi vocab reaches the target, singles never pruned") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sheet = Registry.byName("q202_unigram_to_target").run(spark, sf)
      .localCheckpoint(true)
    val rounds = TextQueries.uniPruneRounds(TextQueries.UniTarget)
    val multiPerRound = sheet
      .filter(length($"piece") > 1)
      .groupBy($"round").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multiPerRound.keySet == (1L to rounds.toLong).toSet)
    assert(multiPerRound(rounds.toLong) <= TextQueries.UniTarget.toLong,
      multiPerRound)
    // monotone non-increasing multi vocab across rounds
    (2L to rounds.toLong).foreach { r =>
      assert(multiPerRound(r) <= multiPerRound(r - 1), multiPerRound)
    }
    // the single-char floor is identical every round
    val singlesByRound = sheet.filter(length($"piece") === 1)
      .groupBy($"round").count().collect().map(_.getLong(1)).toSet
    assert(singlesByRound.size == 1, singlesByRound)
  }

  test("long-word guard: bounded Viterbi fold ≡ exhaustive enumeration per word") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, typedLit}
    // words up to the guard length, under a vocab with competing
    // multi-char pieces — every (cost, m, seg) struct must match the
    // exhaustive enumeration EXACTLY, tie-break included
    val words = Seq("a", "ab", "ba", "abcab", "banana", "abcdefgh",
      "aaaabbbb", "abab", "abcdabcdabcdabcd", "cdcdcdcd")
    val vocab = Map[String, Long]("a" -> 10L, "b" -> 20L, "c" -> 30L,
      "d" -> 40L, "e" -> 50L, "f" -> 60L, "g" -> 70L, "h" -> 80L,
      "n" -> 15L, "ab" -> 5L, "ba" -> 7L, "abc" -> 3L, "cd" -> 9L,
      "na" -> 6L, "nan" -> 4L, "abcd" -> 2L)
    val both = words.toDF("word").withColumn("pm", typedLit(vocab))
      .select($"word",
        expr(TextQueries.uniBestEnumExpr).as("e"),
        expr(TextQueries.uniBestFoldExpr).as("f"))
      .collect()
    both.foreach { r =>
      assert(r.get(1) == r.get(2), s"fold != enum for '${r.getString(0)}'")
    }
  }

  test("fold ≡ enumeration on 300 seeded-random (word, vocab) cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // the DP-equivalence claim is the subtlest proof in the chain
    // (the (cost, m, seg) tie-break must be preserved by appending a
    // fixed piece) — exercise it well beyond the hand-picked words:
    // random words over a small alphabet (lengths 1..14, so the
    // enumeration stays representable) against random vocabularies
    // with random integer costs, including vocabularies missing some
    // single chars (the UniBig fallback path) and duplicate-cost
    // pieces (ties decided by the seg string alone).
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    val cases = (1 to 300).map { _ =>
      val len = 1 + rnd.nextInt(14)
      val word = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val subs = (for {
        st <- 0 until len; w <- 1 to math.min(4, len - st)
      } yield word.substring(st, st + w)).distinct
      val vocab = subs.flatMap { p =>
        // singles kept with p=0.8, multis with p=0.5; costs collide
        // often (small range) to stress the tie-break
        val keep = if (p.length == 1) rnd.nextDouble() < 0.8
        else rnd.nextDouble() < 0.5
        if (keep) Some(p -> (100000L * (1 + rnd.nextInt(6)))) else None
      }.toMap
      (word, vocab)
    }
    val both = cases.toDF("word", "pm")
      .select($"word",
        expr(TextQueries.uniBestEnumExpr).as("e"),
        expr(TextQueries.uniBestFoldExpr).as("f"))
      .collect()
    both.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"fold != enum for '${r.getString(0)}': ${r.get(1)} vs ${r.get(2)}")
    }
  }

  test("a 64-char token routes through the fold instead of blowing up the E-step") {
    import spark.implicits._
    // pre-guard, this word OOMed/overflowed: 2^63 cut masks. Now it
    // takes the bounded fold: vocab seeds x/xx/xxx/xxxx from its own
    // substrings, and 16 × 'xxxx' is the provable optimum (minimum
    // piece count 64/4 = 16, and any shorter piece only adds pieces
    // at near-equal unit cost).
    val long = "x" * 64
    assert(long.length > TextQueries.UniEnumMax)
    val docs = Seq((1L, s"ab ab b $long")).toDF("doc_id", "text")
    val (_, _, best) = TextQueries.unigramChain(docs)
    val b = best.collect()
      .map(r => r.getString(0) -> ((r.getInt(2), r.getString(3)))).toMap
    assert(b(long) == ((16, Seq.fill(16)("xxxx").mkString("|"))), b(long))
    // the short words still take the (oracle-mirrored) enumeration path
    assert(b("ab") == ((1, "ab")), b("ab"))
  }

  test("q191/q192 non-vacuity on the real corpus: compression through multi-char pieces") {
    val vocabRows = Registry.byName("q191_unigram_train").run(spark, sf)
      .collect()
    assert(vocabRows.nonEmpty)
    // at least one multi-char piece survives the EM round with
    // nonzero Viterbi count — the tokenizer actually compresses
    assert(vocabRows.exists(r =>
      r.getString(0).length > 1 && r.getLong(3) > 0), "no multi-char use")
    val enc = Registry.byName("q192_unigram_encode").run(spark, sf)
      .collect()
    assert(enc.nonEmpty)
    // optimal segmentation beats character splitting: > 1 char/token
    assert(enc.forall(r => r.getDouble(4) > 1.0), enc.mkString("\n"))
  }

  test("soft EM: hand-computed forward-backward, divergence from hard EM, conservation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus: "ab ab ab a b" — words ab(×3), a(×1), b(×1).
    // seed: f0(a) = 3+1 = 4, f0(b) = 3+1 = 4, f0(ab) = 3; t0 = 11.
    val docs = Seq((1L, "ab ab ab a b")).toDF("doc_id", "text")
    val soft = TextQueries.uniSoftRounds(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // replicate the DP with the SAME doubles and association
    val (pa, pb, pab) = (4.0 / 11, 4.0 / 11, 3.0 / 11)
    // word "ab": α_1 = α_0·p(a); α_2 = (α_1·p(b)) + (α_0·p(ab))
    val a1 = 0.0 + 1.0 * pa
    val z = (0.0 + a1 * pb) + 1.0 * pab
    // β_1 = p(b)·β_2; edges (1,1)=a, (1,2)=ab, (2,2)=b
    val b1 = 0.0 + pb * 1.0
    def c6(occ: Double, wc: Double): Long =
      math.floor(occ * wc * 1e6 + 0.5).toLong
    val eA = c6(1.0 * pa * b1 / z, 3.0) + c6(1.0 * pa * 1.0 / pa, 1.0)
    val eB = c6(a1 * pb * 1.0 / z, 3.0) + c6(1.0 * pb * 1.0 / pb, 1.0)
    val eAb = c6(1.0 * pab * 1.0 / z, 3.0)
    assert(soft((1L, "a")) == eA, (soft((1L, "a")), eA))
    assert(soft((1L, "b")) == eB)
    assert(soft((1L, "ab")) == eAb)
    // DIVERGENCE from hard EM: Viterbi segments every "ab" as [ab]
    // (one rare piece beats two), so hard f1(a) = 1 (the bare "a")
    // — but the soft E-step credits 'a' fractionally from "ab" too
    val hard = TextQueries.unigramChain(docs)._3.collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(hard("ab") == "ab") // the hard path takes the whole word
    assert(soft((1L, "a")) > 1000000L, soft) // > the hard count of 1·1e6
    // CONSERVATION: each char position is covered by exactly one piece
    // in every segmentation, so Σ e6(piece)·len(piece) ≈ 1e6 · total
    // chars (5 floor-rounded edge terms → slack ≤ 3)
    val lenSum = soft.collect { case ((1L, p), e) => p.length * e }.sum
    assert(math.abs(lenSum - 8000000L) <= 3L, lenSum)
    // round 2 exists, stays conservative, and re-weights
    val r2 = soft.collect { case ((2L, p), e) => p -> e }
    assert(r2.nonEmpty)
    val lenSum2 = r2.map { case (p, e) => p.length * e }.sum
    assert(math.abs(lenSum2 - 8000000L) <= 3L, lenSum2)
    assert(r2.toMap != soft.collect { case ((1L, p), e) => p -> e }.toMap)
  }

  test("q210: the soft prune keeps Viterbi-unused pieces that hard EM drops") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus "abc abc abc": Viterbi always takes the whole word
    // ([abc] costs one −ln(3/18), every split strictly more), so hard
    // EM counts f1(ab) = f1(bc) = 0 and q195/q202 PRUNE them; the
    // soft E-step credits both from runner-up segmentations
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val soft = TextQueries.uniSoftToTarget(docs, 16)
      .filter($"round" === 1L).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(soft.contains("ab") && soft("ab") > 0L, soft)
    assert(soft.contains("bc") && soft("bc") > 0L, soft)
    assert(soft.contains("abc") && soft("abc") > soft("ab"), soft)
    val hard = TextQueries.unigramRound2(docs).collect()
      .map(_.getString(0)).toSet
    assert(!hard.contains("ab") && !hard.contains("bc"),
      s"hard EM kept the unused pieces: $hard")
    // the divergence is exactly the soft-EM selling point: mass from
    // non-optimal segmentations keeps candidate pieces alive
  }

  test("q210 on the real corpus: reaches the multi-vocab target, singles never pruned") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val sheet = TextQueries.uniSoftToTarget(docs, 16).localCheckpoint(true)
    val rounds = sheet.agg(max($"round")).collect()(0).getLong(0)
    val lastMulti = sheet.filter($"round" === rounds &&
      length($"piece") > 1).count()
    assert(lastMulti <= 16, lastMulti)
    // every single-char piece of round 1 survives to the last round
    val s1 = sheet.filter($"round" === 1L && length($"piece") === 1)
      .select($"piece").collect().map(_.getString(0)).toSet
    val sR = sheet.filter($"round" === rounds && length($"piece") === 1)
      .select($"piece").collect().map(_.getString(0)).toSet
    assert(s1 == sR && s1.nonEmpty)
  }

  test("soft EM fold ≡ independent Scala forward-backward on 150 seeded-random cases") {
    import spark.implicits._
    // the registry gate pins Spark ≡ DuckDB; this pins BOTH against a
    // third, independently-written reference (same pinned order — the
    // contract), so a shared-spelling bug in the two SQL DPs can't
    // hide. Random words over a 3-letter alphabet, random sub-vocab.
    val rnd = new scala.util.Random(42)
    val M = 4
    val unk = 1e-12
    def reference(word: String, p: Map[String, Double],
        wc: Long): Map[String, Long] = {
      val L = word.length
      def pOf(piece: String) = p.getOrElse(piece, unk)
      val al = new Array[Double](L + 1); al(0) = 1.0
      for (i <- 1 to L) {
        var s = 0.0
        for (k <- 1 to math.min(M, i))
          s = s + al(i - k) * pOf(word.substring(i - k, i))
        al(i) = s
      }
      val bl = new Array[Double](L + 1); bl(L) = 1.0
      for (i <- (L - 1) to 0 by -1) {
        var s = 0.0
        for (k <- 1 to math.min(M, L - i))
          s = s + pOf(word.substring(i, i + k)) * bl(i + k)
        bl(i) = s
      }
      val z = al(L)
      val occ = for {
        st <- 1 to L; en <- st to math.min(L, st + M - 1)
        piece = word.substring(st - 1, en)
      } yield piece -> math.floor(
        al(st - 1) * pOf(piece) * bl(en) / z * wc.toDouble * 1e6 + 0.5)
        .toLong
      occ.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    }
    val cases = (1 to 150).map { i =>
      val len = 1 + rnd.nextInt(9)
      val word = Seq.fill(len)("abc" (rnd.nextInt(3))).mkString
      val wc = 1L + rnd.nextInt(20)
      // random sub-vocab of the word's substrings with random probs
      val subs = (for {
        st <- 0 until len; en <- st + 1 to math.min(len, st + M)
      } yield word.substring(st, en)).distinct
      val vocab = subs.filter(_ => rnd.nextBoolean())
        .map(s => s -> (0.001 + rnd.nextInt(999) / 1000.0)).toMap
      (i.toLong, word, wc, vocab)
    }
    for ((i, word, wc, vocab) <- cases) {
      val words = Seq((word, wc)).toDF("word", "wc")
      val vp = vocab.toSeq.toDF("piece", "p")
      val got = TextQueries.uniSoftEStep(words, vp).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ref = reference(word, vocab, wc)
      val refKeyed = ref.toSeq
        .map { case (k, v) => (if (vocab.contains(k)) k else "<unk>") -> v }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      assert(got == refKeyed,
        s"case $i word=$word wc=$wc vocab=$vocab:\n $got\n vs $refKeyed")
    }
  }

  test("soft EM pools out-of-vocab mass under <unk> and stays conservative there") {
    import spark.implicits._
    // a corpus whose substring count exceeds UniV = 48 multi-char
    // pieces, so some lattice edges are out-of-vocab: 26 distinct
    // 4-char words of distinct letters → 26·(3+2+1) = 156 multi
    // candidates, only 48 kept
    val ws = ('a' to 'z').map(c => s"$c${(c + 1).toChar}x${(c + 2).toChar}")
    val docs = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
    val soft = TextQueries.uniSoftRounds(docs)
      .filter(org.apache.spark.sql.functions.col("round") === 1L)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(soft.contains("<unk>"), soft.keySet)
    assert(soft("<unk>") > 0L)
  }
}
