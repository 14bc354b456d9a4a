package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-12 training ops the DuckDB oracle can't
  * fully pin:
  *
  *  - bpe_train's relational merge pass (run-start cumsum + parity =
  *    greedy left-to-right) A/B'd against an independent scalar BPE
  *    trainer (the Sennrich reference algorithm, reimplemented here from
  *    the paper) on an adversarial planted vocabulary — overlap chains
  *    ("aaaa" under (a,a)), election ties, merged-token re-matching.
  *    The oracle proves Spark ≡ DuckDB on the SAME algebra; this proves
  *    the algebra ≡ the algorithm.
  *
  *  - dsir_select's importance direction: documents made of target-only
  *    vocabulary must outrank documents of off-target vocabulary, and
  *    the model join must stay broadcast (the ≤ B-row side never
  *    shuffles the corpus).
  */
class BpeDsirSpec extends AnyFunSuite with SparkSuite {

  /** Independent reference BPE (Sennrich, Haddow & Birch 2016, alg. 1):
    * count adjacent pairs over the word-frequency dict (overlaps
    * included), elect max count with (left, right) lexicographic
    * tiebreak, replace greedily left-to-right, repeat. */
  private def refBpe(words: Map[String, Long], k: Int)
      : Seq[(String, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] = words.toSeq.map {
      case (w, f) => (w.map(_.toString).toVector :+ "</w>", f)
    }
    val out = collection.mutable.Buffer[(String, String, String, Long)]()
    for (_ <- 1 to k) {
      val counts =
        collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((toks, f) <- vocab; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) += f
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) =>
          (-n, x, y)
        }
        out += ((a, b, a + b, c))
        vocab = vocab.map { case (toks, f) =>
          val nb = collection.mutable.Buffer[String]()
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += toks(i); i += 1 }
          }
          (nb.toVector, f)
        }
      }
    }
    out.toSeq
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-spec")
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("bpe_train matches the scalar Sennrich reference on adversarial words") {
    // overlap chains (aaaa/aaa), tie candidates, re-matching merged
    // tokens (abab: after (a,b)->ab, pair (ab,ab) becomes electable)
    val text = "aaaa aaa abab abab ab ba baa aab aaaa abab xyxy xy yx"
    val dir = writeDocs(Seq((1L, text, "en"), (2L, text + " aaaa abab", "de")))
    val words = (text.split(" ") ++ (text + " aaaa abab").split(" "))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val expect = refBpe(words, 6)
    val got = Queries.byName("bpe_train").build(spark, dir)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .toSeq
    assert(got == expect, s"\n got: $got\n exp: $expect")
  }

  test("bpeLoop at depth 40 matches the scalar Sennrich reference and " +
    "stops at convergence (parameterized depth, r14: a tokenizer's " +
    "ladder is hundreds of merges, not the board's 6)") {
    import spark.implicits._
    val text = "aaaa aaa abab abab ab ba baa aab aaaa abab xyxy xy yx " +
      "zqzq zq qz banana bandana and ana nan"
    val words = text.split(" ").groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val vocab = words.toSeq.toDF("word", "freq")
    // this vocabulary fully merges in exactly 32 rounds, so depth 40
    // exercises BOTH the deep ladder and the convergence stop
    val expect = refBpe(words, 40)
    val (merges, _) = QueriesPipeline.bpeLoop(vocab, 40)
    val got = merges.reduce(_ unionByName _).orderBy("rank").collect()
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .toSeq
    assert(got == expect, s"\n got: $got\n exp: $expect")
    // the loop must stop at convergence instead of burning rounds 34-40
    assert(got.length == 32 && got.length == expect.length)
    assert(merges.length <= got.length + 1,
      s"loop ran ${merges.length} rounds for ${got.length} merges — " +
        "convergence did not stop it")
  }

  test("batched bpeLoop at depth 128 matches the scalar Sennrich " +
    "reference exactly AND needs far fewer passes than merges (r15: " +
    "the strict-cut disjoint batch is the path to real 32k-merge " +
    "depth; ties degrade the batch width, never the answer)") {
    import spark.implicits._
    // Zipf-ish synthetic vocabulary: 400 syllable words with spread
    // frequencies (mod-97 residues), so top counts rarely tie and the
    // batch actually fills — plus the organic tie/overlap hazards the
    // smaller fixtures plant
    val syll = Vector("ba", "na", "to", "ri", "ku", "me", "zo", "pi",
      "la", "du")
    val words: Map[String, Long] = (0 until 400).map { i =>
      val w = syll(i % 10) + syll((i / 10) % 10) + syll((i / 100) % 4) +
        ("s" * (i % 3))
      w -> (1L + (i * 37) % 97)
    }.toMap
    val expect = refBpe(words, 128)
    assert(expect.length == 128, s"fixture converged early: ${expect.length}")
    val vocab = words.toSeq.toDF("word", "freq")
    val (mergeFrames, _) = QueriesPipeline.bpeLoop(vocab, 128, batch = 8)
    val got = mergeFrames.reduce(_ unionByName _).orderBy("rank").collect()
      .map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
      .toSeq
    assert(got == expect,
      s"\n got: ${got.take(20)}...\n exp: ${expect.take(20)}...")
    // the batching must be REAL: 128 merges in well under 128 passes.
    // This 10-syllable fixture is adversarial for disjointness (every
    // top pair shares one of a handful of characters early on), so the
    // width here (~2/pass) is the FLOOR — the 16-char-alphabet
    // big-vocab probe rung is where the ~B× win shows (BPE_DEPTH_r15)
    assert(mergeFrames.length <= 96,
      s"${mergeFrames.length} passes for 128 merges — batch never filled")
  }

  test("bpeEncode replays frozen merges on unseen words identically " +
    "to the scalar tokenizer (the runtime half: no election, rank " +
    "order, greedy left-to-right per merge)") {
    import spark.implicits._
    val trainText = "aaaa aaa abab abab ab ba baa aab aaaa abab xyxy xy yx"
    val trainWords = trainText.split(" ").groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val merges = refBpe(trainWords, 6).map(m => (m._1, m._2))
    assert(merges.nonEmpty)
    // unseen: never-trained words where learned merges partially
    // apply, overlap-chain, or don't apply at all
    val unseen = Seq("aaaaaaa", "abba", "xyab", "zzz", "ababab")
    def scalarEncode(w: String): Seq[String] = {
      var toks = w.map(_.toString).toVector :+ "</w>"
      for ((a, b) <- merges) {
        val nb = Vector.newBuilder[String]; var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += toks(i); i += 1 }
        }
        toks = nb.result()
      }
      toks
    }
    val vocab = unseen.map(w => (w, 1L)).toDF("word", "freq")
    val got = QueriesPipeline.bpeEncode(vocab, merges)
      .orderBy("w", "i").collect()
      .map(r => (r.getAs[String]("w"), r.getAs[String]("tok")))
      .groupBy(_._1).map { case (w, rows) => w -> rows.map(_._2).toSeq }
    unseen.foreach { w =>
      assert(got(w) == scalarEncode(w),
        s"$w: got ${got(w)} expected ${scalarEncode(w)}")
    }
  }

  test("bpe_train greedy overlap parity: aaa under (a,a) merges once") {
    // one word "aaa" x3 plus noise that keeps (a,a) the top pair:
    // round 1 must elect (a,a) with count 2*3 (overlap included) and
    // the merged word must become [aa, a, </w>] — visible in round 2's
    // election moving to (aa, a) over this vocab
    val dir = writeDocs(Seq((1L, "aaa aaa aaa", "en")))
    val got = Queries.byName("bpe_train").build(spark, dir)
      .orderBy("rank").collect()
    val expect = refBpe(Map("aaa" -> 3L), 6)
    val gotT = got.map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt"),
      r.getAs[String]("merged"), r.getAs[Long]("pair_count"))).toSeq
    assert(gotT == expect, s"\n got: $gotT\n exp: $expect")
    assert(gotT.head == (("a", "a", "aa", 6L)), gotT.head)
    // convergence BEFORE round K must not annihilate the token frame
    // (rounds 4-6 elect nothing; a cross join with the empty election
    // would empty `fin` and the fertility report with it): the fully
    // merged word is ONE token -> fertility exactly 10000 bp
    val fert = Queries.byName("bpe_fertility").build(spark, dir).collect()
    assert(fert.length == 1)
    assert(fert.head.getAs[Long]("fertility_bp") == 10000L, fert.head)
  }

  test("dsir_select ranks target-vocabulary docs above off-target docs") {
    // target model = lang 'en' docs; qq-vocabulary is en-only,
    // zz-vocabulary de-only. A raw doc written in qq-speak must carry
    // a higher importance weight than one in zz-speak.
    val qq = Array.fill(30)("qq").mkString(" ")
    val zz = Array.fill(30)("zz").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, qq, "en"), (2L, qq, "en"), (3L, zz, "de"), (4L, zz, "de"),
      (5L, qq, "de"), // the doc DSIR should fish out of the raw pool
      (6L, zz, "fr")))
    val rows = Queries.byName("dsir_select").build(spark, dir).collect()
    val w = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("dsir_w")).toMap
    assert(w(5L) > w(6L), s"qq-doc ${w(5L)} !> zz-doc ${w(6L)}")
    assert(w(1L) > w(3L), w)
  }

  test("epoch_mix caps a scarce source at 4 epochs and conserves the " +
    "budget arithmetic") {
    // one big source and one tiny one: sqrt-temperature gives the tiny
    // source a target far above 4x its own tokens -> capped, and the
    // mass the cap frees is visible as alloc < target
    val big = Array.fill(400)("w").mkString(" ")
    // writeDocs plants source = s0 for all rows; build two sources here
    import spark.implicits._
    val docs = Seq(
      (1L, big, "en", "big"), (2L, big, "en", "big"),
      (3L, "tiny text here", "en", "small"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-epoch-spec")
    docs.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val rows = Queries.byName("epoch_mix").build(spark, dir2.toString)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val small = rows("small")
    assert(small.getAs[Boolean]("capped"))
    assert(small.getAs[Long]("epochs_bp") == 40000L)
    assert(small.getAs[Long]("alloc_tokens") ==
      small.getAs[Long]("n_tokens") * 4)
    assert(small.getAs[Long]("alloc_tokens") <
      small.getAs[Long]("target_tokens"))
    val bigR = rows("big")
    assert(!bigR.getAs[Boolean]("capped"))
    // budget conservation: targets sum to ~3x corpus (floor slack < n_src)
    val total = rows.values.map(_.getAs[Long]("n_tokens")).sum
    val targets = rows.values.map(_.getAs[Long]("target_tokens")).sum
    assert(targets <= 3 * total && targets >= 3 * total - rows.size)
  }

  test("leakageSplitAssign unifies a transitive chain longer than any " +
    "fixed round count (pointer-doubling fixpoint — the QUERY path: " +
    "this is the same code leakage_split runs, r12 verdict Next #3)") {
    import spark.implicits._
    // 12 docs chained pairwise by unique 15-word bridges: doc i and
    // doc i+1 share bridge_i, so star edges form the path 1-2-...-12
    // (diameter 11 — edge propagation alone would need 11 rounds,
    // more than the 8 fixed rounds the query ran before r13;
    // doubling converges in ~4). Since r13 the query and the verb
    // share this single fixpoint implementation, so this case covers
    // BOTH surfaces.
    def words(tag: String, n: Int) =
      (1 to n).map(j => s"$tag$j").mkString(" ")
    val docs = (1 to 12).map { i =>
      val prev = if (i > 1) words(s"b${i - 1}_", 15)
        else words(s"solo${i}_", 15)
      val next = if (i < 12) words(s"b${i}_", 15)
        else words(s"tail${i}_", 15)
      (i.toLong, s"$prev ${words(s"u${i}_", 5)} $next")
    }.toDF("doc_id", "text")
    val asg = QueriesPipeline.leakageSplitAssign(docs)
      .collect()
    assert(asg.length == 12)
    assert(asg.map(_.getLong(1)).distinct.length == 1, "one cluster root")
    assert(asg.map(_.getString(2)).distinct.length == 1, "one split")
  }

  test("dsir_select model join is broadcast and top-k is TakeOrdered") {
    val df = Queries.byName("dsir_select").build(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
