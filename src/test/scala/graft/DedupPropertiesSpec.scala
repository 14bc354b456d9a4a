package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

/** Property tests for the cross-doc dedup family (line_dedup,
  * span_dedup, winnow_fingerprint) on ADVERSARIAL corpora — the planted
  * oracles prove the happy path; these prove the edges where engine
  * split/window semantics famously diverge:
  *
  *   - empty tokens from doubled/leading/trailing spaces (Spark `split`
  *     with limit −1 KEEPS them, like DuckDB string_split — the model
  *     uses `String.split(" ", -1)` to pin that semantic),
  *   - empty documents (split("") = [""], one line, zero shingles),
  *   - exact boundary lengths (10-word lines; the span W=15; winnow's
  *     8-word minimum for one window, 7-word near miss),
  *   - all-duplicate corpora and repeated-token docs (hash collisions
  *     by construction, hot dedup groups),
  *   - docs that are copies of other docs plus a prefix/suffix.
  *
  * Each seed builds ~25 independent mini-corpora written as ONE
  * documents table (disjoint doc_id ranges; cross-corpus hash
  * collisions are legal and the model accounts for them), so 8 seeds ×
  * 25 = 200 generated corpora cost 24 Spark jobs, not 600. The
  * expected answer comes from an independent plain-Scala model of the
  * documented semantics sharing only Hashing.md5LongOf (the scalar
  * twin the driver's DuckDB oracle also reproduces); any divergence
  * would surface as a row mismatch. */
class DedupPropertiesSpec extends AnyFunSuite with SparkSuite {

  private val Seeds = 8
  private val md5L: String => Long = Hashing.md5LongOf

  // ---- generators -------------------------------------------------

  private val token: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("a", "b", "c", "lorem", "ipsum", "x1"),
    1 -> Gen.const("")) // doubled-space artifact

  private def docText(len: Int): Gen[String] =
    Gen.listOfN(len, token).map(_.mkString(" "))

  /** One mini-corpus: a handful of docs hitting the adversarial shapes. */
  private val corpus: Gen[Seq[String]] = for {
    base <- Gen.choose(5, 25).flatMap(docText)
    exact10 <- docText(10)
    exact15 <- docText(15)
    win8 <- docText(8)
    win7 <- docText(7)
    allSame <- Gen.oneOf("a", "b").map(t => Seq.fill(20)(t).mkString(" "))
    prefix <- docText(3)
    nDups <- Gen.choose(1, 3)
    pick <- Gen.oneOf(0, 1)
  } yield {
    val copies = Seq.fill(nDups)(base)
    val extended = prefix + " " + base
    val weird = if (pick == 0) "" else " " + base + " "
    Seq(base, exact10, exact15, win8, win7, allSame, extended, weird) ++
      copies
  }

  private val batch: Gen[Seq[(Long, String)]] =
    Gen.listOfN(25, corpus).map { cs =>
      cs.zipWithIndex.flatMap { case (docs, ci) =>
        docs.zipWithIndex.map { case (t, di) =>
          (ci * 1000L + di, t)
        }
      }
    }

  // ---- plain-Scala models of the documented semantics -------------

  private def split(text: String): Array[String] = text.split(" ", -1)

  private def modelLineDedup(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    val boiler =
      "cookie policy accepted please subscribe to our newsletter today now ok"
    val lines = docs.flatMap { case (id, t0) =>
      val ws = split(if (id % 7 == 0) boiler + " " + t0 else t0)
      val n = math.ceil(ws.length / 10.0).toInt
      (0 until n).map(i =>
        (id, md5L(ws.slice(i * 10, i * 10 + 10).mkString(" "))))
    }
    val groups = lines.groupBy(_._2).map { case (h, rs) =>
      h -> ((rs.map(_._1).min, rs.map(_._1).distinct.size)) }
    lines.groupBy(_._1).map { case (id, rs) =>
      val kept = rs.count { case (_, h) =>
        val (keeper, nd) = groups(h); nd == 1 || keeper == id }
      id -> ((rs.size.toLong, kept.toLong, (rs.size - kept).toLong))
    }
  }

  private def modelSpanDedup(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    val w = 15
    val para = "shared press release paragraph syndicated verbatim " +
      "across partner outlets today with identical wording and no " +
      "attribution beyond the original newswire byline copy desk " +
      "issued by the communications office this week"
    val wins = docs.flatMap { case (id, t0) =>
      val ws = split(if (id % 11 == 3) para + " " + t0 else t0)
      if (ws.length < w) Nil
      else (0 to ws.length - w).map(p =>
        (id, md5L(ws.slice(p, p + w).mkString(" "))))
    }
    val nd = wins.groupBy(_._2).map { case (h, rs) =>
      h -> rs.map(_._1).distinct.size }
    wins.groupBy(_._1).map { case (id, rs) =>
      val dup = rs.count { case (_, h) => nd(h) > 1 }
      id -> ((rs.size.toLong, dup.toLong,
        dup.toLong * 10000L / rs.size))
    }
  }

  private def modelWinnow(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long)] = {
    docs.flatMap { case (id, t0) =>
      val ws = split(t0)
      val grams =
        if (ws.length < 5) Array.empty[Long]
        else (0 to ws.length - 5)
          .map(i => md5L(ws.slice(i, i + 5).mkString(" "))).toArray
      if (grams.length < 4) None
      else {
        val sel = (0 to grams.length - 4)
          .map(j => grams.slice(j, j + 4).min).distinct
        Some(id -> ((sel.size.toLong,
          sel.map(_ % 1000000000L).sum)))
      }
    }.toMap
  }

  // ---- the property -----------------------------------------------

  test("line/span/winnow match an independent model on 200 mini-corpora") {
    import org.apache.spark.sql.Row
    val qs = graft.Queries.all.map(q => q.name -> q).toMap
    (1 to Seeds).foreach { s =>
      val docs = batch(Gen.Parameters.default, Seed(s.toLong)).get
      val dir = Files.createTempDirectory(s"dedup-prop-$s").toString
      import spark.implicits._
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")

      def run(name: String): Map[Long, Row] =
        qs(name).build(spark, dir).collect()
          .map(r => r.getLong(0) -> r).toMap

      val line = run("line_dedup")
      val lineExp = modelLineDedup(docs)
      assert(line.keySet == lineExp.keySet, s"seed $s line_dedup docs")
      lineExp.foreach { case (id, (n, kept, dropped)) =>
        val r = line(id)
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
          ((n, kept, dropped)), s"seed $s line_dedup doc $id")
      }

      val span = run("span_dedup")
      val spanExp = modelSpanDedup(docs)
      assert(span.keySet == spanExp.keySet, s"seed $s span_dedup docs")
      spanExp.foreach { case (id, (n, dup, bp)) =>
        val r = span(id)
        assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
          ((n, dup, bp)), s"seed $s span_dedup doc $id")
      }

      val win = run("winnow_fingerprint")
      val winExp = modelWinnow(docs)
      assert(win.keySet == winExp.keySet, s"seed $s winnow docs")
      winExp.foreach { case (id, (nFp, digest)) =>
        val r = win(id)
        assert((r.getLong(1), r.getLong(2)) == ((nFp, digest)),
          s"seed $s winnow doc $id")
      }
    }
  }
}
