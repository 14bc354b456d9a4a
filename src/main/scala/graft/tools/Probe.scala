package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Queries
import graft.functions.{Hashing, Similarity}

/** Ad-hoc plan/size probe (not part of the driver contract). */
object Probe {
  def probeQuery(dir: String): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = sys.env("PROBE_Q")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.Queries.byName(name).build(spark, dir).count()
      println(s"run$i: " + (System.nanoTime()-t0)/1e9)
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  def probeGopher(dir: String): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Queries.t(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val words = d.select(col("doc_id"), split(col("text"), " ").as("words"))
    time("split_only") { words.count() }
    val g2simple = words.select(col("doc_id"),
      transform(sequence(lit(0), size(col("words")) - 2),
        i => concat_ws(" ", element_at(col("words"), i + 1),
          element_at(col("words"), i + 2))).as("g2"))
    time("transform_nowhen") { g2simple.count() }
    time("transform_explode") {
      g2simple.select(col("doc_id"), explode(col("g2")).as("g")).count() }
    time("full_agg") {
      g2simple.select(col("doc_id"), explode(col("g2")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c"))).count() }
    val guarded = words.select(col("doc_id"),
      when(size(col("words")) >= 2,
        transform(sequence(lit(0), size(col("words")) - 2),
          i => concat_ws(" ", element_at(col("words"), i + 1),
            element_at(col("words"), i + 2))))
        .otherwise(array().cast("array<string>")).as("g2"))
    time("guarded_explode") {
      guarded.select(col("doc_id"), explode(col("g2")).as("g")).count() }
    guarded.select(col("doc_id"), explode(col("g2")).as("g"))
      .explain("formatted")
    spark.stop()
  }

  /** Stage-by-stage minhash_lsh timing (same plan as the query). */
  def probeMinhashStages(dir: String): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Queries.t(spark, dir, "documents")
    for (rep <- 1 to 3) {
      def time[T](tag: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"rep$rep $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val sh = d.select(col("doc_id"),
        explode(Similarity.wordShingles(col("text"), 3)).as("sh"))
        .withColumn("hb", Similarity.minhashBase(col("sh")))
      val sig = sh.groupBy("doc_id").agg(
        Similarity.minhashAgg(col("hb"), 0).as("m0"),
        (1 until 12).map(i =>
          Similarity.minhashAgg(col("hb"), i).as(s"m$i")): _*)
        .cache()
      time("sig")(sig.count())
      val bandCols = (0 until 4).map { b =>
        val ms = (b * 3 until (b + 1) * 3).map(i => col(s"m$i"))
        struct(lit(b).as("band"),
          Hashing.md5Long(concat_ws(",", ms: _*)).as("h"))
      }
      val bands = sig.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bh"))
        .select(col("doc_id"), col("bh.band").as("band"),
          col("bh.h").as("h"))
      time("bands")(bands.count())
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val n = time("cand")(cand.count())
      println(s"rep$rep cand_rows=$n")
      val sa = sig.toDF(sig.columns.map(c => s"a_$c"): _*)
      val sb = sig.toDF(sig.columns.map(c => s"b_$c"): _*)
      val matches = (0 until 12)
        .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
        .reduce(_ + _)
      val fin = cand.join(sa, col("a_id") === col("a_doc_id"))
        .join(sb, col("b_id") === col("b_doc_id"))
        .select(col("a_id"), col("b_id"),
          round(matches.cast("double") / 12, 4).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
      time("final")(fin.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (sys.env.contains("PROBE_GOPHER")) { probeGopher(args.headOption.getOrElse("/root/testdata/sf0.1")); return }
    if (sys.env.contains("PROBE_MH")) { probeMinhashStages(args.headOption.getOrElse("/root/testdata/sf0.1")); return }
    if (sys.env.contains("PROBE_Q")) { probeQuery(args.headOption.getOrElse("/root/testdata/sf0.1")); return }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Queries.t(spark, dir, "documents")
    println("docs=" + d.count())
    println("textlen=" + d.select(avg(length(col("text")))).first())
    val shArr = d.select(col("doc_id"),
      Similarity.charShingles(col("text"), 5).as("shs")).cache()
    println("avg_shingles=" + shArr.select(avg(size(col("shs")))).first())
    val sh = shArr.select(col("doc_id"), explode(col("shs")).as("sh"))
    val sig = sh.groupBy("doc_id").agg(
      Similarity.minhashAgg(col("sh"), 0).as("m0"),
      (1 until 12).map(i => Similarity.minhashAgg(col("sh"), i).as(s"m$i")): _*)
    val bandCols = (0 until 4).map { b =>
      val ms = (b * 3 until (b + 1) * 3).map(i => col(s"m$i"))
      struct(lit(b).as("band"), Hashing.md5Long(concat_ws(",", ms: _*)).as("h"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
      .cache()
    val t0 = System.nanoTime()
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct().cache()
    println("cand=" + cand.count() + " in " + (System.nanoTime()-t0)/1e9)
    val top = bands.groupBy("band", "h").agg(count(lit(1)).as("c"))
      .orderBy(desc("c")).limit(5)
    top.show(false)
    spark.stop()
  }
}
