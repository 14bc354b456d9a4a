package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-2 same-JVM interleaved A/B (r16): leakage_split's edge build.
  *
  *   A) legacy: `e0` (unpinned) consumed TWICE by the symmetrization —
  *      each union branch replays the corpus window-explode + hub join
  *      (the executed plan shows two full wins⋈hubs subtrees) — and an
  *      outer `.distinct()` over the union.
  *   B) shipped: `e0` lazily localCheckpoint-pinned (one edge-build
  *      pass feeds both branches) and the outer distinct dropped as a
  *      proven no-op (b = group-min < a on every e0 row, a < b on the
  *      swap, so the branches are disjoint and each internally
  *      distinct).
  *
  * Both arms run the FULL leakage_split query (edge build + 66-round
  * capped pointer-doubled label propagation + split assignment), so
  * the timing includes everything downstream of the change. The
  * referee compares final sorted rows.
  *
  * Usage: runMain graft.tools.OptAb16d <sfDir> [reps]
  */
object OptAb16d {
  // QueriesPipeline.SharedPara, inlined (object-private there); the
  // planted collision is what creates hub clusters — without it the
  // edge set is near-empty and the A/B would time an empty loop.
  private val SharedPara = "shared press release paragraph syndicated " +
    "verbatim across partner outlets today with identical wording and " +
    "no attribution beyond the original newswire byline copy desk " +
    "issued by the communications office this week"

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new graft.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def docs: DataFrame = graft.Queries.spread(
        graft.Tables(spark, sfDir, "documents"), col("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 3,
          concat(lit(SharedPara + " "), col("text")))
          .otherwise(col("text")).as("text"))

    /** r15 leakageSplitAssign, verbatim except the edge build (the
      * loop below is byte-equal to the shipped one — only e0/edges
      * differ between arms). */
    def assignLegacy(d: DataFrame): DataFrame = {
      val W = 15
      val wins = d.select(col("doc_id"),
        explode(graft.functions.Similarity.spanHashesDistinct(
          col("text"), W)).as("h"))
      val hubs = wins.groupBy("h").agg(min(col("doc_id")).as("mn"))
      val e0 = wins.join(hubs, "h")
        .filter(col("doc_id") =!= col("mn"))
        .select(col("doc_id").as("a"), col("mn").as("b"))
        .distinct()
      val edges = e0.unionByName(
          e0.select(col("b").as("a"), col("a").as("b"))).distinct()
        .localCheckpoint()
      var labels = d
        .select(col("doc_id").as("node"))
        .withColumn("label", col("node"))
      def round(): Unit = {
        val viaNbr = edges.join(labels, edges("b") === labels("node"))
          .select(col("a").as("node"), col("label"))
        labels = labels.unionByName(viaNbr)
          .groupBy("node").agg(min(col("label")).as("label"))
      }
      var prev: java.math.BigDecimal = null
      var it = 0
      var done = false
      var deadCkpt: Option[DataFrame] = None
      def ckptFree(df: DataFrame): DataFrame = {
        val c = df.localCheckpoint()
        deadCkpt.foreach(
          org.apache.spark.sql.graftbridge.ColumnBridge.freeLocalCheckpoint)
        deadCkpt = Some(c)
        c
      }
      while (!done && it < 66) {
        it += 1
        round()
        labels = ckptFree(labels)
        val lk = labels.select(col("node").as("n2"), col("label").as("l2"))
        labels = ckptFree(labels.join(lk, col("label") === col("n2"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("l2"), col("label")))
              .as("label")))
        val cur = Option(labels
            .agg(sum(col("label").cast("decimal(38,0)"))).head()
            .getDecimal(0))
          .getOrElse(java.math.BigDecimal.ZERO)
        done = prev != null && cur.compareTo(prev) == 0
        prev = cur
      }
      require(done, "legacy arm did not converge")
      labels.select(col("node").as("doc_id"), col("label").as("cluster"),
        (graft.Queries.md5Long(col("label").cast("string")) % 10).as("coin"))
        .select(col("doc_id"), col("cluster"),
          when(col("coin") <= 7, "train")
            .when(col("coin") === 8, "val").otherwise("test").as("split"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "leak_legacy" -> (() => assignLegacy(docs)),
      "leak_pinned" -> (() => graft.QueriesPipeline.leakageSplitAssign(docs)))

    def sortedRows(df: DataFrame): Seq[String] = {
      val r = df.collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      r
    }
    require(sortedRows(arms(0)._2()) == sortedRows(arms(1)._2()),
      s"${arms(0)._1} vs ${arms(1)._1}: arms disagree")
    println(s"[referee] ${arms(0)._1} == ${arms(1)._1}")

    val wall = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val cpu = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, fn) <- arms) {
      meter.reset()
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      wall(name) = wall(name) :+ dt
      cpu(name) = cpu(name) :+ meter.cpuSec
      spark.catalog.clearCache()
    }
    def j(m: collection.Map[String, Vector[Double]]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s""""$k":${math.round(v.min * 1000) / 1000.0}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"opt_ab16d","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
