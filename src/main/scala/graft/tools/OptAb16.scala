package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Same-JVM interleaved A/B for the r16 optimization targets (the
  * OptAb methodology: only in-JVM interleaved ratios are trustworthy
  * on this container). Every legacy arm is a verbatim copy of the
  * r15-era form it replaces, and every pair is equality-refereed
  * row-for-row before timing.
  *
  *   A) hits loop: per-half-step `nodes ⟕ sums ⨯ broadcast(max)` +
  *      BNL crossJoin (legacy) vs join-side-keyed score frames with
  *      driver-literal maxima (shipped buildHits).
  *   B) linkrank loop: per-iteration nodes0 ⟕ contribs (legacy) vs
  *      src-keyed loop + one final nodes0 join (shipped buildLinkrank).
  *   C) span windows: explode(sequence)+slice+md5Long over the token
  *      array (legacy, quadratic row bytes) vs the spanHashes scalar —
  *      the span_dedup aggregation shape end-to-end.
  *   D) lines: the explode(sequence)+slice 10-word line splitter vs
  *      the lineHashes scalar — line_dedup shape end-to-end.
  *   E) ccnet: the un-pinned three-consumer occurrence frame (legacy)
  *      vs the localCheckpoint-pinned shipped ccnetBucketAssign.
  *
  * Usage: runMain graft.tools.OptAb16 <sfDir> [reps]
  * Prints one JSON line with min-of-reps wall and executor CPU per arm.
  */
object OptAb16 {
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

    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))

    // ---------- A) HITS legacy loop (r15 buildHits, verbatim) ----------
    def hitsEdges = graft.Tables(spark, sfDir, "lineitem").select(
      (col("l_orderkey") % 500).as("src"),
      (col("l_partkey") % 500 + 500).as("dst"))
    def hitsLegacy(): DataFrame = {
      val e = hitsEdges.distinct().cache()
      val nodes = e.select(col("src").as("url"))
        .union(e.select(col("dst").as("url"))).distinct().cache()
      var hub = nodes.withColumn("h", lit(1000000L))
      var auth = nodes.withColumn("a", lit(0L))
      var deadAr: Option[DataFrame] = None
      var deadHr: Option[DataFrame] = None
      for (_ <- 1 to 5) {
        val ar = e.join(hub, e("src") === hub("url"))
          .groupBy("dst").agg(sum(col("h")).as("ar"))
          .localCheckpoint()
        deadAr.foreach(
          org.apache.spark.sql.graftbridge.ColumnBridge.freeLocalCheckpoint)
        deadHr.foreach(
          org.apache.spark.sql.graftbridge.ColumnBridge.freeLocalCheckpoint)
        deadAr = Some(ar)
        auth = nodes.join(ar, nodes("url") === ar("dst"), "left")
          .crossJoin(broadcast(ar.agg(max(col("ar")).as("amax"))))
          .select(col("url"),
            expr("coalesce(ar, 0) * 1000000 div amax").as("a"))
        val hr = e.join(auth, e("dst") === auth("url"))
          .groupBy("src").agg(sum(col("a")).as("hr"))
          .localCheckpoint()
        deadHr = Some(hr)
        hub = nodes.join(hr, nodes("url") === hr("src"), "left")
          .crossJoin(broadcast(hr.agg(max(col("hr")).as("hmax"))))
          .select(col("url"),
            expr("coalesce(hr, 0) * 1000000 div hmax").as("h"))
      }
      hub.join(auth, "url")
        .select(col("url"), col("h").as("hub_fx"), col("a").as("auth_fx"))
    }
    def hitsNew(): DataFrame = graft.QueriesGraph.buildHits(hitsEdges)

    // ------- B) linkrank legacy loop (r15 buildLinkrank, verbatim) -------
    def linkrankLegacy(): DataFrame = {
      val li = graft.Tables(spark, sfDir, "lineitem")
      val rawEdges = li.select(
        (col("l_orderkey") % 500).as("src"),
        (col("l_partkey") % 500 + 500).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val wDom = Window.partitionBy((col("src") % 50).as("dom"), col("dst"))
        .orderBy(asc("src"))
      val outDeg = rawEdges.groupBy("src").agg(count(lit(1)).as("out_deg"))
      val edges = rawEdges
        .withColumn("rn", row_number().over(wDom))
        .filter(col("rn") === 1).drop("rn")
        .join(outDeg, "src")
        .cache()
      val nodes0 = rawEdges.select(col("src").as("url"))
        .union(rawEdges.select(col("dst").as("url")))
        .distinct()
        .withColumn("score", lit(1.0))
      var nodes = nodes0
      var deadNodes: Option[DataFrame] = None
      for (it <- 1 to 10) {
        val contribs = edges
          .join(nodes, edges("src") === nodes("url"))
          .select(col("dst"),
            round(col("score") / col("out_deg") * 1e9, 0).cast("long")
              .as("c_fx"))
          .groupBy("dst").agg(sum(col("c_fx")).as("sum_fx"))
        nodes = nodes0.select(col("url"))
          .join(contribs, nodes0("url") === contribs("dst"), "left")
          .select(col("url"),
            (lit(0.15) + lit(0.85) *
              (coalesce(col("sum_fx"), lit(0L)).cast("double") / 1e9))
              .as("score"))
        if (it % 5 == 0 && it < 10) {
          val c = nodes.localCheckpoint()
          deadNodes.foreach(
            org.apache.spark.sql.graftbridge.ColumnBridge
              .freeLocalCheckpoint)
          deadNodes = Some(c)
          nodes = c
        }
      }
      nodes.select(col("url"), round(col("score"), 6).as("score"))
    }
    def linkrankNew(): DataFrame = graft.QueriesGraph.buildLinkrank(
      spark, sfDir, finalEager = false, cacheEdges = true)

    // ---------- C) span windows: legacy explode+slice vs scalar ----------
    def spanAgg(wins: DataFrame): DataFrame = {
      val g = wins.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
      wins.join(g, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
    }
    def spanLegacy(): DataFrame = spanAgg(docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 15)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("ws")) - 15)).as("p"), col("ws"))
      .select(col("doc_id"),
        graft.Queries.md5Long(concat_ws(" ",
          slice(col("ws"), col("p") + 1, lit(15)))).as("h")))
    def spanScalar(): DataFrame = spanAgg(docs
      .select(col("doc_id"),
        explode(graft.functions.Similarity.spanHashes(col("text"), 15))
          .as("h")))

    // ---------- D) lines: legacy explode+slice vs scalar ----------
    def lineAgg(lines: DataFrame): DataFrame = {
      val groups = lines.groupBy("lh")
        .agg(min(col("doc_id")).as("keeper"),
          countDistinct(col("doc_id")).as("nd"))
      lines.join(groups, "lh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("nd") === 1 || col("keeper") === col("doc_id"), 1L)
            .otherwise(0L)).as("n_kept"))
    }
    def lineLegacy(): DataFrame = lineAgg(docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0),
          (ceil(size(col("ws")) / 10.0) - 1).cast("int"))).as("line_no"))
      .select(col("doc_id"),
        graft.Queries.md5Long(concat_ws(" ",
          slice(col("ws"), col("line_no") * 10 + 1, lit(10)))).as("lh")))
    def lineScalar(): DataFrame = lineAgg(docs
      .select(col("doc_id"),
        explode(graft.functions.Similarity.lineHashes(col("text"), 10))
          .as("lh")))

    // ---------- E) ccnet: un-pinned legacy vs shipped pinned ----------
    def ccnetLegacy(): DataFrame = {
      val bi = docs
        .select(col("doc_id"), col("lang"),
          explode(graft.functions.Similarity.wordGramsAll(col("text"), 2))
            .as("g"))
        .select(col("doc_id"), col("lang"),
          substring_index(col("g"), " ", 1).as("w"), col("g"))
      val c1 = bi.groupBy("w").agg(count(lit(1)).as("cw"))
      val c2 = bi.groupBy("g").agg(count(lit(1)).as("cg"))
      val scores = bi.join(c2, "g").join(c1, "w")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("nb"), sum(expr("cw DIV cg")).as("ls"))
        .select(col("doc_id"), col("lang"),
          expr("(ls * 10000) DIV nb").as("score_bp"))
      val hist = scores.groupBy("lang", "score_bp")
        .agg(count(lit(1)).as("cnt"))
      val wl = Window.partitionBy("lang").orderBy("score_bp")
      val ntot = scores.groupBy("lang").agg(count(lit(1)).as("ntot"))
      val bucketed = hist
        .withColumn("cume", sum(col("cnt")).over(wl))
        .join(broadcast(ntot), "lang")
        .select(col("lang"), col("score_bp"),
          expr("((cume - cnt) * 3) div ntot").as("b"))
      scores.join(bucketed, Seq("lang", "score_bp"))
        .select(col("doc_id"), col("lang"), col("score_bp"),
          when(col("b") === 0, lit("head"))
            .when(col("b") === 1, lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
    }
    def ccnetNew(): DataFrame = graft.QueriesPipeline.ccnetBucketAssign(docs)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "hits_legacy" -> (() => hitsLegacy()),
      "hits_new" -> (() => hitsNew()),
      "linkrank_legacy" -> (() => linkrankLegacy()),
      "linkrank_new" -> (() => linkrankNew()),
      "span_legacy" -> (() => spanLegacy()),
      "span_scalar" -> (() => spanScalar()),
      "line_legacy" -> (() => lineLegacy()),
      "line_scalar" -> (() => lineScalar()),
      "ccnet_legacy" -> (() => ccnetLegacy()),
      "ccnet_new" -> (() => ccnetNew()))

    // equality referee: each pair must agree row-for-row
    def sortedRows(df: DataFrame): Seq[String] = {
      val r = df.collect().map(_.toString).sorted.toSeq
      spark.catalog.clearCache()
      r
    }
    for (i <- arms.indices by 2) {
      require(sortedRows(arms(i)._2()) == sortedRows(arms(i + 1)._2()),
        s"${arms(i)._1} vs ${arms(i + 1)._1}: arms disagree")
      println(s"[referee] ${arms(i)._1} == ${arms(i + 1)._1}")
    }

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
    println(s"""{"metric":"opt_ab16","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
