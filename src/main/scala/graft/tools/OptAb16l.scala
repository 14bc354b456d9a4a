package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wave-4 same-JVM interleaved A/B (r16): hits_scores' loop-invariant
  * frames. StageProbe attributes ~11 of the query's ~16 executor-CPU-s
  * to the one-time e/nodes builds — suspected columnar-compression
  * cost of `.cache()` (the same effect that made ccnet's cache pin
  * lose to localCheckpoint in r15). Arms: cache (shipped r15/16 form)
  * vs eager localCheckpoint for `e` and `nodes`, loop body identical.
  * Referee compares final sorted rows.
  *
  * Usage: runMain graft.tools.OptAb16l <sfDir> [reps]
  */
object OptAb16l {
  private val ITERS = 10

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

    def edges: DataFrame = graft.Tables(spark, sfDir, "lineitem").select(
      (col("l_orderkey") % 500).as("src"),
      (col("l_partkey") % 500 + 500).as("dst"))

    /** buildHits body with the invariant-frame pin strategy as the
      * only difference. */
    def hits(ckpt: Boolean): DataFrame = {
      val e0 = edges.distinct()
      val e = if (ckpt) e0.localCheckpoint() else e0.cache()
      val nodes0 = e.select(col("src").as("url"))
        .union(e.select(col("dst").as("url"))).distinct()
      val nodes = if (ckpt) nodes0.localCheckpoint() else nodes0.cache()
      var hub = nodes.withColumn("h", lit(1000000L))
        .select(col("url").as("src"), col("h"))
      var ar: DataFrame = null
      var hr: DataFrame = null
      var amax = 1L
      var hmax = 1L
      var deadAr: Option[DataFrame] = None
      var deadHr: Option[DataFrame] = None
      def maxOf(df: DataFrame, c: String): Long = {
        val r = df.agg(max(col(c))).head()
        if (r.isNullAt(0)) 1L else r.getLong(0)
      }
      for (_ <- 1 to ITERS) {
        val arK = e.join(hub, Seq("src"))
          .groupBy("dst").agg(sum(col("h")).as("ar"))
          .localCheckpoint()
        deadAr.foreach(
          org.apache.spark.sql.graftbridge.ColumnBridge.freeLocalCheckpoint)
        deadHr.foreach(
          org.apache.spark.sql.graftbridge.ColumnBridge.freeLocalCheckpoint)
        deadAr = Some(arK)
        ar = arK
        amax = maxOf(ar, "ar")
        val auth = ar.select(col("dst"),
          expr(s"ar * 1000000 div CAST($amax AS BIGINT)").as("a"))
        val hrK = e.join(auth, Seq("dst"))
          .groupBy("src").agg(sum(col("a")).as("hr"))
          .localCheckpoint()
        deadHr = Some(hrK)
        hr = hrK
        hmax = maxOf(hr, "hr")
        hub = hr.select(col("src"),
          expr(s"hr * 1000000 div CAST($hmax AS BIGINT)").as("h"))
      }
      nodes
        .join(hr, nodes("url") === hr("src"), "left")
        .join(ar, nodes("url") === ar("dst"), "left")
        .select(col("url"),
          expr(s"coalesce(hr, 0) * 1000000 div CAST($hmax AS BIGINT)")
            .as("hub_fx"),
          expr(s"coalesce(ar, 0) * 1000000 div CAST($amax AS BIGINT)")
            .as("auth_fx"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "hits_cache" -> (() => hits(false)),
      "hits_ckpt" -> (() => hits(true)))

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
    println(s"""{"metric":"opt_ab16l","sf":"$sfDir","reps":$reps,""" +
      s""""wall_min":${j(wall)},"cpu_min":${j(cpu)}}""")
    spark.stop()
  }
}
