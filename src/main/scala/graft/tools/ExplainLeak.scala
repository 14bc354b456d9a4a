package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** leakage_split's FINAL frame is a localCheckpoint scan (the label
  * loop is eager), so PlanDump cannot show the edge-build rewire.
  * This tool dumps the EXECUTED plan of the edge-build segment itself
  * in both forms:
  *
  *   legacy — e0 unpinned (the symmetrization's two union branches
  *   each replay the full wins⋈hubs subtree) + outer `.distinct()`;
  *   pinned — e0 lazily localCheckpoint-pinned (one subtree feeds
  *   both branches) + distinct dropped (proven no-op: b = group-min
  *   < a on every e0 row, a < b on the swap — disjoint, each
  *   internally distinct).
  *
  * Usage: runMain graft.tools.ExplainLeak <sfDir> <outDir>
  * Writes <outDir>/leakage_split_edges_{before,after}.txt
  */
object ExplainLeak {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val W = 15
    val d = graft.Queries.spread(
      graft.Tables(spark, sfDir, "documents"), col("doc_id"))
      .select(col("doc_id"), col("text"))

    def winsHubsE0(): (DataFrame, DataFrame) = {
      val wins = d.select(col("doc_id"),
        explode(graft.functions.Similarity.spanHashesDistinct(
          col("text"), W)).as("h"))
      val hubs = wins.groupBy("h").agg(min(col("doc_id")).as("mn"))
      val e0 = wins.join(hubs, "h").filter(col("doc_id") =!= col("mn"))
        .select(col("doc_id").as("a"), col("mn").as("b")).distinct()
      (wins, e0)
    }

    def dump(name: String, edges: DataFrame): Unit = {
      edges.write.format("noop").mode("overwrite").save()
      Files.writeString(Paths.get(s"$outDir/leakage_split_edges_$name.txt"),
        edges.queryExecution.executedPlan.toString)
      println(s"[plan] leakage_split_edges_$name.txt")
    }

    val (_, e0a) = winsHubsE0()
    dump("before", e0a.unionByName(
      e0a.select(col("b").as("a"), col("a").as("b"))).distinct())

    val (_, e0b0) = winsHubsE0()
    val e0b = e0b0.localCheckpoint(false)
    dump("after", e0b.unionByName(
      e0b.select(col("b").as("a"), col("a").as("b"))))
    spark.stop()
  }
}
