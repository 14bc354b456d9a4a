package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Per-stage CPU breakdown for one query at one spread width — chases
  * the OptAb16g finding that task CPU grows ~200 ms per ADDITIONAL
  * task at sf0.1 regardless of work (bpe_encode: 0.55 CPU-s at w2 vs
  * 9.07 at w32). Prints every completed stage's task count, executor
  * CPU, run time and name so the fixed per-task term can be located.
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <query> <width>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, query, width) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ArrayBuffer.empty[(Int, Int, Double, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        stages += ((i.stageId, i.numTasks,
          i.taskMetrics.executorCpuTime / 1e9,
          i.taskMetrics.executorRunTime / 1e3,
          i.name.linesIterator.next().take(90)))
      }
    })
    sys.props("graft.spread.width") = width
    // warm up once (codegen/JIT) so the measured pass is steady-state
    val board = graft.SparkEntry.queries
    board(query)(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    stages.clear()
    board(query)(spark, sfDir).write.format("noop").mode("overwrite").save()
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    println(f"stageId tasks cpuSec runSec  name")
    var tot = 0.0
    for ((id, n, cpu, run, name) <- stages.sortBy(-_._3)) {
      tot += cpu
      println(f"$id%7d $n%5d $cpu%6.2f $run%6.2f  $name")
    }
    println(f"TOTAL cpu=$tot%.2f over ${stages.size} stages")
    spark.stop()
  }
}
