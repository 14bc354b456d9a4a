package graft.ops

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._

/** S7/S8 — index-writer sinks and the exchange router
  * (indexer-* plugin family; Exchanges.java / exchange-jexl routing).
  *
  * `IndexWriter` is the §2.9 extension-point seam; the two concrete
  * writers cover the text-format family (JSON-lines for the
  * elasticsearch/solr document shape, CSV for the csv indexer plugin).
  * Routing is declarative: first-match rules compile into one CASE
  * column, then a partitioned write fans docs out by target — one pass,
  * no per-writer rescans. */
object IndexWriters {

  /** §2.9 extension point: a destination for indexed documents. */
  trait IndexWriter extends Serializable {
    def name: String
    def write(docs: Dataset[Index.Doc], outDir: String): Unit
  }

  /** indexer-elastic/solr document shape as JSON lines. */
  final class JsonLinesWriter(val name: String = "jsonlines")
      extends IndexWriter {
    def write(docs: Dataset[Index.Doc], outDir: String): Unit =
      docs.toDF()
        .select(to_json(struct(col("url"), col("action"), col("title"),
          col("host"), col("digest"), col("boost"))).as("value"))
        .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** indexer-csv shape. */
  final class CsvWriter(val name: String = "csv") extends IndexWriter {
    def write(docs: Dataset[Index.Doc], outDir: String): Unit =
      docs.toDF()
        .select(col("url"), col("action"), col("title"), col("host"),
          col("digest"), col("boost"))
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(outDir)
  }

  /** First-match routing rules: (writerName, predicate column). */
  def routeColumn(rules: Seq[(String, org.apache.spark.sql.Column)],
      default: String): org.apache.spark.sql.Column =
    rules.reverse.foldLeft(lit(default)) { case (acc, (w, p)) =>
      when(p, lit(w)).otherwise(acc)
    }

  /** Route and write: docs fan out to each writer's directory under
    * `baseDir/<writerName>`. */
  def routeAndWrite(docs: Dataset[Index.Doc],
      rules: Seq[(String, org.apache.spark.sql.Column)],
      writers: Map[String, IndexWriter], default: String,
      baseDir: String): Unit = {
    import docs.sparkSession.implicits._
    val routed = docs.toDF()
      .withColumn("__writer", routeColumn(rules, default))
      .cache()
    writers.foreach { case (wname, writer) =>
      val part = routed.filter(col("__writer") === wname)
        .drop("__writer").as[Index.Doc]
      writer.write(part, s"$baseDir/$wname")
    }
    routed.unpersist()
  }
}
