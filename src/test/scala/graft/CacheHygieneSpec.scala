package graft

import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Cache discipline for the iterative graph queries (VERDICT r10 #6):
  * linkrank caches its loop-invariant edge table and hits_scores
  * caches edges + nodes. The Q surfaces rely on Bench/Verify clearing
  * the block cache per query; a LIBRARY caller composing these must
  * instead get the finalEager hook, which materializes the small
  * result and unpersists every loop cache before returning. These
  * tests compose both and assert the session's CacheManager is left
  * EMPTY — a leaked |E|-sized cached block per call would accumulate
  * in any long-running service. */
class CacheHygieneSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("composing linkrank + hits with finalEager leaks zero cached plans") {
    spark.catalog.clearCache()
    assert(ColumnBridge.cacheIsEmpty(spark))
    val lr = QueriesGraph.buildLinkrank(spark, dir,
      finalEager = true, cacheEdges = true)
    val hits = QueriesGraph.buildHits(
      Queries.t(spark, dir, "lineitem").selectExpr(
        "l_orderkey % 500 as src", "l_partkey % 500 + 500 as dst"),
      finalEager = true)
    // both results remain fully consumable after the unpersists...
    assert(lr.count() > 0 && hits.count() > 0)
    val joined = lr.join(hits, "url")
    assert(joined.count() > 0)
    // ...and no cached plan survives the composition
    assert(ColumnBridge.cacheIsEmpty(spark),
      "composed iterative queries leaked cached blocks")
  }

  test("the lazy Q surfaces do cache (what Bench/Verify must clear)") {
    spark.catalog.clearCache()
    val lr = Queries.byName("linkrank").build(spark, dir)
    assert(lr.count() > 0)
    // the lazy surface left its loop cache in place — the documented
    // contract that Bench/Verify clear per query; prove the clear works
    assert(!ColumnBridge.cacheIsEmpty(spark))
    spark.catalog.clearCache()
    assert(ColumnBridge.cacheIsEmpty(spark))
    // hits_scores pins its loop-invariant frames with EAGER
    // localCheckpoint since r16 (measured: the columnar cache build
    // cost ~10 CPU-s — OptAb16l): its loop state lives in RDD storage
    // blocks, freed by the ContextCleaner once the frames are GC'd
    // (exactly like the per-half-step loop checkpoints since r13) or
    // eagerly by the finalEager hook — NOT in the CacheManager.
    val hits = Queries.byName("hits_scores").build(spark, dir)
    assert(hits.count() > 0)
    assert(ColumnBridge.cacheIsEmpty(spark),
      "hits_scores' checkpoint pin must not register cached plans")
  }
}
