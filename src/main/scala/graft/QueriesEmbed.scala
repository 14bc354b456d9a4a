package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Queries.t
import graft.functions.Similarity

/** Batch 5 — similarity search over the `embeddings` table
  * (Array[Float] 64-dim vectors; BASELINE.json north-star ops).
  *
  * All cosine math uses exact fixed-point integer dot products
  * (Similarity.dotFx) so Spark and DuckDB agree bit-for-bit. Vectors are
  * quantized and norm'd ONCE per row (not per pair) — at 100 TB the
  * pairwise stage touches only pre-computed long arrays.
  */
object QueriesEmbed {

  private def sqlDotFx(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(list_zip($a, $b),
        s -> CAST(ROUND(s[1]*1e6) AS BIGINT) * CAST(ROUND(s[2]*1e6) AS BIGINT)))
        AS BIGINT)"""

  private def sqlNormSqFx(a: String): String =
    s"""CAST(list_sum(list_transform($a,
        x -> CAST(ROUND(x*1e6) AS BIGINT) * CAST(ROUND(x*1e6) AS BIGINT)))
        AS BIGINT)"""

  /** pre-quantized vector + exact squared norm over any embedding frame. */
  private def prepare(df: DataFrame): DataFrame =
    df.select(
      col("vec_id"), col("label"),
      Similarity.quantized(col("embedding")).as("qv"))
      .withColumn("nsq", Similarity.normSqQ(col("qv")))

  /** embeddings with pre-quantized vector + exact squared norm. */
  private def prepared(s: SparkSession, dir: String): DataFrame =
    prepare(t(s, dir, "embeddings"))

  private val PLANT_MOD = 100
  private val PLANT_ID_OFFSET = 1000000L

  /** embeddings plus PLANTED near-duplicates: every PLANT_MOD-th vector
    * reappears under vec_id+1e6 with its first coordinate doubled.
    * cos(a, a') = (1+t)/√(1+3t) for t = x₁²/|a|² ∈ [0,1], minimized at
    * t=1/3 → cos ≥ 0.943 ALWAYS — so the ≥0.9 near-dup threshold is
    * guaranteed to fire and the oracle comparison exercises the full
    * band/candidate/cosine pipeline on known-positive pairs (doubling
    * is exact in float and keeps every sign bit, so the planted copy
    * shares all four LSH bands with its source). */
  private def plantedEmb(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "embeddings")
    val planted = base.filter(col("vec_id") % PLANT_MOD === 0)
      .select((col("vec_id") + PLANT_ID_OFFSET).as("vec_id"), col("label"),
        concat(
          array(element_at(col("embedding"), 1) * lit(2.0f)),
          slice(col("embedding"), 2, 100000)).as("embedding"))
    base.unionByName(planted)
  }

  /** DuckDB twin of [[plantedEmb]] (a CTE body named `emb`). */
  private def sqlPlantedEmb: String =
    s"""SELECT vec_id, label, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + $PLANT_ID_OFFSET AS vec_id, label,
               list_concat([CAST(embedding[1] * 2 AS FLOAT)],
                           embedding[2:]) AS embedding
        FROM embeddings WHERE vec_id % $PLANT_MOD = 0"""

  private def cosExpr = round(
    Similarity.cosineFx(col("dot"), col("nq"), col("nc")), 6)

  /** Brute-force cosine top-k: every 50th vector is a query, scored
    * against all candidates — the correctness baseline for ANN. */
  val knnBruteforce = Q(
    "knn_bruteforce",
    (s, dir) => {
      val e = prepared(s, dir)
      val q = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
          col("nsq").as("nq"))
      val pairs = q.join(e, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"),
          Similarity.dotQ(col("q_qv"), col("qv")).as("dot"),
          col("nq"), col("nsq").as("nc"))
        .withColumn("cos", cosExpr)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc("cos"), asc("cand_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("cand_id"), col("cos"),
          col("rn").cast("long").as("rank"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                 FROM embeddings WHERE vec_id % 50 = 0),
      p AS (SELECT q_id, e.vec_id AS cand_id,
              ROUND(CAST(${sqlDotFx("q_emb", "e.embedding")} AS DOUBLE) /
                (sqrt(CAST(${sqlNormSqFx("q_emb")} AS DOUBLE)) *
                 sqrt(CAST(${sqlNormSqFx("e.embedding")} AS DOUBLE))), 6) AS cos
            FROM q, embeddings e WHERE e.vec_id <> q.q_id),
      r AS (SELECT q_id, cand_id, cos,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, cand_id) AS rn
            FROM p)
      SELECT q_id, cand_id, cos, CAST(rn AS BIGINT) AS rank
      FROM r WHERE rn <= 5"""))

  private val NPROBE = 2

  /** The one-Lloyd-step coarse quantizer shared by knn_ivf, knn_ivfpq,
    * semantic_dedup, and embed_outliers — their "same coarse
    * quantizer" contract lives in ONE place (a drifting copy would
    * silently de-correlate the queries and their oracles): per initial
    * label cell, the fixed-point mean (floor(sum/count) on exact
    * integer sums, bit-identical in DuckDB) with its exact squared
    * norm. */
  private def coarseCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long")
        .as("cx"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("cx")))),
        p => p.getField("cx")).as("cvec"))
      .withColumn("cnsq", Similarity.normSqQ(col("cvec")))

  /** Every vector × every (broadcast) centroid with the exact dot and
    * cosine — the shared assignment front half. Carries all of `e`'s
    * columns plus cell/cvec/cnsq/qcdot/ccos; Catalyst prunes whatever
    * a caller drops. Assignment = rank 1 under (ccos desc, cell asc)
    * over a per-vector window (state = #cells rows). */
  private def coarseScored(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(coarseCentroids(e).select(
        col("label").as("cell"), col("cvec"), col("cnsq"))))
      .withColumn("qcdot", Similarity.dotQ(col("qv"), col("cvec")))
      .withColumn("ccos",
        Similarity.cosineFx(col("qcdot"), col("nsq"), col("cnsq")))

  /** Real IVF ANN: the coarse quantizer is TRAINED — one Lloyd step from
    * the label partition (centroid = per-cell mean in fixed point), every
    * vector is then ASSIGNED to its nearest centroid by cosine, and each
    * query MULTI-PROBES its NPROBE nearest cells (the standard recall
    * fix for queries near a cell boundary: the 2nd-closest centroid's
    * cell holds most of the neighbors the 1st misses). Centroid
    * averaging uses floor(sum/count) on exact integer sums so both
    * engines agree bit-for-bit; probe/assignment ranking ties break on
    * cell asc. At scale each query row fans out to NPROBE cell-probe
    * rows before the cell join — work stays linear in n·nprobe/cells,
    * never the full-table pass; the brute-force query above stays as
    * the labeled recall baseline. */
  val knnIvf = Q(
    "knn_ivf",
    (s, dir) => {
      val e = prepared(s, dir).cache()
      // train + assign through the SHARED coarse quantizer
      // ([[coarseCentroids]]/[[coarseScored]]; ties: lowest cell)
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(desc("ccos"), asc("cell"))
      // r16: one ranked pass, lazily checkpointed, covers BOTH the
      // assignment (rn = 1) and the probes (rn ≤ NPROBE over query
      // vectors) — `scored` used to be consumed twice, re-running the
      // n×cells scoring crossJoin each time (the ivfpqFrames pin; the
      // %50 filter is on the window's partition key, so filtering
      // before or after ranking is the same frame)
      val ranked = coarseScored(e)
        .select(col("vec_id"), col("qv"), col("nsq"), col("cell"),
          col("ccos"))
        .withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") <= NPROBE)
        .localCheckpoint(false)
      val asg = ranked.filter(col("rn") === 1)
        .select(col("vec_id"), col("qv"), col("nsq"), col("cell"))
      // --- search: each query scans its NPROBE nearest cells ---
      val probes = ranked.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
          col("nsq").as("nq"), col("cell").as("q_cell"))
      val pairs = probes.join(asg,
          col("q_cell") === col("cell") && col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"), col("cell"),
          Similarity.dotQ(col("q_qv"), col("qv")).as("dot"),
          col("nq"), col("nsq").as("nc"))
        .withColumn("cos", cosExpr)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc("cos"), asc("cand_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("cand_id"),
          col("cell").cast("int").as("cell"), col("cos"))
    },
    Some(s"""
      WITH qe AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(ROUND(x*1e6) AS BIGINT)) AS qv
        FROM embeddings),
      cent0 AS (
        SELECT label, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, unnest(qv) AS x,
                unnest(generate_series(1, len(qv))) AS i
              FROM qe)
        GROUP BY label, i),
      cent AS (
        SELECT label AS cell, list(cx ORDER BY i) AS cvec FROM cent0
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, c.cell,
          CAST(list_sum(list_transform(list_zip(e.qv, c.cvec),
               s -> s[1] * s[2])) AS DOUBLE) /
          (sqrt(CAST(list_sum(list_transform(e.qv, x -> x*x)) AS DOUBLE)) *
           sqrt(CAST(list_sum(list_transform(c.cvec, x -> x*x)) AS DOUBLE)))
            AS ccos
        FROM qe e CROSS JOIN cent c),
      asg AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cell) AS rn
          FROM scored) WHERE rn = 1),
      probes AS (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cell) AS rn
          FROM scored WHERE vec_id % 50 = 0) WHERE rn <= $NPROBE),
      p AS (
        SELECT qa.vec_id AS q_id, ca.vec_id AS cand_id, ca.cell,
          ROUND(CAST(${sqlDotFx("eq.embedding", "ec.embedding")} AS DOUBLE) /
            (sqrt(CAST(${sqlNormSqFx("eq.embedding")} AS DOUBLE)) *
             sqrt(CAST(${sqlNormSqFx("ec.embedding")} AS DOUBLE))), 6) AS cos
        FROM probes qa
        JOIN asg ca ON ca.cell = qa.cell AND ca.vec_id <> qa.vec_id
        JOIN embeddings eq ON eq.vec_id = qa.vec_id
        JOIN embeddings ec ON ec.vec_id = ca.vec_id),
      r AS (SELECT q_id, cand_id, cell, cos,
              row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, cand_id) AS rn
            FROM p)
      SELECT q_id, cand_id, CAST(cell AS INTEGER) AS cell, cos
      FROM r WHERE rn <= 3"""))

  private val PQ_M = 8 // subspaces
  private val PQ_SUB = 8 // dims per subspace (64-dim vectors)

  /** Product-quantization ANN — the compressed-vector scale path: at
    * 100 TB you cannot hold (or scan) full-precision embeddings, so
    * each vector is stored as M=8 small codes (one byte each — a 32×
    * compression of the 64×f32 vector) and queries score candidates
    * via an ADC lookup table (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) without ever touching the
    * original vectors.
    *
    * All three PQ stages run as declared relational plans, integer-
    * exact so DuckDB agrees bit-for-bit:
    *  - TRAIN: per-subspace codebook = one Lloyd step from the label
    *    partition (fixed-point floor-mean per (label, subspace, dim) —
    *    the IVF query's training pattern applied per subspace);
    *  - ENCODE: each (vector, subspace) takes the code of the nearest
    *    centroid by exact integer L2 (‖a‖²+‖c‖²−2a·c on the quantized
    *    values; ties → lowest code). The encoded table is the only
    *    thing the scan reads — n×M code rows, no vectors;
    *  - SEARCH (ADC): each query precomputes dot(q_sub, centroid) for
    *    all M×K (subspace, code) cells — a lookup table of 80 longs —
    *    and a candidate's approximate dot is the sum of its M looked-up
    *    entries: the (m, code) equi-join + sum below, linear in n·M
    *    with no full-vector math in the scan.
    * Top-3 per query by (adc_dot desc, cand_id) — the retrieve stage
    * of a retrieve-then-rerank pipeline (knn_bruteforce remains the
    * exact baseline; QueriesEmbedRecallSpec measures PQ recall
    * against it). */
  val knnPq = Q(
    "knn_pq",
    (s, dir) => {
      val e = prepared(s, dir)
      // subspace split: M struct rows per vector, codegen'd slices
      val sub = e.select(col("vec_id"), col("label"),
        explode(array((0 until PQ_M).map(m => struct(lit(m).as("m"),
          slice(col("qv"), m * PQ_SUB + 1, PQ_SUB).as("sv"))): _*)).as("s"))
        .select(col("vec_id"), col("label"), col("s.m").as("m"),
          col("s.sv").as("sv"))
        .cache()
      // train: fixed-point floor-mean per (label, subspace, dim)
      val cent = sub
        .select(col("label"), col("m"), posexplode(col("sv")).as(Seq("i", "x")))
        .groupBy(col("label"), col("m"), col("i"))
        .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long")
          .as("cx"))
        .groupBy(col("m"), col("label"))
        .agg(transform(
          array_sort(collect_list(struct(col("i"), col("cx")))),
          p => p.getField("cx")).as("cvec"))
        .select(col("m"), col("label").as("code"), col("cvec"))
      // encode: nearest centroid per (vector, subspace) by exact L2
      val wE = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(asc("d2"), asc("code"))
      val codes = sub.join(broadcast(cent), Seq("m"))
        .select(col("vec_id"), col("m"), col("code"),
          (Similarity.normSqQ(col("sv")) + Similarity.normSqQ(col("cvec"))
            - lit(2L) * Similarity.dotQ(col("sv"), col("cvec"))).as("d2"))
        .withColumn("rn", row_number().over(wE))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("code"))
      // search: per-query ADC lookup table, then equi-join + sum
      val lut = sub.filter(col("vec_id") % 50 === 0)
        .join(broadcast(cent), Seq("m"))
        .select(col("vec_id").as("q_id"), col("m"), col("code"),
          Similarity.dotQ(col("sv"), col("cvec")).as("pdot"))
      val sc = codes.join(lut, Seq("m", "code"))
        .filter(col("q_id") =!= col("vec_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("pdot")).cast("long").as("adc_dot"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc("adc_dot"), asc("vec_id"))
      sc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("vec_id").as("cand_id"),
          col("rn").cast("long").as("rank"), col("adc_dot"))
    },
    Some(s"""
      WITH qe AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(ROUND(x*1e6) AS BIGINT)) AS qv
        FROM embeddings),
      sub AS (
        SELECT vec_id, label, m,
          list_slice(qv, m*$PQ_SUB + 1, m*$PQ_SUB + $PQ_SUB) AS sv
        FROM qe, (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m)),
      cent0 AS (
        SELECT label, m, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, m, unnest(sv) AS x,
                unnest(generate_series(1, len(sv))) AS i
              FROM sub)
        GROUP BY label, m, i),
      cb AS (
        SELECT m, label AS code, list(cx ORDER BY i) AS cvec FROM cent0
        GROUP BY m, label),
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
            row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
              list_sum(list_transform(list_zip(s.sv, c.cvec),
                p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.code ASC) AS rn
          FROM sub s JOIN cb c ON c.m = s.m) WHERE rn = 1),
      lut AS (
        SELECT q.vec_id AS q_id, c.m, c.code,
          CAST(list_sum(list_transform(list_zip(q.sv, c.cvec),
            p -> p[1]*p[2])) AS BIGINT) AS pdot
        FROM sub q JOIN cb c ON c.m = q.m WHERE q.vec_id % 50 = 0),
      sc AS (
        SELECT l.q_id, e.vec_id AS cand_id,
          CAST(SUM(l.pdot) AS BIGINT) AS adc_dot
        FROM enc e JOIN lut l ON l.m = e.m AND l.code = e.code
        WHERE e.vec_id <> l.q_id
        GROUP BY l.q_id, e.vec_id),
      r AS (
        SELECT q_id, cand_id, adc_dot,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY adc_dot DESC, cand_id) AS rn
        FROM sc)
      SELECT q_id, cand_id, CAST(rn AS BIGINT) AS rank, adc_dot
      FROM r WHERE rn <= 3"""))

  /** IVFADC candidate scan — PQ codes of every vector in each query's
    * probed cells, the rows the search actually reads. Row count is
    * Σ over (query, probed cell) of that cell's code mass. Growth law
    * (MEASURED in IvfPqScaleSpec, not argued): with a fixed serving
    * workload the scan is linear in n at any cell count; when the
    * query set itself grows ∝ n (all-pairs batch search), candidates
    * stay ~linear iff the cell count grows ∝ n — the IVF regime, Jégou
    * et al. §IV use k ≈ √n..n/τ — and go ~quadratic at fixed k. Same
    * knob as SemDeDup's cluster count; here cells come from the coarse
    * quantizer, so scaling k means training more coarse centroids. */
  private[graft] def ivfpqCandidates(codes: DataFrame,
      probes: DataFrame): DataFrame =
    codes.join(probes, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))

  /** Intermediate frames of the IVFADC pipeline, exposed so
    * QueriesEmbedRecallSpec can assert the scan-cost claim (candidates
    * = probed-cell mass, never n) against the same plan the query
    * runs. */
  private[graft] final case class IvfPqFrames(asg: DataFrame,
      probes: DataFrame, cand: DataFrame, result: DataFrame)

  /** IVFADC (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011, §IV): the billion-vector composition of the
    * two layouts above — the IVF coarse quantizer prunes the scan to
    * nprobe cells, and within a cell candidates are scored from PQ
    * codes of the RESIDUAL (vector − its cell centroid), which is what
    * the codes can afford to encode precisely (residuals are small, so
    * the same codebook budget spends its resolution where the data
    * is). The approximate inner product decomposes exactly:
    *
    *   dot(q, c_cell + dec(codes)) = dot(q, c_cell) + Σ_m lut(m, code_m)
    *
    * so the scan reads ONLY (cell, m, code) rows — n·M tiny integers —
    * plus a per-query broadcast LUT; full vectors appear in no join.
    * Same integer-exact discipline as knn_ivf/knn_pq (fixed-point
    * floor-mean training, exact L2 encode with ties → lowest code,
    * probe/rank tiebreaks on cell/cand asc) so DuckDB agrees
    * bit-for-bit. */
  private[graft] def ivfpqFrames(e0: DataFrame): IvfPqFrames = {
    val e = e0.cache()
    // train + assign through the SHARED coarse quantizer
    // ([[coarseCentroids]]/[[coarseScored]])
    val wAsg = Window.partitionBy(col("vec_id"))
      .orderBy(desc("ccos"), asc("cell"))
    // r16: ONE ranked pass, lazily checkpointed — `scored` used to be
    // consumed twice (assignment rn=1 over all vectors, probes
    // rn≤NPROBE over query vectors), each re-running the n×cells
    // crossJoin + dotQ scoring. rn ≤ NPROBE covers both consumers
    // (NPROBE ≥ 1; the window over the %50 filter equals the filtered
    // window — the filter is on the partition key), and the pinned
    // frame is ≤ NPROBE rows per vector.
    val ranked = coarseScored(e)
      .withColumn("rn", row_number().over(wAsg))
      .filter(col("rn") <= NPROBE)
      .select(col("vec_id"), col("label"), col("cell"), col("qv"),
        col("cvec"), col("qcdot"), col("rn"))
      .localCheckpoint(false)
    // --- assign + residual: rv = v − c_cell, element-wise exact
    //     (residQ: the codegen scalar twin of the interpreted
    //     zip_with(qv, cvec, (a, c) => a − c) HOF it replaces) ---
    val asg = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("cell"),
        Similarity.residQ(col("qv"), col("cvec")).as("rv"))
    // --- residual subspaces + one-Lloyd-step codebook per (m, label) ---
    val sub = asg.select(col("vec_id"), col("label"), col("cell"),
        explode(array((0 until PQ_M).map(m => struct(lit(m).as("m"),
          slice(col("rv"), m * PQ_SUB + 1, PQ_SUB).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("label"), col("cell"),
        col("s.m").as("m"), col("s.sv").as("sv"))
      .cache()
    val cb = sub
      .select(col("label"), col("m"), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy(col("label"), col("m"), col("i"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1))).cast("long")
        .as("cx"))
      .groupBy(col("m"), col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("cx")))),
        p => p.getField("cx")).as("cvec"))
      .select(col("m"), col("label").as("code"), col("cvec"))
    // --- encode: nearest codebook entry per (vector, subspace), exact L2 ---
    val wE = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(asc("d2"), asc("code"))
    val codes = sub.join(broadcast(cb), Seq("m"))
      .select(col("vec_id"), col("cell"), col("m"), col("code"),
        (Similarity.normSqQ(col("sv")) + Similarity.normSqQ(col("cvec"))
          - lit(2L) * Similarity.dotQ(col("sv"), col("cvec"))).as("d2"))
      .withColumn("rn", row_number().over(wE))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("m"), col("code"))
    // --- search: NPROBE cells per query; ADC over codes in those cells ---
    val probes = ranked.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("cell"), col("qcdot"))
    val qsub = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"),
        explode(array((0 until PQ_M).map(m => struct(lit(m).as("m"),
          slice(col("qv"), m * PQ_SUB + 1, PQ_SUB).as("sv"))): _*)).as("s"))
      .select(col("q_id"), col("s.m").as("m"), col("s.sv").as("sv"))
    val lut = qsub.join(broadcast(cb), Seq("m"))
      .select(col("q_id"), col("m"), col("code"),
        Similarity.dotQ(col("sv"), col("cvec")).as("pdot"))
    // candidate scan = codes ⋈ probes on cell: rows touched are exactly
    // the probed cells' code mass (n_cell·M), never the full table
    val cand = ivfpqCandidates(codes, probes)
    val sc = cand.join(lut, Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("vec_id"), col("cell"), col("qcdot"))
      .agg(sum(col("pdot")).cast("long").as("rdot"))
      .select(col("q_id"), col("vec_id").as("cand_id"), col("cell"),
        (col("qcdot") + col("rdot")).as("adc_dot"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(desc("adc_dot"), asc("cand_id"))
    val result = sc.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("cand_id"),
        col("cell").cast("int").as("cell"),
        col("rn").cast("long").as("rank"), col("adc_dot"))
    IvfPqFrames(asg.drop("rv"), probes, cand, result)
  }

  val knnIvfpq = Q(
    "knn_ivfpq",
    (s, dir) => ivfpqFrames(prepared(s, dir)).result,
    Some(s"""
      WITH qe AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(ROUND(x*1e6) AS BIGINT)) AS qv
        FROM embeddings),
      cent0 AS (
        SELECT label, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, unnest(qv) AS x,
                unnest(generate_series(1, len(qv))) AS i
              FROM qe)
        GROUP BY label, i),
      cent AS (
        SELECT label AS cell, list(cx ORDER BY i) AS cvec FROM cent0
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, e.label, e.qv, c.cell, c.cvec,
          CAST(list_sum(list_transform(list_zip(e.qv, c.cvec),
               s -> s[1] * s[2])) AS BIGINT) AS qcdot,
          CAST(list_sum(list_transform(list_zip(e.qv, c.cvec),
               s -> s[1] * s[2])) AS DOUBLE) /
          (sqrt(CAST(list_sum(list_transform(e.qv, x -> x*x)) AS DOUBLE)) *
           sqrt(CAST(list_sum(list_transform(c.cvec, x -> x*x)) AS DOUBLE)))
            AS ccos
        FROM qe e CROSS JOIN cent c),
      asg AS (
        SELECT vec_id, label, cell,
          list_transform(list_zip(qv, cvec), p -> p[1] - p[2]) AS rv
        FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cell) AS rn
          FROM scored) WHERE rn = 1),
      sub AS (
        SELECT vec_id, label, cell, m,
          list_slice(rv, m*$PQ_SUB + 1, m*$PQ_SUB + $PQ_SUB) AS sv
        FROM asg, (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m)),
      cb0 AS (
        SELECT label, m, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, m, unnest(sv) AS x,
                unnest(generate_series(1, len(sv))) AS i
              FROM sub)
        GROUP BY label, m, i),
      cb AS (
        SELECT m, label AS code, list(cx ORDER BY i) AS cvec FROM cb0
        GROUP BY m, label),
      enc AS (
        SELECT vec_id, cell, m, code FROM (
          SELECT s.vec_id, s.cell, s.m, c.code,
            row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
              list_sum(list_transform(list_zip(s.sv, c.cvec),
                p -> (p[1]-p[2])*(p[1]-p[2]))) ASC, c.code ASC) AS rn
          FROM sub s JOIN cb c ON c.m = s.m) WHERE rn = 1),
      probes AS (
        SELECT vec_id AS q_id, cell, qcdot FROM (
          SELECT vec_id, cell, qcdot,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY ccos DESC, cell) AS rn
          FROM scored WHERE vec_id % 50 = 0) WHERE rn <= $NPROBE),
      qsub AS (
        SELECT vec_id AS q_id, m,
          list_slice(qv, m*$PQ_SUB + 1, m*$PQ_SUB + $PQ_SUB) AS sv
        FROM qe, (SELECT unnest(generate_series(0, ${PQ_M - 1})) AS m)
        WHERE vec_id % 50 = 0),
      lut AS (
        SELECT q.q_id, c.m, c.code,
          CAST(list_sum(list_transform(list_zip(q.sv, c.cvec),
            p -> p[1]*p[2])) AS BIGINT) AS pdot
        FROM qsub q JOIN cb c ON c.m = q.m),
      sc AS (
        SELECT p.q_id, e.vec_id AS cand_id, p.cell,
          CAST(p.qcdot + SUM(l.pdot) AS BIGINT) AS adc_dot
        FROM probes p
        JOIN enc e ON e.cell = p.cell AND e.vec_id <> p.q_id
        JOIN lut l ON l.q_id = p.q_id AND l.m = e.m AND l.code = e.code
        GROUP BY p.q_id, e.vec_id, p.cell, p.qcdot),
      r AS (
        SELECT q_id, cand_id, cell, adc_dot,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY adc_dot DESC, cand_id) AS rn
        FROM sc)
      SELECT q_id, cand_id, CAST(cell AS INTEGER) AS cell,
             CAST(rn AS BIGINT) AS rank, adc_dot
      FROM r WHERE rn <= 3"""))

  private val NEARDUP_BANDS = 4
  private val NEARDUP_BITS = 8 // sign bits per band

  /** Embedding-cosine near-duplicate detection, sign-LSH banded:
    * candidate pairs share a label cell AND at least one of 4 8-bit
    * sign-pattern bands (random-hyperplane LSH with axis-aligned
    * planes); exact fixed-point cosine ≥ 0.9 on candidates only. The
    * previous label-cell all-pairs join was O(n²/L) with a FIXED label
    * count — the 256-way band split cuts the constant 256-fold but,
    * like ANY continuous-cosine LSH at τ = 0.9, keeps a nonzero
    * random-collision floor (p₂·n²/L·B/2^bits): see semanticDedup's
    * scale note for the measured growth and the cluster-count-∝-n
    * regime that bounds it on real corpora.
    * Runs over [[plantedEmb]]: the synthetic corpus is measured-uniform
    * (no natural pair reaches 0.9), so the planted perturbed copies
    * make the expected output non-empty — the oracle proves the
    * pipeline finds every planted pair instead of matching 0 = 0. */
  val embedNearDup = Q(
    "embed_neardup",
    (s, dir) => {
      val e = prepare(plantedEmb(s, dir)).cache()
      val bandCols = (0 until NEARDUP_BANDS).map { b =>
        val bits = (0 until NEARDUP_BITS).map { j =>
          when(element_at(col("qv"), b * NEARDUP_BITS + j + 1) >= 0,
            lit("1")).otherwise(lit("0"))
        }
        struct(lit(b).as("band"), concat(bits: _*).as("bv"))
      }
      val bands = e.select(col("vec_id"), col("label"),
          explode(array(bandCols: _*)).as("bb"))
        .select(col("vec_id"), col("label"),
          col("bb.band").as("band"), col("bb.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.label") === col("b.label") &&
            col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
        .distinct()
      cand
        .join(e.select(col("vec_id").as("a_id"), col("qv").as("qa"),
          col("nsq").as("nq")), "a_id")
        .join(e.select(col("vec_id").as("b_id"), col("qv").as("qb"),
          col("nsq").as("nc")), "b_id")
        .select(col("a_id"), col("b_id"),
          Similarity.dotQ(col("qa"), col("qb")).as("dot"),
          col("nq"), col("nc"))
        .withColumn("cos", cosExpr)
        .filter(col("cos") >= 0.9)
        .select(col("a_id"), col("b_id"), col("cos"))
    },
    Some {
      def sqlBits(b: Int): String =
        (0 until NEARDUP_BITS).map { j =>
          s"(CASE WHEN CAST(ROUND(embedding[${b * NEARDUP_BITS + j + 1}]*1e6) AS BIGINT) >= 0 THEN '1' ELSE '0' END)"
        }.mkString(" || ")
      val bandSelects = (0 until NEARDUP_BANDS).map(b =>
        s"SELECT vec_id, label, $b AS band, ${sqlBits(b)} AS bv FROM emb")
        .mkString("\n        UNION ALL ")
      s"""
      WITH emb AS (
        $sqlPlantedEmb),
      bands AS (
        $bandSelects),
      cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM bands a JOIN bands b
          ON a.label = b.label AND a.band = b.band AND a.bv = b.bv
          AND a.vec_id < b.vec_id)
      SELECT a_id, b_id, cos FROM (
        SELECT c.a_id, c.b_id,
          ROUND(CAST(${sqlDotFx("a.embedding", "b.embedding")} AS DOUBLE) /
            (sqrt(CAST(${sqlNormSqFx("a.embedding")} AS DOUBLE)) *
             sqrt(CAST(${sqlNormSqFx("b.embedding")} AS DOUBLE))), 6) AS cos
        FROM cand c
        JOIN emb a ON a.vec_id = c.a_id
        JOIN emb b ON b.vec_id = c.b_id)
      WHERE cos >= 0.9"""
    })

  private val SEMDEDUP_TAU = 0.9

  /** DuckDB twin of semantic_dedup's sign-band explode (bits read from
    * the shared quantized vector, so both engines band identically). */
  private def semdedupBandSelects: String =
    (0 until NEARDUP_BANDS).map { b =>
      val bits = (0 until NEARDUP_BITS).map { j =>
        s"(CASE WHEN e.qv[${b * NEARDUP_BITS + j + 1}] >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"SELECT a.vec_id, a.cell, a.ccos, $b AS band, $bits AS bv " +
        "FROM asg a JOIN qe e ON e.vec_id = a.vec_id"
    }.mkString("\n        UNION ALL ")

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540) —
    * the LLM-corpus semantic dedup recipe: k-means-cluster the
    * embeddings, compare pairs ONLY within a cluster, and among
    * semantic duplicates (pair cosine ≥ τ) KEEP the example with the
    * LOWEST similarity to its cluster centroid (the paper's §2.2 rule
    * — low-centroid-similarity points carry the most marginal
    * information). The verdict here is the paper's rule made
    * deterministic and join-shaped: drop v iff some τ-neighbor in its
    * cluster precedes it under (centroid-cos asc, vec_id asc) — the
    * minimum of every duplicate group always survives, and the rule
    * needs no iterative peeling so it stays two hash joins.
    *
    * Scale — stated precisely, because this operator is NOT like the
    * exact-content dedup ladder: minhash_lsh/ngram_jaccard probe
    * linear because their md5 band keys carry ~zero random-collision
    * mass, but ANY LSH family for continuous cosine at τ = 0.9 has
    * p₂ > 0 on random pairs, so candidates grow ~p₂·n²/cells — the
    * scale probe measures exactly that on its uniform-random inflated
    * embeddings (1.74 → 3133 MB shuffle for ×10 → ×100 when cluster
    * SIZES grow with n), which is why semantic_dedup is excluded from
    * ScaleProbe.defaultQueries with this note. SemDeDup's own answer,
    * and this operator's scale knob, is cluster count ∝ n (the paper
    * runs k = 50k on 1.7B examples): per-cluster work is then
    * bounded·n, and billion-scale cluster ASSIGNMENT is the already-
    * built IVF machinery (knn_ivf / knn_ivfpq), not a broadcast. The
    * sign-band prefilter here bounds the verify stage to colliding
    * pairs (planted copies preserve every sign bit, so they collide
    * certainly); candidates are hash-join-shaped on (cell, band,
    * bits), never an explicit all-pairs. Training reuses knn_ivf's
    * fixed-point one-Lloyd-step coarse quantizer. Integer-exact /
    * shared-float-expression discipline throughout, so DuckDB agrees
    * bit-for-bit. */

  /** Verdict stage of semantic_dedup, factored for the scale spec:
    * asg = (vec_id, qv, nsq, cell, ccos) — any clustering (the query
    * uses the label-trained quantizer; SemDedupScaleSpec drives it
    * with cluster count ∝ n, the paper's regime) → one row per
    * vector with its keep/drop verdict. */
  /** Banded within-cluster candidate pairs of semantic_dedup — the
    * cost-bearing frame, exposed so SemDedupScaleSpec can MEASURE the
    * growth law: with cluster count ∝ n (the paper's regime) the
    * count grows ~linearly; at fixed cluster count the LSH
    * random-collision floor makes it ~quadratic (see semanticDedup's
    * scale note). Rows: (vec_id, b_id) where b_id precedes vec_id
    * under (ccos, id). */
  private[graft] def semanticCandidates(asg: DataFrame): DataFrame = {
    // --- banded within-cluster candidates; keeper = min(ccos, id) ---
    val bandCols = (0 until NEARDUP_BANDS).map { b =>
      val bits = (0 until NEARDUP_BITS).map { j =>
        when(element_at(col("qv"), b * NEARDUP_BITS + j + 1) >= 0,
          lit("1")).otherwise(lit("0"))
      }
      struct(lit(b).as("band"), concat(bits: _*).as("bv"))
    }
    val bands = asg.select(col("vec_id"), col("cell"), col("ccos"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("vec_id"), col("cell"), col("ccos"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    bands.as("a").join(bands.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") =!= col("b.vec_id") &&
          (col("b.ccos") < col("a.ccos") ||
            (col("b.ccos") === col("a.ccos") &&
              col("b.vec_id") < col("a.vec_id"))))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("b_id"))
      .distinct()
  }

  private[graft] def semanticVerdicts(asg: DataFrame): DataFrame = {
      val cand = semanticCandidates(asg)
      val dropped = cand
        .join(asg.select(col("vec_id"), col("qv"), col("nsq")), "vec_id")
        .join(asg.select(col("vec_id").as("b_id"), col("qv").as("b_qv"),
          col("nsq").as("b_nsq")), "b_id")
        .filter(round(Similarity.cosineFx(
            Similarity.dotQ(col("qv"), col("b_qv")),
            col("nsq"), col("b_nsq")), 6) >= SEMDEDUP_TAU)
        .select(col("vec_id")).distinct()
        .withColumn("dropped", lit(1L))
      asg.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("ccos"),
          when(col("dropped").isNotNull, lit(0L)).otherwise(lit(1L))
            .as("kept"))
  }

  val semanticDedup = Q(
    "semantic_dedup",
    (s, dir) => {
      val e = prepare(plantedEmb(s, dir)).cache()
      // train + assign through the SHARED coarse quantizer
      // ([[coarseCentroids]]/[[coarseScored]]; ties: lowest cell)
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(desc("ccos"), asc("cell"))
      val asg = coarseScored(e).withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("qv"), col("nsq"), col("cell"),
          round(col("ccos"), 6).as("ccos"))
        .cache()
      semanticVerdicts(asg)
    },
    Some(s"""
      WITH emb AS ($sqlPlantedEmb),
      qe AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(ROUND(x*1e6) AS BIGINT)) AS qv
        FROM emb),
      cent0 AS (
        SELECT label, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, unnest(qv) AS x,
                unnest(generate_series(1, len(qv))) AS i
              FROM qe)
        GROUP BY label, i),
      cent AS (
        SELECT label AS cell, list(cx ORDER BY i) AS cvec FROM cent0
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, c.cell,
          CAST(list_sum(list_transform(list_zip(e.qv, c.cvec),
               s -> s[1] * s[2])) AS DOUBLE) /
          (sqrt(CAST(list_sum(list_transform(e.qv, x -> x*x)) AS DOUBLE)) *
           sqrt(CAST(list_sum(list_transform(c.cvec, x -> x*x)) AS DOUBLE)))
            AS ccos
        FROM qe e CROSS JOIN cent c),
      asg AS (
        SELECT vec_id, cell, ROUND(ccos, 6) AS ccos FROM (
          SELECT vec_id, cell, ccos, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cell) AS rn
          FROM scored) WHERE rn = 1),
      bands AS (
        $semdedupBandSelects),
      cand AS (
        SELECT DISTINCT a.vec_id, b.vec_id AS b_id
        FROM bands a JOIN bands b
          ON a.cell = b.cell AND a.band = b.band AND a.bv = b.bv
          AND a.vec_id <> b.vec_id
          AND (b.ccos < a.ccos OR (b.ccos = a.ccos AND b.vec_id < a.vec_id))),
      dropped AS (
        SELECT DISTINCT c.vec_id
        FROM cand c
        JOIN qe ea ON ea.vec_id = c.vec_id
        JOIN qe eb ON eb.vec_id = c.b_id
        WHERE ROUND(
          CAST(list_sum(list_transform(list_zip(ea.qv, eb.qv),
               s -> s[1] * s[2])) AS DOUBLE) /
          (sqrt(CAST(list_sum(list_transform(ea.qv, x -> x*x)) AS DOUBLE)) *
           sqrt(CAST(list_sum(list_transform(eb.qv, x -> x*x)) AS DOUBLE))),
          6) >= $SEMDEDUP_TAU)
      SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell, a.ccos,
        CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id"""))

  /** Embedding-space outlier detection — the curation complement of
    * [[semanticDedup]] (SemDeDup keeps a dup group's LOW-centroid-cos
    * member; this flags the corpus-wide low tail): train the same
    * one-Lloyd-step coarse quantizer as knn_ivf, assign every vector
    * to its nearest centroid by cosine, and emit each cluster's k=5
    * LEAST prototypical members (lowest cosine to their own centroid,
    * vec_id tiebreak) — the "far from every cluster center" documents
    * a curation pass reviews or drops (SSL-prototype pruning,
    * Sorscher et al. NeurIPS 2022 use the same per-cluster-distance
    * signal).
    *
    * Scale shape: training + assignment are knn_ivf's (broadcast
    * centroids, per-vector bounded window over #cells rows); the
    * bottom-k per cluster runs through the O(k) BoundedTopK aggregate
    * + semi-join ([[graft.operators.Relational.boundedTopKPerKey]]) —
    * map-side combinable, AQE-splittable, NO per-cluster window over
    * the full membership (a cluster is n/cells rows; a window
    * partition that size is a straggler by construction). The final
    * rank window orders ≤ k·cells surviving rows. */
  val embedOutliers = Q(
    "embed_outliers",
    (s, dir) => {
      val e = prepared(s, dir).cache()
      // train + assign through the SHARED coarse quantizer
      // ([[coarseCentroids]]/[[coarseScored]]; ties: lowest cell)
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(desc("ccos"), asc("cell"))
      val asg = coarseScored(e).withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cell"), round(col("ccos"), 6).as("ccos"))
      val picked = graft.operators.Relational.boundedTopKPerKey(
        asg, Seq("cell"),
        struct(col("ccos"), col("vec_id").as("id")), "vec_id", 5)
      val wRank = Window.partitionBy(col("cell"))
        .orderBy(asc("ccos"), asc("vec_id"))
      picked.withColumn("rank", row_number().over(wRank).cast("long"))
        .select(col("cell").cast("int").as("cell"), col("vec_id"),
          col("ccos"), col("rank"))
    },
    Some(s"""
      WITH qe AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(ROUND(x*1e6) AS BIGINT)) AS qv
        FROM embeddings),
      cent0 AS (
        SELECT label, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, unnest(qv) AS x,
                unnest(generate_series(1, len(qv))) AS i
              FROM qe)
        GROUP BY label, i),
      cent AS (
        SELECT label AS cell, list(cx ORDER BY i) AS cvec FROM cent0
        GROUP BY label),
      scored AS (
        SELECT e.vec_id, c.cell,
          CAST(list_sum(list_transform(list_zip(e.qv, c.cvec),
               s -> s[1] * s[2])) AS DOUBLE) /
          (sqrt(CAST(list_sum(list_transform(e.qv, x -> x*x)) AS DOUBLE)) *
           sqrt(CAST(list_sum(list_transform(c.cvec, x -> x*x)) AS DOUBLE)))
            AS ccos
        FROM qe e CROSS JOIN cent c),
      asg AS (
        SELECT vec_id, cell, ROUND(ccos, 6) AS ccos FROM (
          SELECT vec_id, cell, ccos, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cell) AS rn
          FROM scored) WHERE rn = 1),
      r AS (
        SELECT vec_id, cell, ccos,
          row_number() OVER (PARTITION BY cell
                             ORDER BY ccos, vec_id) AS rn
        FROM asg)
      SELECT CAST(cell AS INTEGER) AS cell, vec_id, ccos,
        CAST(rn AS BIGINT) AS rank
      FROM r WHERE rn <= 5"""))

  private val KMEANS_ITERS = 3

  /** Full Lloyd k-means TRAINING over the embedding corpus — the IVF/
    * SemDeDup coarse quantizer run to convergence instead of the
    * single step the other queries share (Lloyd 1982, the classic;
    * the ANN queries' one-step trainer is iteration 0 of exactly this
    * loop). Init = the per-label floor-mean (the shared
    * [[coarseCentroids]], so this query and the ANN family provably
    * start from the same codebook); each iteration assigns every
    * vector to its nearest centroid by EXACT integer squared L2
    * (‖v‖² + ‖c‖² − 2v·c on the fixed-point values, ties → lowest
    * cell — min(struct), Window-free) and recomputes centroids as the
    * fixed-point floor-mean of their members. Integer-exact end to
    * end, so all three unrolled iterations hash-match DuckDB. Empty
    * cells die naturally in both engines (no members → no group row).
    *
    * Scale shape per iteration: centroids are a K×64 broadcast, so
    * assignment is map-only over the vectors (the IVF assign path);
    * the argmin is a map-side-combinable min(struct) keyed on vec_id;
    * the update is one posexplode + two keyed aggregations whose
    * output is K×64 rows. Nothing all-pairs, nothing collected; the
    * loop's lineage is a linear chain (each centroid frame is
    * referenced exactly once by the next iteration). Output = the
    * final per-vector assignment with its exact distance, which pins
    * every centroid of every iteration transitively. */
  /** Per-vector nearest-centroid assignment by exact integer squared
    * L2 (ties → lowest cell) — min(struct), Window-free. */
  private[graft] def kmeansAssign(e: DataFrame, cent: DataFrame)
      : DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("dist", col("nsq") + col("cnsq") -
        lit(2L) * Similarity.dotQ(col("qv"), col("cvec")))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cell"))).as("b"))
      .select(col("vec_id"), col("b.cell").as("cell"),
        col("b.dist").as("dist"))

  /** Centroid update: fixed-point floor-mean of each cell's members. */
  private[graft] def kmeansUpdate(e: DataFrame, asg: DataFrame)
      : DataFrame =
    asg.join(e, "vec_id")
      .select(col("cell"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i"))
      .agg(floor(sum(col("x")).cast("double") / count(lit(1)))
        .cast("long").as("cx"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("cx")))),
        p => p.getField("cx")).as("cvec"))
      .withColumn("cnsq", Similarity.normSqQ(col("cvec")))

  /** Iteration-0 codebook = the shared one-step trainer. */
  private[graft] def kmeansInit(e: DataFrame): DataFrame =
    coarseCentroids(e).select(
      col("label").as("cell"), col("cvec"), col("cnsq"))

  private[graft] def preparedEmbeddings(s: SparkSession, dir: String)
      : DataFrame = prepared(s, dir)

  val kmeansTrain = Q(
    "kmeans_train",
    (s, dir) => {
      val e = prepared(s, dir).cache() // reused by all ITERS+1 passes;
      // Bench/Verify clear the block cache per query
      var cent = kmeansInit(e)
      for (_ <- 1 to KMEANS_ITERS)
        cent = kmeansUpdate(e, kmeansAssign(e, cent))
      kmeansAssign(e, cent)
        .select(col("vec_id"), col("cell").cast("int").as("cell"),
          col("dist"))
    },
    Some {
      val qdot = """CAST(list_sum(list_transform(list_zip(e.qv, c.cvec),
        s -> s[1] * s[2])) AS BIGINT)"""
      def iter(t: Int): String = {
        val prev = if (t == 0) "c0" else s"c$t"
        s""",
      s${t + 1} AS (
        SELECT e.vec_id, c.cell, e.nsq + c.cnsq - 2 * $qdot AS dist
        FROM qn e CROSS JOIN $prev c),
      a${t + 1} AS (
        SELECT vec_id, cell, dist FROM (
          SELECT vec_id, cell, dist, row_number() OVER (
            PARTITION BY vec_id ORDER BY dist, cell) AS rn
          FROM s${t + 1}) WHERE rn = 1)"""
      }
      def update(t: Int): String =
        s""",
      u$t AS (
        SELECT a.cell, i, CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*))
            AS BIGINT) AS cx
        FROM a$t a JOIN (SELECT vec_id, unnest(qv) AS x,
            unnest(generate_series(1, len(qv))) AS i FROM qn) v
          ON a.vec_id = v.vec_id
        GROUP BY a.cell, i),
      c$t AS (
        SELECT cell, list(cx ORDER BY i) AS cvec,
          CAST(list_sum(list_transform(list(cx ORDER BY i),
            x -> x * x)) AS BIGINT) AS cnsq
        FROM u$t GROUP BY cell)"""
      val iters = (0 until KMEANS_ITERS)
        .map(t => iter(t) + update(t + 1)).mkString
      s"""
      WITH qe AS (
        SELECT vec_id, label,
          list_transform(embedding, x -> CAST(ROUND(x*1e6) AS BIGINT)) AS qv
        FROM embeddings),
      qn AS (
        SELECT vec_id, label, qv,
          CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nsq
        FROM qe),
      c00 AS (
        SELECT label AS cell, i,
          CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cx
        FROM (SELECT label, unnest(qv) AS x,
                unnest(generate_series(1, len(qv))) AS i FROM qn)
        GROUP BY label, i),
      c0 AS (
        SELECT cell, list(cx ORDER BY i) AS cvec,
          CAST(list_sum(list_transform(list(cx ORDER BY i),
            x -> x * x)) AS BIGINT) AS cnsq
        FROM c00 GROUP BY cell)$iters,
      fin AS (
        SELECT e.vec_id, c.cell, e.nsq + c.cnsq - 2 * $qdot AS dist
        FROM qn e CROSS JOIN c$KMEANS_ITERS c)
      SELECT vec_id, CAST(cell AS INTEGER) AS cell, dist FROM (
        SELECT vec_id, cell, dist, row_number() OVER (
          PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM fin) WHERE rn = 1"""
    })

  val all: Seq[Q] =
    Seq(knnBruteforce, knnIvf, knnPq, knnIvfpq, embedNearDup, semanticDedup,
      embedOutliers, kmeansTrain)
}
