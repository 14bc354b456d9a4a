package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Queries.{t, sqlMd5Long}
import graft.functions.{Hashing, Similarity, TextAnalysis}

/** Batch 4 — text analysis + deduplication over the `documents` table
  * (LLM-data-pipeline surface per BASELINE.json north star; reference
  * analogs: X3 signatures, X7 outlink extraction, X9 language ID,
  * T4 dedup).
  */
object QueriesText {

  /** Exact dedup: hash-groupBy on md5(text); lowest doc_id in each
    * signature group is the keeper (DeduplicationJob analog with
    * deterministic total order). */
  val dedupExact = Q(
    "dedup_exact",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val w = Window.partitionBy(col("sig"))
      d.select(col("doc_id"), md5(col("text")).as("sig"))
        .withColumn("keeper", min("doc_id").over(w))
        .select(col("doc_id"), col("sig"),
          when(col("doc_id") === col("keeper"), lit("keep"))
            .otherwise(lit("duplicate")).as("dedup_status"))
    },
    Some("""
      SELECT doc_id, sig,
        CASE WHEN doc_id = keeper THEN 'keep' ELSE 'duplicate' END AS dedup_status
      FROM (SELECT doc_id, md5(text) AS sig,
              MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
            FROM documents)"""))

  /** Token counting (whitespace tokenizer) — n_tokens, distinct tokens,
    * mean token length. */
  val tokenStats = Q(
    "token_stats",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val nTok = TextAnalysis.tokenCount(col("text"))
      d.select(col("doc_id"),
        nTok.as("n_tokens"),
        TextAnalysis.distinctTokenCount(col("text")).as("n_distinct"),
        round((length(col("text")) - (nTok - 1)).cast("double") / nTok, 4)
          .as("mean_token_len"))
    },
    Some("""
      SELECT doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
              / len(string_split(text, ' ')), 4) AS mean_token_len
      FROM documents"""))

  /** Language-ID heuristic: marker-lexicon hit counts, argmax with fixed
    * tiebreak (language-identifier plugin analog). */
  val langId = Q(
    "lang_id",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val hits = TextAnalysis.langMarkers.map { case (l, ws) =>
        TextAnalysis.markerHits(col("text"), ws).as(s"${l}_hits")
      }
      d.select(Seq(col("doc_id"), col("lang").as("labeled_lang")) ++ hits
          :+ TextAnalysis.predictLang(col("text")).as("predicted"): _*)
    },
    Some {
      val m = TextAnalysis.langMarkers.map { case (l, ws) =>
        l -> s"CAST(len(regexp_extract_all(text, '\\b(${ws.mkString("|")})\\b')) AS BIGINT)"
      }
      val hitCols = m.map { case (l, e) => s"$e AS ${l}_hits" }.mkString(",\n        ")
      s"""
      SELECT doc_id, lang AS labeled_lang,
        $hitCols,
        CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
             WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
             WHEN es_hits >= fr_hits THEN 'es'
             ELSE 'fr' END AS predicted
      FROM (SELECT doc_id, lang, text,
        ${m.map { case (l, e) => s"$e AS ${l}_hits" }.mkString(",\n        ")}
      FROM documents)"""
    })

  /** Quality scoring: stopword/length ratio blend (linear, engine-exact). */
  val qualityScore = Q(
    "quality_score",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScoreBp(col("text")).as("quality_bp"))
    },
    Some {
      val stop = TextAnalysis.langMarkers.head._2.mkString("|")
      s"""
      SELECT doc_id, lang,
        CAST(FLOOR((
          CAST(len(regexp_extract_all(text, '\\b($stop)\\b')) AS BIGINT)
            / CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.5
          + LEAST(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.3
          + LEAST((CAST(length(text) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0) * 0.2
        ) * 10000) AS BIGINT) AS quality_bp
      FROM documents"""
    })

  /** X7 outlink-extraction shape: regexp_extract_all + explode + count. */
  val outlinkExtract = Q(
    "outlink_extract",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("lang"),
          explode(regexp_extract_all(col("text"),
            lit("\\b(scan|join|merge|filter)\\b"))).as("token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("cnt"))
    },
    Some("""
      SELECT lang, token, COUNT(*) AS cnt
      FROM (SELECT lang,
              unnest(regexp_extract_all(text, '\b(scan|join|merge|filter)\b'))
                AS token
            FROM documents)
      GROUP BY lang, token"""))

  /** Exact n-gram Jaccard near-dup: char-trigram sets, candidate pairs
    * share a (source, lang) block, exact |∩|/|∪|. The inverted-index join
    * (shingle as key) is the 100 TB-safe candidate generator — no O(n²)
    * cross join. */
  val trigramJaccard = Q(
    "ngram_jaccard",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sh = d.select(col("doc_id"), col("source"), col("lang"),
          explode(Similarity.charShingles(col("text"), 3)).as("sh"))
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = sh.select(col("source"), col("lang"), col("sh"),
        col("doc_id").as("a_id"))
      val b = sh.select(col("source").as("source_b"), col("lang").as("lang_b"),
        col("sh").as("sh_b"), col("doc_id").as("b_id"))
      val inter = a.join(b,
          a("source") === b("source_b") && a("lang") === b("lang_b") &&
            a("sh") === b("sh_b") && a("a_id") < b("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("n", "na"), "a_id")
        .join(sz.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("n", "nb"), "b_id")
        .withColumn("jaccard",
          round(col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
    },
    Some("""
      WITH sh AS (
        SELECT DISTINCT doc_id, source, lang, substr(text, i, 3) AS sh
        FROM (SELECT doc_id, source, lang, text,
                unnest(generate_series(1, length(text)-2)) AS i
              FROM documents WHERE length(text) >= 3)),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        FROM sh a JOIN sh b
          ON a.source = b.source AND a.lang = b.lang AND a.sh = b.sh
          AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, inter,
        ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
      FROM inter JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
      WHERE ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) >= 0.5"""))

  /** X3 TextProfileSignature-shaped fingerprint: tokens ≥2 chars with
    * count ≥2, ordered by (count desc, token), joined and md5'd
    * (TextProfileSignature.java:66-160 semantics, quantization
    * simplified to the count-threshold). */
  val docFingerprint = Q(
    "doc_fingerprint",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val tc = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) >= 2)
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
      val prof = tc.groupBy("doc_id")
        .agg(md5(concat_ws(" ",
          transform(
            array_sort(collect_list(struct((col("c") * -1).as("nc"),
              col("token").as("token")))),
            x => x.getField("token")))).as("fp"))
      t(s, dir, "documents").select(col("doc_id"))
        .join(prof, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("fp"), md5(lit(""))).as("fingerprint"))
    },
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tc AS (SELECT doc_id, token, COUNT(*) AS c
             FROM tok WHERE length(token) >= 2
             GROUP BY doc_id, token HAVING COUNT(*) >= 2),
      f AS (SELECT doc_id, md5(string_agg(token, ' ' ORDER BY c DESC, token)) AS fp
            FROM tc GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(f.fp, md5('')) AS fingerprint
      FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id"""))

  /** Multimodal column plumbing: treat text bytes as an opaque binary
    * payload; extract typed metadata (size, digest, header hex, sniffed
    * type). The real decode step is the clearly-marked stub in
    * operators.Multimodal — this query checks the schema/metadata path. */
  val multimodalMeta = Q(
    "multimodal_meta",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val payload = col("text").cast("binary")
      val header = upper(hex(substring(payload, 1, 8)))
      d.select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(payload).as("digest"),
        header.as("header_hex"),
        when(header.startsWith("FFD8"), lit("image/jpeg"))
          .when(header.startsWith("89504E47"), lit("image/png"))
          .otherwise(lit("text/plain")).as("sniffed_type"))
    },
    Some("""
      SELECT doc_id,
        CAST(strlen(text) AS BIGINT) AS n_bytes,
        md5(text) AS digest,
        upper(hex(substr(text, 1, 8))) AS header_hex,
        CASE WHEN upper(hex(substr(text, 1, 8))) LIKE 'FFD8%' THEN 'image/jpeg'
             WHEN upper(hex(substr(text, 1, 8))) LIKE '89504E47%' THEN 'image/png'
             ELSE 'text/plain' END AS sniffed_type
      FROM documents"""))

  private val MINHASH_H = 12
  private val MINHASH_BAND = 3 // 4 bands of 3

  /** MinHash + LSH near-dup: word 3-shingles → 12 md5-seeded minhashes →
    * 4 bands of 3 → candidates = band-hash collisions → estimated
    * Jaccard = matching minhashes / 12. Fully deterministic (md5 family)
    * so even the LSH path is oracle-checkable. Banding keeps the
    * candidate join linear in collisions — the 100 TB scale path. */
  val minhashLsh = Q(
    "minhash_lsh",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sh = d.select(col("doc_id"),
        explode(Similarity.wordShingles(col("text"), 3)).as("sh"))
      val sig = sh.groupBy("doc_id").agg(
        Similarity.minhashAgg(col("sh"), 0).as("m0"),
        (1 until MINHASH_H).map(i =>
          Similarity.minhashAgg(col("sh"), i).as(s"m$i")): _*)
      val nBands = MINHASH_H / MINHASH_BAND
      val bandCols = (0 until nBands).map { b =>
        val ms = (b * MINHASH_BAND until (b + 1) * MINHASH_BAND)
          .map(i => col(s"m$i"))
        struct(lit(b).as("band"),
          Hashing.md5Long(concat_ws(",", ms: _*)).as("h"))
      }
      val bands = sig.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bh"))
        .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val sa = sig.toDF(sig.columns.map(c => s"a_$c"): _*)
      val sb = sig.toDF(sig.columns.map(c => s"b_$c"): _*)
      val matches = (0 until MINHASH_H)
        .map(i => when(col(s"a_m$i") === col(s"b_m$i"), 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, col("a_id") === col("a_doc_id"))
        .join(sb, col("b_id") === col("b_doc_id"))
        .select(col("a_id"), col("b_id"),
          round(matches.cast("double") / MINHASH_H, 4).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
    },
    Some {
      val mins = (0 until MINHASH_H).map(i =>
        s"MIN(${sqlMd5Long(s"'$i|' || sh")}) AS m$i").mkString(",\n            ")
      val nBands = MINHASH_H / MINHASH_BAND
      val bandSelects = (0 until nBands).map { b =>
        val ms = (b * MINHASH_BAND until (b + 1) * MINHASH_BAND)
          .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, ${sqlMd5Long(s"($ms)")} AS h FROM sig"
      }.mkString("\n        UNION ALL ")
      val matches = (0 until MINHASH_H)
        .map(i => s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""
      WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
              FROM tok WHERE len(t) >= 3)
        UNION
        SELECT DISTINCT doc_id, array_to_string(t, ' ') AS sh
        FROM tok WHERE len(t) < 3),
      sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
      bands AS (
        $bandSelects),
      cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id)
      SELECT a_id, b_id,
        ROUND(CAST($matches AS DOUBLE) / $MINHASH_H, 4) AS est_jaccard
      FROM cand JOIN sig sa ON a_id = sa.doc_id JOIN sig sb ON b_id = sb.doc_id
      WHERE ROUND(CAST($matches AS DOUBLE) / $MINHASH_H, 4) >= 0.5"""
    })

  private val SIMHASH_BITS = 60

  /** SimHash near-dup: 60-bit occurrence-weighted majority-vote hash per
    * doc, pairs within a lang block at hamming ≤ 12. */
  val simhash = Q(
    "simhash",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) >= 2)
        .withColumn("h60", Hashing.md5Long(col("token")))
      val votes = tok
        .select(col("doc_id"), col("lang"), col("h60"),
          explode(sequence(lit(0), lit(SIMHASH_BITS - 1))).as("i"))
        .withColumn("vote",
          when(expr("(shiftright(h60, CAST(i AS INT)) & 1) = 1"), 1)
            .otherwise(-1))
        .groupBy(col("doc_id"), col("lang"), col("i"))
        .agg(sum(col("vote")).as("v"))
      val sh = votes
        .withColumn("bitval",
          when(col("v") > 0,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))"))
            .otherwise(lit(0L)))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("bitval")).as("simhash"))
      val a = sh.select(col("lang"), col("doc_id").as("a_id"),
        col("simhash").as("ha"))
      val b = sh.select(col("lang").as("lang_b"), col("doc_id").as("b_id"),
        col("simhash").as("hb"))
      a.join(b, col("lang") === col("lang_b") && col("a_id") < col("b_id"))
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= 12)
        .select(col("a_id"), col("b_id"), col("hamming"))
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
      th AS (SELECT doc_id, lang, ${sqlMd5Long("token")} AS h60
             FROM tok WHERE length(token) >= 2),
      votes AS (
        SELECT doc_id, lang, i,
          SUM(CASE WHEN ((h60 >> i) & 1) = 1 THEN 1 ELSE -1 END) AS v
        FROM (SELECT *, unnest(generate_series(0, ${SIMHASH_BITS - 1})) AS i
              FROM th)
        GROUP BY doc_id, lang, i),
      sh AS (
        SELECT doc_id, lang,
          CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
               AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id, lang)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 12"""))

  val all: Seq[Q] = Seq(
    dedupExact, tokenStats, langId, qualityScore, outlinkExtract,
    trigramJaccard, docFingerprint, multimodalMeta, minhashLsh, simhash)
}
