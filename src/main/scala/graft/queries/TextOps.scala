package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-scale training-data text pipeline operators over the
  * `documents` table: exact + near deduplication (hash, character
  * n-gram Jaccard, MinHash+LSH, SimHash), language id, quality
  * scoring, token counting, fingerprinting.
  *
  * Scale design notes (100 TB target):
  *  - shingling/minhashing is a narrow map (no shuffle); the only wide
  *    stages are the gram/band self-joins, which shuffle on gram/bucket
  *    keys — both are key-skew-bounded (a gram shared by all docs is a
  *    hot key; the LSH path caps the join to b buckets per doc, which
  *    is why it is the scale path and the exact gram join is the
  *    verification baseline).
  *  - all hash functions are Spark-native (`xxhash64`, `md5`) and
  *    codegen'd; no UDFs on the hot path.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Distinct character 3-grams per doc as a long (doc_id, gram) table. */
  private def gramTable(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(expr(
          "array_distinct(transform(sequence(1, greatest(length(text)-2, 1)), i -> substring(text, i, 3)))"))
          .as("gram"))

  /** Exact pairwise character-3gram Jaccard ≥ minJ, ids ordered a<b. */
  private def jaccardOn(cands: DataFrame, grams: DataFrame, minJ: Double): DataFrame = {
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ga = grams.select(col("doc_id").as("ida"), col("gram"))
    val gb = grams.select(col("doc_id").as("idb"), col("gram"))
    val inter = cands
      .join(ga, "ida").join(gb, Seq("idb", "gram"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "ida").withColumnRenamed("n", "na"), "ida")
      .join(sizes.withColumnRenamed("doc_id", "idb").withColumnRenamed("n", "nb"), "idb")
      .withColumn("jac", round(col("i") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jac") >= minJ)
      .select("ida", "idb", "jac")
      .orderBy("ida", "idb")
  }

  // MinHash parameters: k = b*r signature; with r=4, b=32 the candidate
  // probability at j=0.8 is 1-(1-0.8^4)^32 ≈ 1-5e-8 — effectively exact
  // recall at the 0.8 threshold while only shuffling b band keys per doc.
  private val K = 128
  private val R = 4
  private val B = 32

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup via hash-groupBy: canonical doc per md5 of the
    // normalized key (here: 40-char prefix), first-wins by doc_id.
    "dedup_exact_hash" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("key_hash", md5(substring(col("text"), 1, 40)))
        .groupBy("key_hash")
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
        .orderBy("key_hash")),

    // Exact character-3gram Jaccard near-dup pairs (the O(n²)-candidate
    // baseline; gram inverted-index join rather than a cross join).
    "dedup_ngram_jaccard" -> ((s, dir) => {
      val grams = gramTable(docs(s, dir))
      val ga = grams.select(col("doc_id").as("ida"), col("gram"))
      val gb = grams.select(col("doc_id").as("idb"), col("gram"))
      val cands = ga.join(gb, "gram").filter(col("ida") < col("idb"))
        .select("ida", "idb").distinct()
      jaccardOn(cands, grams, 0.8)
    }),

    // MinHash + LSH banding: signature of K=128 xxhash64 min-hashes,
    // B=32 bands of R=4 rows; bucket-join for candidates, then exact
    // Jaccard verification. Same output contract as dedup_ngram_jaccard
    // — the LSH path is the 100TB-scale route (no full gram self-join).
    "dedup_minhash_lsh" -> ((s, dir) => {
      val d = docs(s, dir)
      val withSig = d
        .withColumn("grams", expr(
          "array_distinct(transform(sequence(1, greatest(length(text)-2, 1)), i -> substring(text, i, 3)))"))
        .withColumn("sig", expr(
          s"transform(sequence(0, ${K - 1}), i -> array_min(transform(grams, g -> xxhash64(i, g))))"))
      val bands = withSig.select(col("doc_id"),
          explode(expr(
            s"transform(sequence(0, ${B - 1}), bi -> struct(bi AS band, aggregate(slice(sig, bi*$R+1, $R), 0L, (a, x) -> shiftleft(a, 7) ^ shiftright(a, 57) ^ x) AS bh))"))
            .as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      val l = bands.select(col("doc_id").as("ida"), col("band"), col("bh"))
      val r = bands.select(col("doc_id").as("idb"), col("band"), col("bh"))
      val rawCands = l.join(r, Seq("band", "bh")).filter(col("ida") < col("idb"))
        .select("ida", "idb").distinct()
      // Signature-similarity pre-filter: r=4/b=32 banding is near-
      // exhaustive below j≈0.6, so on skew-heavy corpora the candidate
      // set is huge; estimating j from the 128-component signature
      // (cheap zip_with, no gram shuffle) prunes to the j≳0.75 shell
      // before the exact-verification join. At j=0.8 the estimate is
      // Binomial(128, 0.8) — P(< 0.72·128) ≈ 1e-2‰, preserving oracle
      // parity; at j=0.6 almost everything is pruned.
      val sigs = withSig.select(col("doc_id"), col("sig"))
      val cands = rawCands
        .join(sigs.select(col("doc_id").as("ida"), col("sig").as("siga")), "ida")
        .join(sigs.select(col("doc_id").as("idb"), col("sig").as("sigb")), "idb")
        .withColumn("sig_sim", expr(
          s"aggregate(zip_with(siga, sigb, (a, b) -> if(a = b, 1, 0)), 0, (acc, x) -> acc + x) / ${K}.0"))
        .filter(col("sig_sim") >= 0.72)
        .select("ida", "idb")
      jaccardOn(cands, gramTable(d), 0.8)
    }),

    // SimHash (64-bit) over word tokens: per-bit majority vote of
    // xxhash64(token); emitted as the fingerprint plus the number of
    // tokens — no SQL oracle (hash function internal), rows-only.
    "dedup_simhash" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("hashes", expr("transform(toks, t -> xxhash64(t))"))
        .withColumn("simhash", expr(
          """aggregate(sequence(0, 63), 0L, (acc, b) ->
             acc | if(aggregate(hashes, 0L,
                       (v, h) -> v + if((shiftright(h, b) & 1L) = 1L, 1L, -1L)) > 0L,
                     shiftleft(1L, b), 0L))"""))
        .select("doc_id", "simhash")
        .orderBy("doc_id")),

    // Language id: per-language marker-token counts, argmax with a
    // deterministic preference order; 'und' when no marker fires.
    "text_langid" -> ((s, dir) => {
      def cnt(w: String): Column =
        size(filter(split(col("text"), " "), t => t === w))
      docs(s, dir)
        .withColumn("s_en", cnt("the") + cnt("a"))
        .withColumn("s_fr", cnt("le") + cnt("la"))
        .withColumn("s_de", cnt("der") + cnt("und"))
        .withColumn("s_es", cnt("el") + cnt("los"))
        .withColumn("best",
          greatest(col("s_en"), col("s_fr"), col("s_de"), col("s_es")))
        .withColumn("pred_lang",
          when(col("best") === 0, "und")
            .when(col("s_en") === col("best"), "en")
            .when(col("s_fr") === col("best"), "fr")
            .when(col("s_de") === col("best"), "de")
            .otherwise("es"))
        .select("doc_id", "pred_lang")
        .orderBy("doc_id")
    }),

    // Token counting: whitespace tokens + distinct tokens + chars.
    "text_tokens" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct_tokens"),
          length(col("text")).as("len"))
        .orderBy("doc_id")),

    // Quality scoring: stopword ratio, mean token length, short-doc flag.
    "text_quality" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val nStop = size(filter(toks, t => t.isin("the", "a")))
      docs(s, dir)
        .select(col("doc_id"),
          (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
          ((length(col("text")) - (nTok - 1)).cast("double") / nTok.cast("double"))
            .as("avg_token_len"),
          (nTok < 20).as("too_short"))
        .orderBy("doc_id")
    }),

    // Document fingerprinting: content hash (xxhash64) — engine-internal
    // hash, rows-only check (unit-tested for stability in ScalaTest).
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), xxhash64(col("text")).as("fp"))
        .orderBy("doc_id"))
  )

  /** Portable word-count in ANSI SQL: pad + double the separators so
    * word-boundary matches never overlap, then length arithmetic. */
  private def sqlWordCount(w: String): String =
    s"CAST((length(' ' || replace(text, ' ', '  ') || ' ') - " +
      s"length(replace(' ' || replace(text, ' ', '  ') || ' ', ' $w ', ''))) / ${w.length + 2} AS BIGINT)"

  private val exactJaccardSql =
    """WITH idx AS (SELECT unnest(range(1, 1000)) AS g),
       grams AS (
         SELECT DISTINCT doc_id, substr(text, CAST(g AS INT), 3) AS gram
         FROM documents JOIN idx ON g <= greatest(length(text) - 2, 1)),
       sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
         FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       jac AS (
         SELECT ida, idb, round(i * 1.0 / (sa.n + sb.n - i), 6) AS jac
         FROM inter
         JOIN sizes sa ON sa.doc_id = ida
         JOIN sizes sb ON sb.doc_id = idb)
       SELECT ida, idb, jac FROM jac WHERE jac >= 0.8 ORDER BY ida, idb"""

  def oracle: Map[String, String] = Map(
    "dedup_exact_hash" ->
      """SELECT md5(substr(text, 1, 40)) AS key_hash,
                min(doc_id) AS canonical_id, count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY key_hash""",
    "dedup_ngram_jaccard" -> exactJaccardSql,
    // The LSH path must reproduce the exact result at this threshold
    // (candidate recall ≈ 1 - 5e-8 at j = 0.8 with r=4, b=32).
    "dedup_minhash_lsh" -> exactJaccardSql,
    "text_langid" -> {
      val en = s"${sqlWordCount("the")} + ${sqlWordCount("a")}"
      val fr = s"${sqlWordCount("le")} + ${sqlWordCount("la")}"
      val de = s"${sqlWordCount("der")} + ${sqlWordCount("und")}"
      val es = s"${sqlWordCount("el")} + ${sqlWordCount("los")}"
      s"""WITH s AS (
            SELECT doc_id, $en AS s_en, $fr AS s_fr, $de AS s_de, $es AS s_es
            FROM documents)
          SELECT doc_id,
                 CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
                      WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
                      WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
                      WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
                      ELSE 'es' END AS pred_lang
          FROM s ORDER BY doc_id"""
    },
    "text_tokens" ->
      """SELECT doc_id,
                length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
                CAST(length(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_tokens,
                length(text) AS len
         FROM documents ORDER BY doc_id""",
    "text_quality" -> {
      val stop = s"${sqlWordCount("the")} + ${sqlWordCount("a")}"
      s"""WITH b AS (
            SELECT doc_id, text,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tok,
                   $stop AS n_stop
            FROM documents)
          SELECT doc_id,
                 CAST(n_stop AS DOUBLE) / n_tok AS stopword_ratio,
                 CAST(length(text) - (n_tok - 1) AS DOUBLE) / n_tok AS avg_token_len,
                 n_tok < 20 AS too_short
          FROM b ORDER BY doc_id"""
    }
  )
}
