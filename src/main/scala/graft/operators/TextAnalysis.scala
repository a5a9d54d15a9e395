package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import RelationalCore.davg

/** Text-analysis operators over the `documents` corpus — the signals a
  * training-data pipeline computes before filtering/dedup (token counts,
  * quality scores, language ID, fingerprints, shingle stats).
  *
  * Design: every per-document computation is a pure column expression
  * (split/filter/transform/aggregate higher-order functions) — codegen'd,
  * no UDFs, no shuffle until the final per-source aggregation. At 100 TB
  * this is embarrassingly parallel map work; the only exchange is the
  * small groupBy(source) at the end.
  *
  * Cross-engine determinism: ratios are computed as ONE division of two
  * exact integer sums (never averages of per-row doubles), so Spark and
  * the DuckDB oracle agree bit-for-bit regardless of partition order.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped — matches DuckDB
    * list_filter(regexp_split_to_array(text,'[ \t\n\x0b\f\r]+'), x -> x <> '');
    * native one-pass kernel ([[graft.functions.WsTokens]]), byte-exact
    * with the declarative filter(split(...)) pair it replaced.
    */
  private def toks: Column = graft.gfunctions.ws_tokens(col("text"))

  /** Word n-gram shingles as a per-row array (no explode needed by callers
    * that fold over them). Empty array when the doc has < n tokens.
    * Tokens are bound once per row (ExprUtil.bound) — without it the
    * per-shingle lambda re-tokenizes the text for every shingle (O(n^2)).
    */
  private[graft] def shingles(toksCol: Column, n: Int): Column =
    ExprUtil.bound(toksCol) { t =>
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", slice(t, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  // Stopword profiles for the n-gram language guess. Kept tiny and
  // literal so the oracle SQL can repeat them verbatim.
  private val enWords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val deWords = Seq("der", "die", "das", "und", "ist", "mit", "nicht")
  private val esWords = Seq("el", "los", "y", "que", "por", "con", "para")
  private val frWords = Seq("le", "les", "et", "est", "dans", "pour", "une")

  private def hits(toksCol: Column, words: Seq[String]): Column =
    size(filter(toksCol, t => t.isInCollection(words)))

  private def sqlHits(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, x -> x IN ($list)))"
  }

  val q30 = GraftQuery(
    "q30_token_count",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("source"), size(toks).as("n_tokens"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"),
          davg(col("n_tokens")).as("avg_tokens"),
          max(col("n_tokens")).as("max_tokens"),
        )
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(SUM(CAST(n_tokens AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_tokens,
      MAX(n_tokens) AS max_tokens
      FROM (SELECT source, len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS n_tokens
            FROM documents) t
      GROUP BY source ORDER BY source"""),
  )

  val q31 = GraftQuery(
    "q31_quality_score",
    (s, d) => {
      // Per-doc integer signals; ratios = one division of exact sums.
      val perDoc = Tables.documents(s, d).select(
        col("source"),
        length(col("text")).cast("long").as("n_chars_m"),
        size(toks).cast("long").as("n_tokens"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long").as("n_punct"),
        (length(col("text")) - length(regexp_replace(col("text"), "[ \\t\\n\\x0b\\f\\r]", ""))).cast("long").as("n_space"),
        hits(toks, enWords).cast("long").as("n_stop"),
      )
      perDoc
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          (sum(col("n_chars_m") - col("n_space")) / sum(col("n_tokens"))).as("avg_token_len"),
          (sum(col("n_punct")) / sum(col("n_chars_m"))).as("punct_ratio"),
          (sum(col("n_stop")) / sum(col("n_tokens"))).as("stopword_ratio"),
          (sum(when(col("n_tokens") < 30, lit(1L)).otherwise(lit(0L))) / count(lit(1))).as("short_doc_ratio"),
        )
        .orderBy("source")
    },
    Some("""WITH perdoc AS (
        SELECT source,
          CAST(length(text) AS BIGINT) AS n_chars_m,
          CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tokens,
          CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
          CAST(length(text) - length(regexp_replace(text, '[ \t\n\x0b\f\r]', '', 'g')) AS BIGINT) AS n_space,
          CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS n_stop
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        CAST(SUM(n_chars_m - n_space) AS BIGINT) / CAST(SUM(n_tokens) AS BIGINT) AS avg_token_len,
        CAST(SUM(n_punct) AS BIGINT) / CAST(SUM(n_chars_m) AS BIGINT) AS punct_ratio,
        CAST(SUM(n_stop) AS BIGINT) / CAST(SUM(n_tokens) AS BIGINT) AS stopword_ratio,
        CAST(SUM(CASE WHEN n_tokens < 30 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*) AS short_doc_ratio
      FROM perdoc GROUP BY source ORDER BY source"""),
  )

  val q32 = GraftQuery(
    "q32_lang_id",
    (s, d) => {
      // Stopword-profile language guess, argmax with a fixed tie-break
      // (en > de > es > fr > und) repeated verbatim in the oracle CASE.
      val scored = Tables.documents(s, d).select(
        col("lang"),
        hits(toks, enWords).as("en_h"),
        hits(toks, deWords).as("de_h"),
        hits(toks, esWords).as("es_h"),
        hits(toks, frWords).as("fr_h"),
      )
      val guessed = scored.withColumn(
        "guess",
        when(col("en_h") >= col("de_h") && col("en_h") >= col("es_h") && col("en_h") >= col("fr_h") && col("en_h") > 0, lit("en"))
          .when(col("de_h") >= col("es_h") && col("de_h") >= col("fr_h") && col("de_h") > 0, lit("de"))
          .when(col("es_h") >= col("fr_h") && col("es_h") > 0, lit("es"))
          .when(col("fr_h") > 0, lit("fr"))
          .otherwise(lit("und")),
      )
      guessed
        .groupBy("lang", "guess")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "guess")
    },
    Some("""WITH scored AS (
        SELECT lang,
          len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS en_h,
          len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist', 'mit', 'nicht'))) AS de_h,
          len(list_filter(toks, x -> x IN ('el', 'los', 'y', 'que', 'por', 'con', 'para'))) AS es_h,
          len(list_filter(toks, x -> x IN ('le', 'les', 'et', 'est', 'dans', 'pour', 'une'))) AS fr_h
        FROM (SELECT lang, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS toks FROM documents) t),
      guessed AS (
        SELECT lang,
          CASE WHEN en_h >= de_h AND en_h >= es_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
               WHEN de_h >= es_h AND de_h >= fr_h AND de_h > 0 THEN 'de'
               WHEN es_h >= fr_h AND es_h > 0 THEN 'es'
               WHEN fr_h > 0 THEN 'fr'
               ELSE 'und' END AS guess
        FROM scored)
      SELECT lang, guess, COUNT(*) AS n_docs
      FROM guessed GROUP BY lang, guess ORDER BY lang, guess"""),
  )

  /** Char-bigram linear lang-id model — [[q32]] upgraded to the q72
    * classifier discipline: per-language LITERAL weights over exact
    * char-bigram count features, one guarded double division per
    * ratio, a fixed-order weighted sum, and a fixed-tie-break argmax —
    * so the SCORES themselves, not just argmax labels, sit under the
    * DuckDB hash gate. The weights are a hand-fit stand-in with the
    * real fasttext-style model's shape (the QcW pattern); on a real
    * corpus the table is the trained model's top features, entering
    * the plan as literals exactly as here.
    */
  private[graft] val LangGrams: Seq[(String, Seq[(String, Double)])] = Seq(
    "en" -> Seq("th" -> 2.0, "he" -> 1.2, "of" -> 1.0, "nd" -> 0.8, "is" -> 0.6),
    "de" -> Seq("ch" -> 1.5, "ei" -> 1.2, "un" -> 1.0, "ie" -> 1.0, "sc" -> 0.8),
    "es" -> Seq("os" -> 1.5, "la" -> 1.2, "el" -> 1.0, "ar" -> 0.8, "qu" -> 0.8),
    "fr" -> Seq("ou" -> 1.2, "le" -> 1.2, "nt" -> 1.0, "ai" -> 1.0, "es" -> 0.8))

  /** Exact non-overlapping bigram count via length-delta of a literal
    * replace — leftmost non-overlapping semantics agree between Java
    * and DuckDB, and the arithmetic is all integer.
    */
  private def gramCountCol(g: String): Column =
    expr(s"(length(text) - length(replace(text, '$g', ''))) div ${g.length}").cast("long")

  private def langIdV2(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val nChars = length(col("text")).cast("long")
    def ratio(c: Column): Column =
      when(nChars === 0L, lit(0d)).otherwise(c.cast("double") / nChars.cast("double"))
    // fixed-order IEEE sum: left-to-right over the literal table, the
    // SAME order the generated oracle SQL states (one source of truth)
    def score(grams: Seq[(String, Double)]): Column =
      grams.map { case (g, w) => lit(w) * ratio(gramCountCol(g)) }.reduceLeft(_ + _)
    val scored = Tables.documents(s, d).select(
      col("doc_id") +: col("lang") +:
        LangGrams.map { case (l, grams) => score(grams).as(s"s_$l") }: _*)
    scored.withColumn(
      "guess",
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") && col("s_en") > 0d, lit("en"))
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") && col("s_de") > 0d, lit("de"))
        .when(col("s_es") >= col("s_fr") && col("s_es") > 0d, lit("es"))
        .when(col("s_fr") > 0d, lit("fr"))
        .otherwise(lit("und")))
  }

  /** The oracle SQL is GENERATED from [[LangGrams]], so weights,
    * feature order, and summation order cannot drift between engines —
    * the determinism contract is the shared literal table.
    */
  private def langIdV2Sql: String = {
    def scoreSql(grams: Seq[(String, Double)]): String =
      grams.map { case (g, w) =>
        s"$w * (CASE WHEN n_chars = 0 THEN 0.0 ELSE " +
          s"CAST(((length(text) - length(replace(text, '$g', ''))) // ${g.length}) AS DOUBLE) / n_chars END)"
      }.mkString(" + ")
    val scoreCols = LangGrams.map { case (l, grams) => s"${scoreSql(grams)} AS s_$l" }.mkString(",\n          ")
    s"""WITH c AS (
        SELECT doc_id, lang, text, CAST(length(text) AS BIGINT) AS n_chars FROM documents),
      scored AS (
        SELECT doc_id, lang,
          $scoreCols
        FROM c)
      SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
        CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
             WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
             WHEN s_fr > 0 THEN 'fr'
             ELSE 'und' END AS guess
      FROM scored ORDER BY doc_id"""
  }

  val q32v2 = GraftQuery(
    "q32_langid_v2",
    (s, d) => langIdV2(s, d).orderBy("doc_id"),
    Some(langIdV2Sql),
    prod = Some((s, d) => langIdV2(s, d)),
  )

  val q33 = GraftQuery(
    "q33_fingerprint",
    (s, d) => {
      // 64-bit order-independent document fingerprint: XOR-fold of the
      // XXH64 of every 3-shingle via the native shingle_xor64 kernel —
      // ZERO shuffles, one codegen'd pass per row (rows-only check; hash
      // algo is not ANSI-expressible — q33_fingerprint_md5 is the gated
      // twin). Docs with <3 tokens fall back to xxhash64(text);
      // n_shingles = max(n_toks - 2, 0) needs no shingle array at all.
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          greatest(size(toks) - 2, lit(0)).as("n_shingles"),
          coalesce(graft.gfunctions.shingle_xor64(toks), xxhash64(col("text")))
            .as("fingerprint"),
        )
        .orderBy("doc_id")
    },
    None,
  )

  /** Same zero-shuffle XOR-fold fingerprint as q33, but with md5-derived
    * 60-bit hashes (conv of the first 15 hex digits) so the identical
    * pipeline is expressible in ANSI SQL and the whole fingerprint — not
    * just its row count — sits under the driver's hash-compare gate. XOR
    * is order-independent, so the fold is partition- and engine-order
    * deterministic by construction.
    */
  private def fingerprintMd5(s: org.apache.spark.sql.SparkSession, d: String) = {
    val md5h = (c: Column) =>
      ExprUtil.md5Hash60(c)
    // The shingle array feeds BOTH output columns, so ExprUtil.bound (one
    // column's expression tree) can't cover it; materialize it as its own
    // projection instead — CollapseProject keeps a non-cheap alias that is
    // referenced more than once in a separate Project, so shingling runs
    // once per row, not once per use.
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), shingles(toks, 3).as("sh"))
      .select(
        col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        when(size(col("sh")) > 0,
          aggregate(transform(col("sh"), x => md5h(x)), lit(0L), (acc, h) => acc.bitwiseXOR(h)))
          .otherwise(md5h(col("text"))).as("fingerprint"),
      )
  }

  val q33md5 = GraftQuery(
    "q33_fingerprint_md5",
    (s, d) => fingerprintMd5(s, d).orderBy("doc_id"),
    Some("""WITH t AS (
        SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS toks
        FROM documents),
      sh AS (
        SELECT doc_id, toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS s
        FROM t CROSS JOIN UNNEST(range(0, greatest(len(toks) - 2, 0))) AS u(i)),
      fp AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               bit_xor(CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)) AS fingerprint
        FROM sh GROUP BY doc_id)
      SELECT d.doc_id,
        COALESCE(fp.n_shingles, 0) AS n_shingles,
        COALESCE(fp.fingerprint, CAST(('0x' || substr(md5(d.text), 1, 15)) AS BIGINT)) AS fingerprint
      FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
      ORDER BY d.doc_id"""),
    prod = Some((s, d) => fingerprintMd5(s, d)),
  )

  /** Production q34: the distinct-shingle exchange ships 8-byte XXH64
    * hashes (native shingle_hashes kernel) instead of ~20-byte shingle
    * strings, and the total count needs no shingle rows at all
    * (n_shingles = Σ max(n_toks-2, 0)). Distinct-over-hashes equals
    * distinct-over-strings up to 64-bit collisions (expected n²/2⁶⁵ —
    * zero until ~10⁹ distinct shingles per source; acceptable for a
    * corpus STATISTIC, which is why only the prod plan does it — the
    * gated plan keeps exact strings). Two aggregates over one scan:
    * the per-source totals agg is map-side tiny; only the slim
    * (source, hash) rows reach the distinct exchange.
    */
  private def ngramStatsProd(s: org.apache.spark.sql.SparkSession, d: String) = {
    val perDoc = Tables.documents(s, d).select(
      col("source"),
      greatest(size(toks) - 2, lit(0)).cast("long").as("n_sh"),
      graft.gfunctions.shingle_hashes(toks).as("h"),
    )
    val tot = perDoc.groupBy("source").agg(sum(col("n_sh")).as("n_shingles"))
    val dis = perDoc
      .select(col("source"), explode(col("h")).as("hash"))
      .groupBy("source")
      .agg(countDistinct(col("hash")).as("n_distinct"))
    tot.join(dis, "source")
      .select(
        col("source"), col("n_shingles"), col("n_distinct"),
        (col("n_distinct") / col("n_shingles")).as("distinct_ratio"))
  }

  val q34 = GraftQuery(
    "q34_ngram_stats",
    (s, d) => {
      val sh = shingles(toks, 3)
      Tables.documents(s, d)
        .select(col("source"), explode(sh).as("shingle"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_shingles"),
          countDistinct(col("shingle")).as("n_distinct"),
          (countDistinct(col("shingle")) / count(lit(1))).as("distinct_ratio"),
        )
        .orderBy("source")
    },
    Some("""WITH t AS (
        SELECT doc_id, source, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS toks
        FROM documents),
      g AS (
        SELECT source, toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS shingle
        FROM t CROSS JOIN UNNEST(range(0, greatest(len(toks) - 2, 0))) AS u(i))
      SELECT source, COUNT(*) AS n_shingles,
        COUNT(DISTINCT shingle) AS n_distinct,
        CAST(COUNT(DISTINCT shingle) AS BIGINT) / COUNT(*) AS distinct_ratio
      FROM g GROUP BY source ORDER BY source"""),
    prod = Some((s, d) => ngramStatsProd(s, d)),
  )

  val q35 = GraftQuery(
    "q35_tfidf",
    (s, d) => {
      // TF-IDF top term per document. Corpus stats via two hash aggregates
      // (term frequencies, document frequencies) + a broadcast-able join of
      // the df table; top term per doc = max(struct(tfidf, term)) — struct
      // ordering makes ties deterministic (lexicographically greatest term).
      // The corpus size rides INSIDE the plan as a broadcast 1-row
      // aggregate cross join — no separate driver-side count() action, so
      // one invocation = one job and `documents` is scanned once less.
      // rows-only: ln() last-ulp differences across engines make a hash
      // compare flaky; semantics are spec-asserted on planted docs instead.
      val docs = Tables.documents(s, d)
      val nDocs = docs.agg(count(lit(1)).cast("double").as("corpus_n"))
      val terms = docs.select(col("doc_id"), explode(toks).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("n_dt"))
      val len = tf.groupBy("doc_id").agg(sum(col("n_dt")).as("len_d"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
      tf.join(len, Seq("doc_id"))
        .join(df, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn(
          "tfidf",
          (col("n_dt") / col("len_d")) * log((col("corpus_n") + 1.0) / (col("df_t") + 1.0)))
        .groupBy("doc_id")
        .agg(max(struct(col("tfidf"), col("term"))).as("w"))
        .select(
          col("doc_id"),
          col("w.term").as("top_term"),
          round(col("w.tfidf"), 6).as("tfidf"))
        .orderBy("doc_id")
    },
    None,
  )

  /** LINEAR-idf term ranking under the HARD gate — the tfidf PLAN shape,
    * not the same weight as q35. Within a document it ranks terms by
    * n_dt * SCALE div df_t (exact bigint floor division, identical in
    * both engines): rank-equivalent to a linear-idf weight tf/len * N/df
    * (tf/len is a per-doc constant rescale), but NOT to q35's
    * log((N+1)/(df+1)) idf — log compresses the df axis, so the two
    * queries can pick different top terms (e.g. n_dt=2,df=1 beats
    * n_dt=10,df=100 on the linear ratio but can lose under log-idf), and
    * floor-division ties (broken lexicographically) can flip the winner
    * vs real division. What the gate proves is the PIPELINE — tokenize,
    * tf/df aggregates, vocab join, per-doc top-1 — exactly; q35 keeps the
    * classical log-idf weight as the rows-only twin. Same scale shape as
    * q35: two hash aggregates + a vocab-sized df join (broadcast-able;
    * the tf side never re-shuffles on the skewed stopword keys), one
    * window per doc for the top-1.
    */
  private def tfidfExact(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("n_dt"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val scored = tf.join(df, Seq("term"))
      .withColumn("score", expr("(n_dt * CAST(1000000000 AS BIGINT)) div df_t"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        col("n_dt"), col("df_t"), col("score"))
  }

  val q35exact = GraftQuery(
    "q35_tfidf_exact",
    (s, d) => tfidfExact(s, d).orderBy("doc_id"),
    Some("""WITH t AS (
        SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS toks
        FROM documents),
      terms AS (SELECT doc_id, unnest(toks) AS term FROM t),
      tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n_dt
        FROM terms GROUP BY doc_id, term),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.n_dt, df.df_t,
          CAST((tf.n_dt * 1000000000) // df.df_t AS BIGINT) AS score
        FROM tf JOIN df USING (term)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored)
      SELECT doc_id, term AS top_term, n_dt, df_t, score
      FROM ranked WHERE rn = 1 ORDER BY doc_id"""),
    prod = Some((s, d) => tfidfExact(s, d)),
  )

  // PII patterns kept RE2-safe (no lookarounds/backrefs) so Spark's Java
  // regex and DuckDB's RE2 match identically.
  private val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val UrlRe = "https?://[^ \\t\\n\\x0b\\f\\r]+"
  private val PhoneRe = "\\+[0-9]{7,15}"

  val q36 = GraftQuery(
    "q36_pii_scrub",
    (s, d) => {
      // Training-corpus PII redaction signals: match counts per class and
      // the byte delta a scrub pass would remove. All codegen'd regex
      // expressions, one aggregate.
      // Spark SQL string literals are backslash-escaped ('\+' -> '+'), so
      // double the backslashes here; DuckDB literals are not, so the oracle
      // interpolates the patterns verbatim.
      val n = (re: String) =>
        size(expr(s"regexp_extract_all(text, '${re.replace("\\", "\\\\")}', 0)")).cast("long")
      Tables.documents(s, d)
        .select(
          col("source"),
          n(EmailRe).as("n_emails"),
          n(UrlRe).as("n_urls"),
          n(PhoneRe).as("n_phones"),
          (length(col("text")) - length(
            regexp_replace(regexp_replace(regexp_replace(col("text"), EmailRe, ""), UrlRe, ""), PhoneRe, "")))
            .cast("long").as("redacted_chars"),
        )
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_urls")).as("n_urls"),
          sum(col("n_phones")).as("n_phones"),
          sum(col("redacted_chars")).as("redacted_chars"),
        )
        .orderBy("source")
    },
    Some(s"""SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(len(regexp_extract_all(text, '$EmailRe', 0))) AS BIGINT) AS n_emails,
      CAST(SUM(len(regexp_extract_all(text, '$UrlRe', 0))) AS BIGINT) AS n_urls,
      CAST(SUM(len(regexp_extract_all(text, '$PhoneRe', 0))) AS BIGINT) AS n_phones,
      CAST(SUM(length(text) - length(
        regexp_replace(regexp_replace(regexp_replace(text, '$EmailRe', '', 'g'), '$UrlRe', '', 'g'), '$PhoneRe', '', 'g')
      )) AS BIGINT) AS redacted_chars
      FROM documents GROUP BY source ORDER BY source"""),
  )

  val q37 = GraftQuery(
    "q37_repetition",
    (s, d) => {
      // Repetition quality signal (boilerplate/template detector): ratio of
      // repeated tokens per source as ONE division of exact counts.
      Tables.documents(s, d)
        .select(
          col("source"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
        )
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("n_distinct")).as("sum_distinct"),
          ((sum(col("n_tokens")) - sum(col("n_distinct"))) / sum(col("n_tokens"))).as("repetition_ratio"),
        )
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct,
      (CAST(SUM(n_tokens) AS BIGINT) - CAST(SUM(n_distinct) AS BIGINT)) / CAST(SUM(n_tokens) AS BIGINT) AS repetition_ratio
      FROM (SELECT source,
              len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS n_tokens,
              len(list_distinct(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> ''))) AS n_distinct
            FROM documents) t
      GROUP BY source ORDER BY source"""),
  )

  /** Corpus vocabulary head: the K most frequent tokens with their total
    * occurrence and document-frequency counts — the tokenizer/vocab-build
    * precursor (and the stopword-list generator for [[q31]]-style gates).
    *
    * Scale shape: explode → ONE hash aggregate keyed by token (map-side
    * partial combine collapses each partition's token stream before the
    * exchange, so the shuffle ships (token, counts) pairs, not the token
    * stream; doc frequency rides the same aggregate via the distinct
    * expand) → global top-K as TakeOrderedAndProject: per-partition
    * bounded heaps, never a full sort (PlanAuditSpec pins the same
    * property for q17). Ties at the cutoff break lexically in BOTH
    * engines, so the boundary is deterministic.
    */
  val q42 = GraftQuery(
    "q42_vocab_topk",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("token"))
        .groupBy("token")
        .agg(
          count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(100),
    Some("""SELECT token,
        CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM (SELECT doc_id,
              unnest(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS token
            FROM documents) t
      GROUP BY token
      ORDER BY n_occurrences DESC, token
      LIMIT 100"""),
  )

  // ------------------------------------------------------------ q46

  /** Pairwise vocabulary overlap between sources — the dataset-overlap
    * audit run before mixing corpora (near-identical vocabularies signal
    * the same crawl behind two names; jaccard_ppm is exact integer math
    * so the oracle hash-matches). Terms travel as 60-bit md5 hashes: the
    * vocab exchange and the self-join ship 8-byte keys, never strings.
    *
    * Scale shape: the term self-join's per-key fanout is bounded by the
    * number of SOURCES containing the term — at most S rows per term and
    * C(S,2) pairs total, where S is the dataset-catalog size (tens), not
    * the corpus size. The distinct is map-side combined per (source,
    * term); no unbounded blowup exists in this plan at any corpus scale.
    */
  private def sourceOverlap(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val md5h = (c: Column) => ExprUtil.md5Hash60(c)
    val vocab = Tables.documents(s, d)
      .select(col("source"), explode(toks).as("tok"))
      .select(col("source"), md5h(col("tok")).as("th"))
      .distinct()
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = vocab.as("a")
      .join(vocab.as("b"),
        col("a.th") === col("b.th") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("inter_terms"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("source", "source_a").withColumnRenamed("n", "na")), "source_a")
      .join(broadcast(sizes.withColumnRenamed("source", "source_b").withColumnRenamed("n", "nb")), "source_b")
      .select(
        col("source_a"),
        col("source_b"),
        col("inter_terms"),
        (col("na") + col("nb") - col("inter_terms")).as("union_terms"),
        expr("inter_terms * 1000000L div (na + nb - inter_terms)").as("jaccard_ppm"),
      )
  }

  // ------------------------------------------------------------ q48

  /** Posting-list doc_ids kept per term in the index head. */
  private val PostingHead = 5

  /** Inverted-index build: per term, document frequency, collection
    * frequency, and the posting head (the PostingHead smallest doc_ids,
    * comma-joined) — the search-side artifact a corpus pipeline ships
    * alongside the training shards.
    *
    * Scale shape: two map-side-combined hash aggregates over one token
    * explode — (term, doc) tf first, then the per-term rollup. The
    * posting head rides the native bounded-heap `top_k_by_score`
    * aggregate (O(k) state per term, no per-term sort); scoring on
    * -doc_id yields ascending ids, exact in the heap's DOUBLE scores
    * for ids < 2^52. Full posting lists at 100 TB would be written as
    * (term-bucket, doc) shards instead — the head is the bounded,
    * hash-comparable summary of the same build.
    */
  private def postings(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val perDoc = Tables.documents(s, d)
      .select(explode(toks).as("token"), col("doc_id"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("tf"))
    perDoc
      .groupBy("token")
      .agg(
        count(lit(1)).as("df"),
        sum("tf").as("cf"),
        graft.gfunctions.top_k_by_score(
          col("doc_id"), -col("doc_id").cast("double"), PostingHead).as("head"))
      .select(
        col("token"), col("df"), col("cf"),
        concat_ws(",",
          transform(col("head"), x => x.getField("neighbor_id").cast("string")))
          .as("posting_head"))
  }

  val q48 = GraftQuery(
    "q48_postings",
    (s, d) => postings(s, d).orderBy("token"),
    Some(s"""WITH tok AS (
        SELECT doc_id,
          unnest(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS token
        FROM documents),
      per AS (SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2)
      SELECT token,
        CAST(COUNT(*) AS BIGINT) AS df,
        CAST(SUM(tf) AS BIGINT) AS cf,
        array_to_string(list_sort(list(doc_id))[1:$PostingHead], ',') AS posting_head
      FROM per GROUP BY token ORDER BY token"""),
    prod = Some((s, d) => postings(s, d)),
  )

  // ------------------------------------------------------------ q51

  /** Corpus-derived bigram fluency score — the KenLM-style LM quality
    * filter of LLM pipelines, with the corpus itself as the model:
    * per doc, the mean of P(w2|w1) ~ c(w1 w2)/(c(w1) + 19) over its
    * bigrams, in exact integer arithmetic (ratio scaled to ppm, one
    * integer division per bigram, integer mean) so the full result
    * hash-matches — the q35_tfidf_exact move applied to LM scoring.
    * The +19 denominator smoothing is the prior that keeps singleton
    * evidence weak: without it a never-seen-before prefix scores a
    * perfect 1/1, so unique gibberish would rank as maximally fluent
    * (the spec plants exactly that trap). Gibberish scores low;
    * corpus-typical transitions score high.
    *
    * Scale shape: the bigram/unigram count tables ARE the LM — model-fit
    * aggregates (map-side combined, keyed on 60-bit md5 hashes so no
    * exchange carries n-gram strings). The per-doc pass joins the
    * bigram stream against them; with a vocabulary-bounded model AQE
    * broadcasts both sides, with an open vocabulary the joins shuffle
    * slim 8-byte keys. Counts scale: c * 10^6 overflows BIGINT only
    * past ~9*10^12 occurrences of one n-gram.
    */
  private def lmFluency(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val md5h = (c: Column) => ExprUtil.md5Hash60(c)
    // Stage table: the hashed bigram stream is consumed by the model-fit
    // aggregate AND the per-doc scoring join, and the unigram pass needs
    // the same tokens — pinned once (localCheckpoint locally; a persisted
    // stage table on a cluster), the corpus text is scanned and
    // tokenized exactly once instead of four times (same discipline as
    // Curate.stageTable / the minhash signature stage).
    val staged = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .localCheckpoint()
    // NOTE (r21, measured): re-hashing the prefix word per bigram looks
    // redundant next to a per-token hash array (transform(toks, md5h) +
    // element_at after posexplode), but that shape measured 15.1 s vs
    // 1.4 s here — the md5h lambda makes transform() CodegenFallback
    // (the ScaleProbe8 minhash lesson) and the carried array duplicates
    // across every exploded row. Two codegen'd md5s per bigram win.
    val big = staged
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("bigram"))
      .select(
        col("doc_id"),
        md5h(col("bigram")).as("bh"),
        md5h(substring_index(col("bigram"), " ", 1)).as("wh"))
      .localCheckpoint()
    val cb = big.groupBy("bh").agg(count(lit(1)).as("c_bi"))
    val cu = staged.select(explode(col("toks")).as("w1"))
      .select(md5h(col("w1")).as("wh"))
      .groupBy("wh").agg(count(lit(1)).as("c_uni"))
    val perDoc = big
      .join(cb, "bh")
      .join(cu, "wh")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(expr("c_bi * 1000000L div (c_uni + 19L)")).as("fluency_sum"))
    staged.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("fluency_sum"), lit(0L)).as("fluency_sum"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0L, lit(0L))
          .otherwise(expr("fluency_sum div n_bigrams")).as("avg_fluency_ppm"))
  }

  val q51 = GraftQuery(
    "q51_lm_fluency",
    (s, d) => lmFluency(s, d).orderBy("doc_id"),
    Some("""WITH t AS (
        SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS toks
        FROM documents),
      big AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5(toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT) AS bh,
          CAST(('0x' || substr(md5(toks[i+1]), 1, 15)) AS BIGINT) AS wh
        FROM t CROSS JOIN UNNEST(range(0, greatest(len(toks) - 1, 0))) AS u(i)),
      cb AS (SELECT bh, COUNT(*) AS c_bi FROM big GROUP BY bh),
      cu AS (
        SELECT CAST(('0x' || substr(md5(w1), 1, 15)) AS BIGINT) AS wh, COUNT(*) AS c_uni
        FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
      perdoc AS (
        SELECT b.doc_id, COUNT(*) AS n_bigrams,
          SUM(cb.c_bi * 1000000 // (cu.c_uni + 19)) AS fluency_sum
        FROM big b JOIN cb USING (bh) JOIN cu USING (wh)
        GROUP BY b.doc_id)
      SELECT d.doc_id,
        CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(p.fluency_sum, 0) AS BIGINT) AS fluency_sum,
        CAST(CASE WHEN COALESCE(p.n_bigrams, 0) = 0 THEN 0
                  ELSE p.fluency_sum // p.n_bigrams END AS BIGINT) AS avg_fluency_ppm
      FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
      ORDER BY d.doc_id"""),
    prod = Some((s, d) => lmFluency(s, d)),
  )

  // ------------------------------------------------------------ q54

  /** Per-source token-distribution drift vs the corpus — the monitoring
    * signal that catches a source going off-distribution (new crawl
    * template, language shift, spam injection) before it pollutes a
    * training mixture. Metric: scaled L1 deviation between the source's
    * token distribution and the corpus distribution,
    * l1_dev = Σ_t |o_st·N − T_s·c_t| (+ the absent-token mass
    * T_s·(N − Σ_present c_t), so the sum runs over the FULL vocabulary
    * without materializing zero rows), reported as drift_ppm ≈
    * 10^6 · TV-distance. Exact integer arithmetic end-to-end →
    * HARD-gate green. BIGINT headroom: o·N stays under 2^63 while
    * corpus tokens < ~3·10^9 per term-count product; past that, the
    * same formula moves to DECIMAL(38).
    *
    * Plan shape: two map-side-combined aggregates over one explode
    * (per-(source, token) and per-token), a broadcast of the per-source
    * totals and the 1-row corpus total, one final per-source aggregate.
    */
  private def sourceDrift(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val tok = Tables.documents(s, d).select(col("source"), explode(toks).as("t"))
    val bySrc = tok.groupBy("source", "t").agg(count(lit(1)).as("o"))
    val byTok = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val totals = bySrc.groupBy("source").agg(sum("o").as("ts"))
    val nRow = byTok.agg(sum("c").as("n"))
    bySrc
      .join(byTok, "t")
      .join(broadcast(totals), "source")
      .join(broadcast(nRow))
      .groupBy("source")
      .agg(
        first(col("ts")).as("n_tokens"),
        first(col("n")).as("n"),
        sum(abs(col("o") * col("n") - col("ts") * col("c"))).as("present_dev"),
        sum(col("c")).as("c_present"))
      .select(
        col("source"),
        col("n_tokens"),
        (col("present_dev") + col("n_tokens") * (col("n") - col("c_present")))
          .as("l1_dev"),
        col("n"))
      .select(
        col("source"),
        col("n_tokens"),
        col("l1_dev"),
        expr("l1_dev div greatest(2 * n_tokens * n div 1000000, 1)").as("drift_ppm"))
  }

  val q54 = GraftQuery(
    "q54_source_drift",
    (s, d) => sourceDrift(s, d).orderBy("source"),
    Some("""WITH tok AS (
        SELECT source,
          unnest(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS t
        FROM documents),
      by_src AS (SELECT source, t, COUNT(*) AS o FROM tok GROUP BY 1, 2),
      by_tok AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
      totals AS (SELECT source, SUM(o) AS ts FROM by_src GROUP BY 1),
      nrow AS (SELECT SUM(c) AS n FROM by_tok),
      agg AS (
        SELECT b.source,
          CAST(MAX(totals.ts) AS BIGINT) AS n_tokens,
          CAST(MAX(nrow.n) AS BIGINT) AS n,
          CAST(SUM(abs(b.o * nrow.n - totals.ts * by_tok.c)) AS BIGINT) AS present_dev,
          CAST(SUM(by_tok.c) AS BIGINT) AS c_present
        FROM by_src b
        JOIN by_tok USING (t)
        JOIN totals ON totals.source = b.source
        CROSS JOIN nrow
        GROUP BY b.source)
      SELECT source, n_tokens,
        CAST(present_dev + n_tokens * (n - c_present) AS BIGINT) AS l1_dev,
        CAST((present_dev + n_tokens * (n - c_present))
             // greatest(2 * n_tokens * n // 1000000, 1) AS BIGINT) AS drift_ppm
      FROM agg ORDER BY source"""),
    prod = Some((s, d) => sourceDrift(s, d)),
  )

  // ------------------------------------------------------------ q49

  /** Misra-Gries counters; presence guaranteed for freq > n/(HhK+1). */
  private val HhK = 64

  /** Heavy-token discovery via the native Misra-Gries aggregate: the
    * sketch pass holds HhK counters TOTAL per partition (any key domain
    * size — the point vs q42's vocab aggregate, whose map-side hash
    * state is vocabulary-sized and lethal for n-gram/URL domains), then
    * the <= HhK candidates are exactly recounted (map-side-combined agg
    * over a broadcast-semi-filtered stream) and filtered by the
    * guarantee threshold freq > n/(HhK+1). Every true heavy hitter is
    * guaranteed a candidate, so the confirmed output is DETERMINISTIC
    * and sits under the hard oracle gate — the same sketch-prefilter +
    * exact-confirm move as bloom decontamination.
    */
  private def heavyTokens(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val tokens = Tables.documents(s, d).select(explode(toks).as("token"))
    val cand = tokens
      .agg(graft.gfunctions.heavy_hitters(col("token"), HhK).as("hh"))
      .select(explode(col("hh")).as("c"))
      .select(col("c.token").as("token"))
    val total = tokens.agg(count(lit(1)).as("total"))
    tokens
      .join(broadcast(cand), Seq("token"), "leftsemi")
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(total))
      .filter(col("n_occurrences") * (HhK + 1) > col("total"))
      .select(col("token"), col("n_occurrences"))
  }

  val q49 = GraftQuery(
    "q49_heavy_tokens",
    (s, d) => heavyTokens(s, d).orderBy("token"),
    Some(s"""WITH tok AS (
        SELECT unnest(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS token
        FROM documents),
      c AS (SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY 1),
      t AS (SELECT COUNT(*) AS total FROM tok)
      SELECT token, CAST(n_occurrences AS BIGINT) AS n_occurrences
      FROM c, t
      WHERE n_occurrences * ${HhK + 1} > total
      ORDER BY token"""),
    prod = Some((s, d) => heavyTokens(s, d)),
  )

  val q46 = GraftQuery(
    "q46_source_overlap",
    (s, d) => sourceOverlap(s, d).orderBy("source_a", "source_b"),
    Some("""WITH v AS (
        SELECT DISTINCT source,
          CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS th
        FROM (
          SELECT source,
            unnest(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS tok
          FROM documents)),
      sz AS (SELECT source, COUNT(*) AS n FROM v GROUP BY source),
      px AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS inter_terms
        FROM v a JOIN v b ON a.th = b.th AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b,
        CAST(inter_terms AS BIGINT) AS inter_terms,
        CAST(sa.n + sb.n - inter_terms AS BIGINT) AS union_terms,
        CAST(inter_terms * 1000000 // (sa.n + sb.n - inter_terms) AS BIGINT) AS jaccard_ppm
      FROM px
      JOIN sz sa ON source_a = sa.source
      JOIN sz sb ON source_b = sb.source
      ORDER BY source_a, source_b"""),
    prod = Some((s, d) => sourceOverlap(s, d)),
  )

  /** BPE-style pre-tokenizer pieces: maximal letter runs, digit runs,
    * and single non-alphanumeric symbols — the GPT-2-family pre-split
    * shape (contractions and unicode classes dropped so the SAME
    * pattern is leftmost-longest-identical under Java regex and
    * DuckDB's RE2; the classes are disjoint, so alternation order
    * cannot diverge either). Counting these approximates subword token
    * budgets far better than whitespace words: "don't stop, it's
    * 2024!" is 4 whitespace tokens but 10 pieces.
    */
  // the trailing class spells out Java \s explicitly so the SAME string
  // is leftmost-longest-identical under Java regex and DuckDB RE2 (RE2's
  // \s excludes \x0B — measured, r16): [ \t\n\x0b\f\r]
  private[graft] val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]"

  /** Per-source BPE-piece budget next to the whitespace-token budget:
    * piece counts, davg, and FERTILITY (pieces per whitespace token —
    * the standard tokenizer-cost metric; rising fertility marks
    * sources that will eat disproportionate sequence length). One
    * stateless scan + one per-source aggregate, exact-integer sums
    * with the decimal-division determinism rule.
    */
  val q71 = GraftQuery(
    "q71_bpe_tokens",
    (s, d) => {
      val perDoc = Tables.documents(s, d).select(
        col("source"),
        size(toks).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .cast("long").as("n_pieces"))
      perDoc
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_pieces")).as("sum_pieces"),
          davg(col("n_pieces")).as("avg_pieces"),
          (sum(col("n_pieces").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double") / sum(col("n_ws"))).as("fertility"),
        )
        .orderBy("source")
    },
    Some("""SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(n_pieces) AS BIGINT) AS sum_pieces,
      CAST(SUM(CAST(n_pieces AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_pieces,
      CAST(SUM(CAST(n_pieces AS DECIMAL(18,4))) AS DOUBLE) / SUM(n_ws) AS fertility
      FROM (SELECT source,
              len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '')) AS n_ws,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]')) AS n_pieces
            FROM documents) t
      GROUP BY source ORDER BY source"""),
  )

  /** Linear quality-classifier weights — the fasttext-style model-based
    * document filter (q31 reports corpus-level signal aggregates; this
    * scores and GATES each doc). The model enters the plan as literals
    * (the bloom/IVF model-fit discipline: fitting is a declared
    * driver-side step, inference is distributed); here the weights are a
    * fixed hand-fit stand-in with the real model's shape — a dot product
    * over engineered ratio features plus a length feature.
    */
  private val QcW =
    Map("stop" -> 2.0, "len" -> 0.8, "punct" -> -3.0, "digit" -> -2.0, "upper" -> -1.5)
  private val QcThreshold = 0.15
  private val QcLenCap = 256L

  /** Per-doc quality classification: exact integer counts → one guarded
    * double division per ratio → a fixed-order weighted sum. Every op is
    * correctly-rounded IEEE (+,-,×,÷ only, no transcendentals) in the
    * SAME order as the oracle SQL, so scores sit under the HARD hash
    * gate. Stateless scan, zero shuffle before the caller's use — at
    * 100 TB this is the map-side gate fused into the corpus read.
    */
  private[operators] def qualityClassify(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val counted = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      length(col("text")).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_toks"),
      hits(toks, enWords).cast("long").as("n_stop"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long").as("n_punct"),
      (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).cast("long").as("n_digit"),
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Z]", ""))).cast("long").as("n_upper"))
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0d)).otherwise(num.cast("double") / den.cast("double"))
    val scored = counted.select(
      col("doc_id"), col("source"),
      (lit(QcW("stop")) * ratio(col("n_stop"), col("n_toks"))
        + lit(QcW("len")) * (least(col("n_toks"), lit(QcLenCap)).cast("double") / lit(QcLenCap.toDouble))
        + lit(QcW("punct")) * ratio(col("n_punct"), col("n_chars"))
        + lit(QcW("digit")) * ratio(col("n_digit"), col("n_chars"))
        + lit(QcW("upper")) * ratio(col("n_upper"), col("n_chars"))).as("score"))
    scored.select(
      col("doc_id"), col("source"), col("score"),
      (col("score") >= lit(QcThreshold)).cast("long").as("keep"))
  }

  /** The ONE SQL rendering of the q72 scoring law (CTEs `counted`,
    * `scored(doc_id, source, score)`) — shared by the q72 oracle and
    * any composition ranking on quality (q104's canonical selection),
    * so the score law cannot fork between the standalone gate and its
    * compositions (the q93 discipline).
    */
  private[operators] val qualityCtes: String =
    s"""counted AS (
        SELECT doc_id, source,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x <> '')) AS BIGINT) AS n_toks,
          CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS BIGINT) AS n_stop,
          CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
          CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
          CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper
        FROM documents),
      scored AS (
        SELECT doc_id, source,
          ${QcW("stop")} * (CASE WHEN n_toks = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / CAST(n_toks AS DOUBLE) END)
          + ${QcW("len")} * (CAST(least(n_toks, $QcLenCap) AS DOUBLE) / ${QcLenCap.toDouble})
          + ${QcW("punct")} * (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END)
          + ${QcW("digit")} * (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE) END)
          + ${QcW("upper")} * (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_upper AS DOUBLE) / CAST(n_chars AS DOUBLE) END)
          AS score
        FROM counted)"""

  val q72 = GraftQuery(
    "q72_quality_classifier",
    (s, d) => qualityClassify(s, d).orderBy("doc_id"),
    Some(s"""WITH $qualityCtes
      SELECT doc_id, source, score,
        CAST(CASE WHEN score >= $QcThreshold THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM scored ORDER BY doc_id"""),
    prod = Some((s, d) => qualityClassify(s, d)),
  )

  /** Document-level repetition battery — the Gopher-rule class (Rae et
    * al. 2021 §A1.1: massive-web docs are gated on duplicate-line /
    * top-n-gram / duplicated-n-gram character fractions; C4 and
    * RefinedWeb apply the same family). [[q37]] measures repetition per
    * SOURCE; a curation gate needs it per DOCUMENT: boilerplate,
    * keyword stuffing, and template spam all show up as one n-gram
    * owning an outsized share of the text.
    *
    * Two signals per doc, exact integers + one division each:
    *  - `top_bigram_frac`: tokens covered by ALL occurrences of the
    *    most frequent bigram / n_tokens (2 tokens per occurrence;
    *    overlapping occurrences each count, so the raw product is
    *    capped at 1.0 — a single-token run is full coverage);
    *  - `dup_trigram_frac`: trigram POSITIONS whose trigram occurs >= 2
    *    times / total trigram positions.
    * The `gopher_ok` flag gates at (0.12, 0.02) — this corpus's ~p90,
    * chosen so BOTH branches are exercised at the driver gate; the
    * published web-scale thresholds (0.20 for top-2-gram, 0.30-class
    * for duplicated n-gram chars) sit where real web text puts them and
    * are the operator's parameters in spirit, not magic constants.
    *
    * Scale shapes: the ORACLE plan explodes n-grams into two hash
    * aggregates keyed (doc_id, gram) — map-side combine collapses each
    * doc's grams before the exchange. The PROD plan needs NO exchange
    * at all: each doc sorts its own gram array and folds run lengths
    * with an `aggregate` higher-order function (top count = longest
    * run, duplicated positions = sum of runs >= 2), so per-doc signals
    * stay per-row — scan, project, done. ProdParitySpec pins the two
    * plans row-for-row. Measured (bench/r13.json at sf0.1, and
    * ScaleProbe25 at 1M docs): the prod form is exchange-free — ZERO
    * shuffled bytes vs the oracle plan's 1.27 GiB of (doc_id, gram)
    * aggregate traffic per 1M docs — and faster even locally (0.85 vs
    * 1.22 s) once its output order is left unsorted; at 100 TB the
    * removed corpus-sized shuffles are the entire story.
    */
  val q75 = {
    def grams(t: Column, n: Int): Column =
      transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(o => element_at(t, (i + o + 1).cast("int"))): _*))
    // longest equal-run in a SORTED array = max occurrence count
    def maxRun(sorted: Column): Column =
      aggregate(
        sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    // sum of equal-run lengths >= 2 in a SORTED array = positions whose
    // element occurs at least twice (a run hitting 2 contributes both
    // members, each further member adds itself)
    def dupPositions(sorted: Column): Column =
      aggregate(
        sorted,
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            (acc.getField("dup") + when(run === 2L, 2L).when(run > 2L, 1L).otherwise(0L))
              .as("dup"))
        },
        acc => acc.getField("dup"))
    // ordered=false is the prod form: the per-doc signal table needs no
    // global order, and dropping the oracle-comparability sort removes
    // the prod plan's LAST exchange (ScaleProbe25: what remains is then
    // zero shuffled bytes vs the oracle's gram exchanges)
    def finish(df: org.apache.spark.sql.DataFrame, ordered: Boolean): org.apache.spark.sql.DataFrame = {
      // count*2/n_tokens over OVERLAPPING occurrences can exceed 1
      // ("a a a a": 3 occurrences of "a a" -> 6/4) — the public
      // implementations keep the raw product, but a "fraction covered"
      // that reads above 1 is uninterpretable, so it caps at 1.0 (a
      // single-token run IS full coverage); the gate threshold sits far
      // below the cap either way
      val out = df.select(
        col("doc_id"), col("n_tokens"), col("top_bigram_n"), col("dup_trigram_n"),
        least(col("top_bigram_n") * 2 / col("n_tokens"), lit(1.0)).as("top_bigram_frac"),
        (col("dup_trigram_n") / (col("n_tokens") - 2)).as("dup_trigram_frac"),
        (least(col("top_bigram_n") * 2 / col("n_tokens"), lit(1.0)) <= 0.12 &&
          col("dup_trigram_n") / (col("n_tokens") - 2) <= 0.02).as("gopher_ok"),
      )
      if (ordered) out.orderBy("doc_id") else out
    }
    GraftQuery(
      "q75_gopher_repetition",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), toks.as("t"))
          .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
          .filter(col("n_tokens") >= 3)
        val top = base
          .select(col("doc_id"), col("n_tokens"), explode(grams(col("t"), 2)).as("bg"))
          .groupBy("doc_id", "n_tokens", "bg").agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "n_tokens").agg(max("c").as("top_bigram_n"))
        val dup = base
          .select(col("doc_id"), explode(grams(col("t"), 3)).as("tg"))
          .groupBy("doc_id", "tg").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_trigram_n"))
        finish(top.join(dup, Seq("doc_id")), ordered = true)
      },
      Some("""WITH toks AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), x -> x <> '') AS t
          FROM documents),
        base AS (
          SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens FROM toks
          WHERE len(t) >= 3),
        bg AS (
          SELECT doc_id, n_tokens,
                 unnest(list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2])) AS bg
          FROM base),
        bgc AS (SELECT doc_id, n_tokens, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, n_tokens, bg),
        top AS (SELECT doc_id, n_tokens, MAX(c) AS top_bigram_n FROM bgc GROUP BY doc_id, n_tokens),
        tg AS (
          SELECT doc_id,
                 unnest(list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS tg
          FROM base),
        tgc AS (SELECT doc_id, tg, COUNT(*) AS c FROM tg GROUP BY doc_id, tg),
        dup AS (SELECT doc_id, CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_trigram_n
                FROM tgc GROUP BY doc_id)
        SELECT top.doc_id, n_tokens, top_bigram_n, dup_trigram_n,
               LEAST(top_bigram_n * 2 / n_tokens, 1.0) AS top_bigram_frac,
               dup_trigram_n / (n_tokens - 2) AS dup_trigram_frac,
               (LEAST(top_bigram_n * 2 / n_tokens, 1.0) <= 0.12 AND
                dup_trigram_n / (n_tokens - 2) <= 0.02) AS gopher_ok
        FROM top JOIN dup ON top.doc_id = dup.doc_id
        ORDER BY top.doc_id"""),
      prod = Some((s, d) =>
        finish(
          Tables.documents(s, d)
            .select(col("doc_id"), toks.as("t"))
            .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n_tokens"))
            .filter(col("n_tokens") >= 3)
            .select(
              col("doc_id"), col("n_tokens"),
              maxRun(array_sort(grams(col("t"), 2))).as("top_bigram_n"),
              dupPositions(array_sort(grams(col("t"), 3))).as("dup_trigram_n")),
          ordered = false)),
    )
  }

  // ------------------------------------------------ q92 PII redaction

  /** Email shape: local part @ dotted domain + ≥2-letter TLD. No
    * lookahead/backrefs — leftmost-greedy-identical under Java regex
    * AND DuckDB RE2 (the q71 portability discipline). */
  private[graft] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad behind ASCII word boundaries ("v1.2.3" has three
    * groups and never matches; a port number has no dots). */
  private[graft] val Ipv4Pat = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Long digit runs (≥ 9) — the SSN/phone/account-number class. Short
    * runs (years, ports, prices) survive. */
  private[graft] val DigitRunPat = "[0-9]{9,}"

  /** PII REDACTION WITH REMOVAL (r18) — the corpus-repair scrub between
    * quality gates and packing (C4 and RefinedWeb both scrub before
    * training; q89 removes duplicated LINES, this removes sensitive
    * SPANS): emails, IPv4 addresses, and ≥9-digit runs are replaced by
    * typed sentinels, emitting cleaned text plus per-class counts.
    *
    * The law is STAGED so each count is exactly what its replace
    * redacted (an IP inside an email can never double-count):
    * t1 = replace(text, email→&lt;EMAIL&gt;), t2 = replace(t1,
    * ip→&lt;IP&gt;), clean = replace(t2, digits→&lt;NUM&gt;);
    * n_emails counts on text, n_ips on t1, n_digit_runs on t2. One
    * stateless map over the corpus — ZERO exchanges (the q78 class),
    * so it rides the scan partitioning at any corpus size.
    */
  private[graft] def piiRedact(docs: DataFrame): DataFrame = {
    val t1 = regexp_replace(col("text"), EmailPat, "<EMAIL>")
    val t2 = regexp_replace(col("t1"), Ipv4Pat, "<IP>")
    docs
      .select(col("doc_id"), col("text"), t1.as("t1"))
      .select(col("doc_id"), col("text"), col("t1"), t2.as("t2"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("t1"), lit(Ipv4Pat), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(col("t2"), lit(DigitRunPat), lit(0))).cast("long").as("n_digit_runs"),
        regexp_replace(col("t2"), DigitRunPat, "<NUM>").as("clean_text"))
  }

  /** The synthesized-PII corpus (the q76 / q89 synthesize-then-operate
    * discipline — the test corpus carries no real PII, so BOTH engines
    * plant identical spans from the doc_id law and the gate grades
    * synthesize AND redact): every doc gains one planted span by
    * doc_id mod 3 — an email beside a spelled-out lookalike that must
    * survive, an IP beside a three-group version string and a port
    * that must survive, or a 10-digit run beside an 8-digit code that
    * must survive.
    */
  private[graft] def piiDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or ops at corp dot net")))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(lit(" server 10."), pmod(col("doc_id"), lit(256)).cast("string"),
              lit(".0.1 port 8080 up v1.2.3")))
          .otherwise(
            concat(lit(" ref "), lpad(col("doc_id").cast("string"), 10, "0"),
              lit(" code 12345678")))).as("text"))

  /** [[piiDocs]]'s planted-span SQL expression over (doc_id, text) —
    * ONE rendering shared by the q92 gate and compositions (q93). */
  private[graft] def piiSynthExpr: String =
    s"""text || CASE CAST(doc_id % 3 AS INTEGER)
          WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or ops at corp dot net'
          WHEN 1 THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 port 8080 up v1.2.3'
          ELSE ' ref ' || lpad(CAST(doc_id AS VARCHAR), 10, '0') || ' code 12345678' END"""

  /** [[piiRedact]]'s staged SQL rendering over a CTE
    * `src(doc_id, text, ...)` — the s1/s2 stages plus a final
    * projection; `passCols` carry extra src columns through to the
    * output (q93 threads the line-dedup counts). ONE rendering shared
    * by the q92 gate and compositions.
    */
  private[graft] def piiRedactSql(src: String, passCols: Seq[String] = Nil): String = {
    val pass = passCols.map(c => s"$c, ").mkString
    s"""s1 AS (SELECT doc_id, ${pass}text, regexp_replace(text, '$EmailPat', '<EMAIL>', 'g') AS t1 FROM $src),
      s2 AS (SELECT doc_id, ${pass}text, t1, regexp_replace(t1, '$Ipv4Pat', '<IP>', 'g') AS t2 FROM s1)
      SELECT doc_id, $pass
        CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t1, '$Ipv4Pat')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(t2, '$DigitRunPat')) AS BIGINT) AS n_digit_runs,
        regexp_replace(t2, '$DigitRunPat', '<NUM>', 'g') AS clean_text
      FROM s2 ORDER BY doc_id"""
  }

  val q92 = GraftQuery(
    "q92_pii_redact",
    (s, d) => piiRedact(piiDocs(Tables.documents(s, d))).orderBy("doc_id"),
    Some(s"""WITH pii AS (
        SELECT doc_id, $piiSynthExpr AS text
        FROM documents),
      ${piiRedactSql("pii")}"""),
    prod = Some((s, d) => piiRedact(piiDocs(Tables.documents(s, d)))),
  )

  // ----------------------------------------- q93 corpus repair (composed)

  /** The redaction tail over a line-cleaned frame
    * `(doc_id, n_lines, n_removed, clean_text)` — ONE rendering shared
    * by [[repairFrom]] (q93) and the streaming repair lane
    * ([[graft.streaming.Streams.repairBatch]]). The input is read by
    * BOTH the redaction branch and the counts branch, so it pins
    * once — without it the whole upstream line-removal DAG would
    * evaluate twice per call (once per streaming micro-batch in
    * repairBatch).
    */
  private[graft] def redactCleaned(cleanedIn: DataFrame): DataFrame = {
    val cleaned = cleanedIn.localCheckpoint()
    piiRedact(cleaned.select(col("doc_id"), col("clean_text").as("text")))
      .join(cleaned.select("doc_id", "n_lines", "n_removed"), Seq("doc_id"))
      .select("doc_id", "n_lines", "n_removed",
        "n_emails", "n_ips", "n_digit_runs", "clean_text")
  }

  /** The REPAIR composition over an already multi-line corpus: line
    * dedup REMOVES boilerplate lines, then PII redaction scrubs the
    * surviving text — C4/RefinedWeb's repair order (a boilerplate line
    * containing PII is simply GONE, so its spans never count). Exposed
    * for the spec; the registry entry feeds it the synthesized
    * lined+PII corpus so the whole chain sits under the HARD gate.
    */
  private[graft] def repairFrom(docs: DataFrame): DataFrame =
    redactCleaned(Dedup.lineDedup(docs))

  /** CORPUS REPAIR (r18) — q89 ∘ q92 as ONE gated entry: the
    * synthesize laws compose too (multi-line text from the token law,
    * then the planted-span law appends to each doc's LAST line), so
    * the oracle grades synthesize → line-dedup → redact end to end
    * through the SAME shared CTE renderings the standalone gates use —
    * none of the three laws can fork from its own gate. The interplay
    * is real and deterministic: an appended span makes a formerly
    * shared last line unique (it survives dedup, then redacts), while
    * a span variant shared by > maxDocs docs is REMOVED as boilerplate
    * before redaction ever sees it.
    */
  val q93 = GraftQuery(
    "q93_corpus_repair",
    (s, d) => repairFrom(piiDocs(Dedup.linedDocs(Tables.documents(s, d)))).orderBy("doc_id"),
    Some(s"""WITH ${Dedup.linedDocsCtes},
      pii AS (SELECT doc_id, $piiSynthExpr AS text FROM ld),
      ${Dedup.lineDedupCtes("pii")},
      rsrc AS (SELECT doc_id, n_lines, n_removed, clean_text AS text FROM lclean),
      ${piiRedactSql("rsrc", Seq("n_lines", "n_removed"))}"""),
    prod = Some((s, d) => repairFrom(piiDocs(Dedup.linedDocs(Tables.documents(s, d))))),
  )

  def all: Seq[GraftQuery] =
    Seq(q30, q31, q32, q32v2, q33, q33md5, q34, q35, q35exact, q36, q37, q42, q46, q48, q49,
      q51, q54, q71, q72, q75, q92, q93)
}
