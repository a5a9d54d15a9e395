package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** End-to-end training-corpus curation: the composition a 100 TB pretraining
  * pipeline actually runs over scraped documents — length gate, language
  * gate, exact dedup, near dedup, duplicate-family canonical selection —
  * emitted as ONE decision table (doc_id, verdict, cluster_id), so the
  * corpus gets a full audit trail and survivors are a cheap filter, never
  * a chain of shrinking intermediate copies.
  *
  * Verdict precedence (first failing gate wins, mirroring how curation
  * pipelines report drop reasons): too_short, wrong_lang, exact_dup,
  * near_dup, dup_family_alternate (a non-canonical member of a transitive
  * duplicate family), kept.
  *
  * Scale shape: one scan of `documents` feeds codegen'd per-row gates; the
  * dedup evidence reuses the family's own plans (1-shuffle md5 groupBy;
  * capped-LSH minhash decisions; star-edge connected components) and joins
  * back by doc_id — no operator here introduces a new shuffle shape beyond
  * what Dedup/Cluster already proved out.
  */
object Curate {

  def curate(
      docs: DataFrame,
      lang: String = "en",
      minTokens: Int = 5): DataFrame = {
    val toks = filter(split(col("text"), "\\s+"), x => x =!= lit(""))
    // exact keeper: lowest doc_id per md5(text) group, computed over a
    // SLIM (doc_id, md5) projection so document text never rides an
    // exchange (same 16-byte-key discipline as Dedup.exact; a window
    // partitioned by md5(text) directly would shuffle the full text).
    val ids = docs.select(col("doc_id"), md5(col("text")).as("k"))
    val exactMap = ids
      .join(ids.groupBy("k").agg(min("doc_id").as("exact_keeper")), Seq("k"))
      .select(col("doc_id"), col("exact_keeper"))
    val near = Dedup.minhashDecisions(docs)
      .select(col("doc_id"), col("is_dup").as("near_dup"))
    val fam = Cluster.clusterAssignments(docs)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    docs
      .select(col("doc_id"), col("lang"), size(toks).as("n_toks"))
      .join(exactMap, Seq("doc_id"))
      .join(near, Seq("doc_id"), "left")
      .join(fam, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("n_toks") < minTokens, "too_short")
          .when(col("lang") =!= lang, "wrong_lang")
          .when(col("exact_keeper") =!= col("doc_id"), "exact_dup")
          .when(coalesce(col("near_dup"), lit(false)), "near_dup")
          .when(col("cluster_id") =!= col("doc_id") && col("cluster_size") > 1,
            "dup_family_alternate")
          .otherwise("kept").as("verdict"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }

  /** Survivors only — what downstream tokenization consumes. */
  def survivors(docs: DataFrame, lang: String = "en", minTokens: Int = 5): DataFrame =
    docs.join(
      curate(docs, lang, minTokens).filter(col("verdict") === "kept").select("doc_id"),
      Seq("doc_id"), "left_semi")

  val qCurate = GraftQuery(
    "corpus_curate",
    (s, d) => curate(Tables.documents(s, d))
      .groupBy("verdict").agg(count(lit(1)).as("n_docs"))
      .orderBy("verdict"),
    // rows-only: the near-dup gate rides the xxhash minhash pipeline
    // (not ANSI-expressible); semantics are spec-asserted on a planted
    // corpus and every component below it is individually gate-checked.
    None,
    prod = Some((s, d) => curate(Tables.documents(s, d))
      .groupBy("verdict").agg(count(lit(1)).as("n_docs"))),
  )

  def all: Seq[GraftQuery] = Seq(qCurate)
}
