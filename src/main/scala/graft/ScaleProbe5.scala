package graft
import org.apache.spark.sql.functions._

/** Manual scale probe (not part of the library API): dedup_clusters at
  * 100k docs with the two adversarial shapes the operator must survive:
  *  - a 5,000-doc identical-boilerplate MEGA-family (star edges must stay
  *    O(n), never C(n,2) ~ 12.5M);
  *  - 100 ten-doc transitive CHAINS (doc j shares its prefix with j-1 or
  *    its suffix with j+1, alternating) — the multi-hop case hash-min has
  *    to propagate through, worst diameter in the graph.
  */
object ScaleProbe5 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def block(tag: org.apache.spark.sql.Column, n: Int) =
      concat_ws(" ", transform(sequence(lit(0), lit(n - 1)),
        t => concat(tag, lit("_"), t)))

    // ids 0..4999: one identical 80-token boilerplate family
    val mega = spark.range(0, 5000).select(col("id").as("doc_id"),
      block(lit("x"), 80).as("text"))
    // ids 5000..5999: 100 chains of 10; doc j: prefix block P(c,(j+1)/2),
    // 20 unique middle tokens, suffix block S(c,j/2)
    val chain = floor(col("id") / 10).cast("long")
    val pos = col("id") % 10
    val chains = spark.range(0, 1000).select(
      (col("id") + 5000).as("doc_id"),
      concat_ws(" ",
        block(concat(lit("p"), chain, lit("_"), floor((pos + 1) / 2).cast("long")), 50),
        block(concat(lit("m"), col("id")), 20),
        block(concat(lit("s"), chain, lit("_"), floor(pos / 2).cast("long")), 50)).as("text"))
    // ids 6000..99999: unique singletons
    val singles = spark.range(0, 94000).select(
      (col("id") + 6000).as("doc_id"),
      block(concat(lit("u"), col("id")), 60).as("text"))

    val docs = mega.unionByName(chains).unionByName(singles)
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("probe").as("source"), length(col("text")).as("n_chars"))
      .localCheckpoint()

    val t0 = System.nanoTime()
    val edges = operators.Cluster.fingerprintStarEdges(docs).count()
    println(f"[probe5] star edges: $edges (mega family contributes O(n)=4999, " +
      f"never C(5000,2)=${5000L * 4999 / 2}) in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val t1 = System.nanoTime()
    val asg = operators.Cluster.clusterAssignments(docs)
      .groupBy("cluster_size").agg(count(lit(1)).as("n_docs")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(f"[probe5] clusterAssignments on 100k docs: ${(System.nanoTime() - t1) / 1e9}%.1f s")
    println(s"[probe5] size histogram: ${asg.toSeq.sortBy(_._1)}")
    assert(asg(5000L) == 5000L, "one 5000-doc mega family")
    assert(asg(10L) == 1000L, "100 chains of 10 resolved transitively")
    assert(asg(1L) == 94000L, "singletons untouched")
    println("[probe5] OK")
    spark.stop()
  }
}
