package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomKernel

/** Bloom kernel laws plus q44's contract: the bloom-prefiltered
  * decontamination must be EXACTLY the q38 decision — false positives
  * must die in the confirm join, never in the output.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  test("kernel: no false negatives, and absences are overwhelmingly definitive") {
    val bytes = new Array[Byte](1 << 14) // 2^17 bits
    val keys = (0L until 5000L).map(i => BloomKernel.mix64(i * 7919L))
    keys.foreach(k => BloomKernel.set(bytes, k, 6))
    assert(keys.forall(k => BloomKernel.contains(bytes, k, 6)), "no false negatives, ever")
    val probes = (0L until 20000L).map(i => BloomKernel.mix64(0x5eedL - i))
    val fp = probes.count(p => !keys.contains(p) && BloomKernel.contains(bytes, p, 6))
    // 5k keys in 2^17 bits ~ 0.23% theoretical FPR; allow generous slack.
    assert(fp < 200, s"false-positive rate out of family: $fp / 20000")
  }

  test("kernel: merge is byte-OR — split build equals single build") {
    val a = new Array[Byte](1 << 10)
    val b = new Array[Byte](1 << 10)
    val whole = new Array[Byte](1 << 10)
    val keys = (0L until 400L).map(BloomKernel.mix64)
    keys.take(200).foreach(k => BloomKernel.set(a, k, 5))
    keys.drop(200).foreach(k => BloomKernel.set(b, k, 5))
    keys.foreach(k => BloomKernel.set(whole, k, 5))
    val merged = a.zip(b).map { case (x, y) => (x | y).toByte }
    assert(merged.sameElements(whole), "distributed merge must equal the sequential build")
  }

  test("bloom_agg + bloom_contains round-trip through the SQL surface") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).toDF("k")
    val bloom = df.agg(gfunctions.bloom_agg(col("k"), 1L << 16, 6).as("bf"))
    val probed = (1L to 2000L).toDF("k")
      .crossJoin(broadcast(bloom))
      .filter(gfunctions.bloom_contains(col("bf"), col("k"), 6))
      .select("k")
      .collect().map(_.getLong(0)).toSet
    assert((1L to 1000L).forall(probed), "every inserted key survives the probe")
    val fps = probed.count(_ > 1000L)
    assert(fps < 30, s"probe FPR out of family: $fps / 1000")
  }

  test("q44 decision table is exactly q38's (doc_id, contaminated) columns") {
    val rows = (0L until 240L).map { i =>
      // quoting docs embed bench doc 0's first 8-gram verbatim (decontam
      // width = TrainPrep.DecontamN = 8 tokens)
      val text =
        if (i % 20 == 0) s"benchmark eval passage number $i with shared tail tokens"
        else if (i % 7 == 0) "benchmark eval passage number 0 with shared tail quoted inside corpus"
        else s"ordinary corpus document $i body text with enough tokens"
      (i, text, "en", "s", text.length.toLong)
    }
    val dir = PlantedDocs.write(spark, "/tmp/graft-test/bloom-decontam", rows)
    val viaBloom = operators.TrainPrep.q44.run(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = operators.TrainPrep.q38.run(spark, dir)
      .select("doc_id", "contaminated")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBloom == exact, "bloom prefilter must not change the exact decision")
    assert(viaBloom.values.sum > 0, "planted quoted passages must be flagged")
    assert(viaBloom.values.exists(_ == 0L), "clean docs must survive")
  }
}
