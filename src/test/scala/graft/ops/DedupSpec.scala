package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH surfaces the planted near-duplicates") {
    val pairs = Dedup.minhashLsh(spark, sf).collect()
    assert(pairs.nonEmpty, "corpus plants ' dup'-suffixed near-copies; LSH must find some")
    // verified pairs really are near-duplicates
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
    // and they should essentially all involve a planted ' dup' document
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").endsWith(" dup")).select("doc_id").as[Long].collect().toSet
    val hits = pairs.count(r => docs.contains(r.getAs[Long]("doc_a")) ||
      docs.contains(r.getAs[Long]("doc_b")))
    assert(hits >= pairs.length / 2)
  }

  test("minhash candidates do not explode (bucket-bounded pair count)") {
    val n = Dedup.minhashCandidates(graft.Tables.documents(spark, sf)).count()
    // 500 docs -> full cross join would be ~125k pairs; LSH must stay tiny
    assert(n < 2000, s"candidate pairs $n — LSH banding is not pruning")
  }

  test("simhash near-dups are hamming-bounded and overlap minhash findings") {
    val sim = Dedup.simhashDups(spark, sf).collect()
    sim.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
    val simPairs = sim.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val mhPairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert((simPairs intersect mhPairs).nonEmpty)
  }

  test("embedding near-dup report ranks closest pairs, flags at threshold") {
    val pairs = Dedup.embeddingDups(spark, sf).collect()
    assert(pairs.nonEmpty && pairs.length <= 100)
    val cosines = pairs.map(_.getAs[Double]("cosine"))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    pairs.foreach(r =>
      assert(r.getAs[Boolean]("is_dup") == (r.getAs[Double]("cosine") >= 0.9)))
  }

  test("shingles: distinct 3-gram windows, short docs degrade gracefully") {
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
    assert(got(2) == Seq("x"))
  }
}
