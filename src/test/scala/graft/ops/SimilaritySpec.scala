package graft.ops

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k: k results per query, ranked by cosine") {
    val rows = Similarity.bruteTopK(spark, sf).collect()
    assert(rows.length == Similarity.nQueries * Similarity.k)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      val cosines = byRank.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to Similarity.k))
    }
  }

  test("LSH ANN achieves usable recall vs the exact baseline") {
    val exact = Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid"))).toSet
    val approx = Similarity.lshTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vid"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // This corpus is near-uniform (top-10 cosine <= 0.4) — the LSH
    // worst case. Theoretical recall at cos~0.3 with 8 tables x 6 bits
    // is ~0.3; chance would be k/corpus = 0.02.
    assert(recall >= 0.15, s"recall $recall too low — LSH bucketing broken")
  }

  test("LSH candidates prune the corpus (no global cross join)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val n = emb.count()
    val candidates = Similarity.candidatePairs(emb, "vec_id", "embedding").count()
    val allPairs = n * (n - 1) / 2
    assert(candidates < allPairs / 3,
      s"$candidates candidate pairs of $allPairs — LSH is not pruning")
  }
}
