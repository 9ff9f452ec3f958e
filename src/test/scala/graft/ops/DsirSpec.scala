package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q90 importance weighting: the oracle proves cross-engine
  * exactness; this spec proves the score MEANS something — documents
  * built from the target domain's vocabulary outrank off-domain ones,
  * under both the shipped integer-ratio form and the paper's
  * log-ratio form (which cannot sit under a hash oracle — libm ulps).
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // tiny corpus with a clearly-separated target vocabulary:
  // target (src0) speaks {alpha..delta}; off-domain raw docs speak
  // {zeta..iota}; one raw doc borrows the target vocabulary wholesale
  private def corpus() = Seq(
    (0L, "alpha beta gamma delta alpha beta", "en", "src0"),
    (20L, "alpha gamma alpha delta beta gamma", "en", "src0"),
    (1L, "alpha beta gamma delta", "en", "src1"), // on-domain raw doc
    (2L, "zeta eta theta iota zeta", "en", "src2"), // off-domain
    (3L, "zeta iota eta theta theta", "en", "src3"), // off-domain
    (4L, null.asInstanceOf[String], "en", "src4") // null text: no score row
  ).toDF("doc_id", "text", "lang", "source")

  test("planted target-vocabulary doc outranks off-domain docs (integer form)") {
    val w = Curation.importanceWeightsOf(corpus()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("mean_importance_micro"))
      .toMap
    assert(!w.contains(4L), "null-text docs must not be scored")
    assert(!w.contains(0L) && !w.contains(20L), "target docs are not scored")
    assert(w(1L) > w(2L) && w(1L) > w(3L),
      s"on-domain doc must outrank off-domain: $w")
  }

  test("log-ratio (paper) form agrees on the ranking") {
    // per-token smoothed counts from the corpus above, computed
    // straight off the frames so the spec tracks tokenization
    val toks = corpus().filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
    val counts: Map[String, (Long, Long)] = toks.groupBy("token")
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("t"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("r"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val llr = toks.filter(col("source") =!= "src0")
      .select("doc_id", "token").collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map { r =>
          val (t, q) = counts(r.getString(1))
          math.log((t + 1.0) / (q + 1.0))
        }.sum / rows.length
      }
    assert(llr(1L) > llr(2L) && llr(1L) > llr(3L),
      s"log form must preserve the planted ranking: $llr")
  }

  test("ratio micro-units are the exact integer arithmetic, not a float round") {
    // 'alpha' occurs 4x in target (2 in doc 0, 2 in doc 20), 1x raw
    // (doc 1): ratio_micro = (4+1)*1e6 div (1+1) = 2500000
    val toks = corpus().filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
    val alpha = toks.groupBy("token")
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("cnt_t"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("cnt_r"))
      .filter(col("token") === "alpha")
      .select(expr(s"((cnt_t + 1L) * ${Curation.dsirScale}) div (cnt_r + 1L)"))
      .head().getLong(0)
    assert(alpha == 2500000L, s"alpha ratio_micro: $alpha")
  }

  test("sf0.001 corpus: every raw doc scored once, target source absent") {
    val out = Curation.dsirImportance(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("source") != Curation.dsirTargetSource))
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "one row per raw doc")
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      assert(r.getAs[Long]("importance_micro") > 0)
      assert(r.getAs[Long]("mean_importance_micro") ==
        r.getAs[Long]("importance_micro") / r.getAs[Long]("n_tokens"))
    }
  }
}
