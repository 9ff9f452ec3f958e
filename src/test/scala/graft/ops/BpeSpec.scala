package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def encodeOne(word: String): String =
    Seq(word).toDF("text").select(Bpe.encode(col("text")).as("e"))
      .as[String].head()

  test("merge chain reproduces classic BPE on known words") {
    // "vector": (o,r) -> (c,t) -> (ct,or) -> (e,ctor) -> (v,ector)
    assert(encodeOne("vector") == "⟨vector⟩")
    // "slow": (o,w) -> (l,ow) -> (s,low)
    assert(encodeOne("slow") == "⟨slow⟩")
    // a word no merge touches stays fully character-split
    assert(encodeOne("zq") == "⟨z⟩⟨q⟩")
    // merges never cross word boundaries
    assert(encodeOne("s low") == "⟨s⟩ ⟨low⟩")
    // the bracket codepoints are reserved delimiters: stripped from
    // input (identically in the DuckDB twin), never unit content
    assert(encodeOne("a⟨b⟩c") == "⟨a⟩⟨b⟩⟨c⟩")
  }

  test("encoding is lossless: stripping brackets recovers the normalized text") {
    val bad = graft.Tables.documents(spark, sf)
      .select(Bpe.encode(col("text")).as("enc"), lower(trim(col("text"))).as("norm"))
      .filter(replace(replace(col("enc"), lit("⟨"), lit("")),
        lit("⟩"), lit("")) =!= col("norm"))
      .count()
    assert(bad == 0, s"$bad documents mutated by the merge chain")
  }

  test("subword counts sit between word count and character count") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), Bpe.encode(col("text")).as("enc"),
        size(TextAnalysis.tokens(col("text"))).as("n_words"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", "")).as("n_chars"))
      .select(col("doc_id"), Bpe.tokenCountOf(col("enc")).as("n_bpe"),
        col("n_words"), col("n_chars"))
    assert(docs.filter(col("n_bpe") > col("n_chars") ||
      col("n_bpe") < col("n_words")).count() == 0)
    // and the merges actually compress (strictly fewer units than chars)
    val agg = docs.agg(sum("n_bpe").as("u"), sum("n_chars").as("c")).head()
    assert(agg.getLong(0) < agg.getLong(1))
  }

  test("vocab top-k surfaces merged multi-character units") {
    val units = Bpe.vocabTopK(spark, sf).select("unit").as[String].collect()
    assert(units.length == 40)
    assert(units.exists(_.length > 1), "no merged unit reached the top-k — merges dead?")
  }

  test("vocab top-k plans as TakeOrderedAndProject, not a global sort") {
    val df = Bpe.vocabTopK(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected orderBy+limit to plan as top-k, got:\n$plan")
  }

  test("fertility is bounded by subword-count invariants and groups cover the corpus") {
    val rows = Bpe.tokenizerFertility(spark, sf).collect()
    assert(rows.nonEmpty)
    // every word is at least one subword unit and at most its characters,
    // so group fertility lives in [1, mean word length]
    rows.foreach { r =>
      val f = r.getAs[Double]("fertility")
      assert(f >= 1.0, s"fertility $f < 1 for ${r.getAs[String]("source")}/${r.getAs[String]("lang")}")
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
    // groups partition the corpus: doc counts add back up
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.Tables.documents(spark, sf).count())
  }

  test("packing starts each (lang, source) stream at tokens_before 0") {
    val firsts = Bpe.bpePacking(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "source").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("tokens_before") =!= 0L).count() == 0)
    assert(firsts.filter(col("pack_id") =!= 0L).count() == 0)
  }
}
