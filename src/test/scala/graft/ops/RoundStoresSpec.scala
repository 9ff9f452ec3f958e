package graft.ops

import java.nio.charset.StandardCharsets

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RoundStoresSpec extends SparkTestBase {
  import spark.implicits._

  private def partitions(path: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.collect {
      case s if s.isDirectory && s.getPath.getName.startsWith("ingest_round=") =>
        s.getPath.getName.stripPrefix("ingest_round=").toLong
    }.toSet
  }

  private val r0 = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
  private val r1 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta"),
    (11L, "totally different words in this one right here now")).toDF("doc_id", "text")
  private val r2 = Seq(
    (20L, "yet more fresh words that appear nowhere else at all")).toDF("doc_id", "text")

  test("boilerplate store: compaction folds old rounds, reads identical, partitions gone") {
    val path = tmpDir("compact-boiler") + "/freqs"
    val store = new BoilerplateStore(spark, path)
    store.appendRound(r0, 0L); store.appendRound(r1, 1L); store.appendRound(r2, 2L)
    def freqMap = store.freqs().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = freqMap
    store.compact(1L)
    assert(partitions(path) == Set(1L, 2L), "rounds <= 1 not folded into partition 1")
    assert(freqMap == before, "compaction changed the summed counts")
    store.compact(1L) // idempotent: nothing left to fold below 1
    assert(partitions(path) == Set(1L, 2L) && freqMap == before)
    store.compact(2L)
    assert(partitions(path) == Set(2L), "full compaction must leave one partition")
    assert(freqMap == before)
    // the cut against compacted counts equals the cut against raw ones
    val delta = Seq((30L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val cut = store.cutDelta(delta).collect()
    assert(cut.length == 1 && cut.head.getAs[Long]("n_removed") == 1L,
      "post-compaction delta cut lost the standing header block")
  }

  test("near-dup index store: compaction preserves the index content exactly") {
    val path = tmpDir("compact-ndidx") + "/index"
    val store = new NearDupIndexStore(spark, path)
    store.appendRound(r0, 0L); store.appendRound(r1, 1L); store.appendRound(r2, 2L)
    def rows = store.index.drop("ingest_round").collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val before = rows
    store.compact(1L)
    assert(partitions(path) == Set(1L, 2L))
    assert(rows == before, "compaction changed index rows")
    val pairs = store.newPairsAgainst(
      Seq((99L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text"),
      threshold = 0.3).select("new_doc", "old_doc").as[(Long, Long)].collect().toSet
    assert(pairs == Set((99L, 1L), (99L, 2L), (99L, 10L)),
      s"post-compaction delta pairing broke: $pairs")
  }

  test("train-bigram store: compaction preserves the known set") {
    val path = tmpDir("compact-bg") + "/bg"
    val store = new TrainBigramStore(spark, path)
    // ids chosen in the train split (see AssemblySpec fixture)
    store.appendRound(Seq((8L, "alpha beta gamma")).toDF("doc_id", "text"), 0L)
    store.appendRound(Seq((16L, "beta gamma delta")).toDF("doc_id", "text"), 1L)
    def known = store.knownSet().as[Long].collect().toSet
    val before = known
    assert(before.nonEmpty)
    store.compact(1L)
    assert(partitions(path) == Set(1L))
    assert(known == before, "compaction changed the bigram set")
  }

  test("crash after the marker commit: reads stay exact and a retry converges") {
    val path = tmpDir("compact-crash") + "/freqs"
    val store = new BoilerplateStore(spark, path)
    store.appendRound(r0, 0L); store.appendRound(r1, 1L); store.appendRound(r2, 2L)
    def freqMap = store.freqs().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = freqMap
    // simulate the compact(1) crash window between steps 3 and 4:
    // staged artifact + marker committed, one folded partition already
    // deleted, the merged partition not yet rewritten
    store.roundFreqs.filter(col("ingest_round") <= 1L).drop("ingest_round")
      .groupBy(col("bhash")).agg(sum(col("n_docs")).as("n_docs"))
      .withColumn("ingest_round", lit(1L))
      .write.mode("overwrite").parquet(s"$path.compact")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path.compact_marker"), true)
    out.write("1".getBytes(StandardCharsets.UTF_8)); out.close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/ingest_round=0"), true)
    // marker-aware read: rounds <= 1 come from the staged artifact,
    // the surviving raw round-1 partition is ignored (no double count)
    assert(freqMap == before, "mid-compaction read double-counted or lost rounds")
    // a retried compact converges to the clean layout
    store.compact(1L)
    assert(partitions(path) == Set(1L, 2L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.compact_marker")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path.compact")))
    assert(freqMap == before)
  }
}
