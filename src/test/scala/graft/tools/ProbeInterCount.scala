package graft.tools
import org.apache.spark.sql.SparkSession
/** Prices the near-dup verification kernel: size(array_intersect) /
  * size(array_union) per candidate pair vs the sorted-merge native
  * expression + arithmetic union (run manually; not part of the
  * suite). The workload is the real q36-shaped blocked pair space
  * over sf0.1 hashed shingles. */
object ProbeInterCount {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r")
    }
    val docs = graft.Tables.documents(spark, dir)
    val idx = docs.select(col("doc_id"),
        md5(array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 4), " ")).as("fp"),
        graft.ops.Dedup.shinglesFromTokenHashes(
          graft.ops.Dedup.tokenHashes(col("text"))).as("sh"))
      .withColumn("shs", array_sort(col("sh")))
      .persist()
    println(s"[probe] docs=${idx.count()}")
    val a = idx.select(col("fp"), col("doc_id").as("da"), col("sh").as("sh_a"),
      col("shs").as("shs_a"))
    val b = idx.select(col("fp"), col("doc_id").as("db"), col("sh").as("sh_b"),
      col("shs").as("shs_b"))
    val pairs = a.join(b, Seq("fp")).filter(col("da") < col("db"))
    for (r <- 1 to 3) {
      time(s"array_intersect/array_union r$r") {
        pairs.select(
            (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b")))).as("j"))
          .agg(sum(col("j"))).collect()(0)(0)
      }
      time(s"sorted merge + arithmetic union r$r") {
        pairs.select(
            (graft.functions.SetOps.sorted_inter_count(col("shs_a"), col("shs_b"))
              .cast("double") /
              (size(col("shs_a")) + size(col("shs_b")) -
                graft.functions.SetOps.sorted_inter_count(col("shs_a"), col("shs_b"))))
              .as("j"))
          .agg(sum(col("j"))).collect()(0)(0)
      }
      time(s"sorted merge incl. per-pair sort cost r$r") {
        pairs.select(
            (graft.functions.SetOps.sorted_inter_count(
              array_sort(col("sh_a")), array_sort(col("sh_b"))).cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) -
                graft.functions.SetOps.sorted_inter_count(
                  array_sort(col("sh_a")), array_sort(col("sh_b"))))).as("j"))
          .agg(sum(col("j"))).collect()(0)(0)
      }
    }
    // pair-HEAVY variant: coarse 10-way blocking -> ~1.25M candidate
    // pairs, the adversarial-corpus shape where the verification
    // kernel dominates instead of the scan
    val ha = idx.select((col("doc_id") % 10).as("blk"), col("sh").as("sh_a"),
      col("shs").as("shs_a"), col("doc_id").as("da"))
    val hb = idx.select((col("doc_id") % 10).as("blk"), col("sh").as("sh_b"),
      col("shs").as("shs_b"), col("doc_id").as("db"))
    val heavy = ha.join(hb, Seq("blk")).filter(col("da") < col("db"))
    for (r <- 1 to 2) {
      time(s"HEAVY array_intersect/array_union r$r") {
        heavy.select(
            (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b")))).as("j"))
          .agg(sum(col("j"))).collect()(0)(0)
      }
      time(s"HEAVY sorted merge + arithmetic union r$r") {
        heavy.select(
            (graft.functions.SetOps.sorted_inter_count(col("shs_a"), col("shs_b"))
              .cast("double") /
              (size(col("shs_a")) + size(col("shs_b")) -
                graft.functions.SetOps.sorted_inter_count(col("shs_a"), col("shs_b"))))
              .as("j"))
          .agg(sum(col("j"))).collect()(0)(0)
      }
    }
    idx.unpersist()
    spark.stop()
  }
}
