package graft.functions

import graft.SparkTestBase
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Value-equality evidence for the r15 codegen'd hash kernels: the
  * [[graft.ops.Dedup]] helpers must produce EXACTLY the rows their
  * pre-r15 higher-order-function spellings produced (the dedup tiers'
  * bucket membership, signatures and shingle sets all hang off these
  * values — a single differing bit silently changes candidate sets).
  * The HOF references below are the pre-r15 bodies, verbatim —
  * including their null-text semantics (null token array → one
  * all-zero-window sentinel shingle; minhash of null → 48 nulls). */
class HashOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val texts: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one", "", "  padded   whitespace\ttabs  ",
    "repeat repeat repeat repeat",
    "a b", "a b c", "Mixed CASE Tokens mixed case tokens",
    null,
    (1 to 200).map(i => s"tok$i").mkString(" "),
    (1 to 50).map(i => s"dup${i % 7}").mkString(" "))

  private def df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  private def rows(d: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Any])] =
    d.collect().toSeq.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getSeq[Any](1)))

  test("tokenHashes == transform(split, xxhash64)") {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val got = df.select(col("id"), Dedup.tokenHashes(col("text")).as("h"))
    val want = df.select(col("id"), transform(toks, t => xxhash64(t)).as("h"))
    assert(rows(got) === rows(want))
  }

  test("minhashSignature == array(array_min(transform(h*a+b)) per family), incl. null text") {
    val base = df.select(col("id"), Dedup.tokenHashes(col("text")).as("th"))
    val hofSig = array(HashOpsUtil.affine.map { case (a, b) =>
      array_min(transform(col("th"), h => h * lit(a) + lit(b)))
    }.toIndexedSeq: _*)
    val got = base.select(col("id"), Dedup.minhashSignature(col("th")).as("x"))
    val want = base.select(col("id"), hofSig.as("x"))
    assert(rows(got) === rows(want))
  }

  test("gramHashes == positional transform/xxhash64 windows (n = 3 and 8); " +
       "empty below n; null array -> null (ADVICE r15)") {
    val base = df.select(col("id"), Dedup.tokenHashes(col("text")).as("th"))
    for (n <- Seq(3, 8)) {
      // the kernel's contract holds on len >= n arrays with non-null
      // elements — exactly what q82's size gate feeds it (tokenHashes
      // output elements are never null)
      val atLeastN = base.filter(size(col("th")) >= n)
      val hof = transform(sequence(lit(1), size(col("th")) - (n - 1)),
        i => xxhash64((0 until n).map(o => element_at(col("th"), i + o)): _*))
      val got = rows(atLeastN.select(col("id"),
        graft.functions.HashOps.gram_hashes(col("th"), n).as("x")))
      val want = rows(atLeastN.select(col("id"), hof.as("x")))
      assert(got === want, s"n=$n")
      // below the gate: documented empty-array contract
      rows(base.filter(col("th").isNotNull && size(col("th")) < n).select(col("id"),
        graft.functions.HashOps.gram_hashes(col("th"), n).as("x")))
        .foreach { case (id, v) => assert(v == Seq.empty, s"id=$id n=$n") }
    }
    // null token array (null text) -> null, like every UnaryExpression
    rows(base.filter(col("th").isNull).select(col("id"),
      graft.functions.HashOps.gram_hashes(col("th"), 3).as("x")))
      .foreach { case (id, v) => assert(v == null, s"id=$id") }
  }

  test("shinglesFromTokenHashes == sorted-distinct HOF shingles (n = 3 and 5), incl. null text") {
    val base = df.select(col("id"), Dedup.tokenHashes(col("text")).as("th"))
    for (n <- Seq(3, 5)) {
      val idx = sequence(lit(1), greatest(size(col("th")) - (n - 1), lit(1)))
      val hof = array_sort(array_distinct(transform(idx, i =>
        xxhash64((0 until n).map(o =>
          coalesce(element_at(col("th"), i + o), lit(0L))): _*))))
      val got = base.select(col("id"),
        Dedup.shinglesFromTokenHashes(col("th"), n).as("x"))
      val want = base.select(col("id"), hof.as("x"))
      assert(rows(got) === rows(want), s"n=$n")
    }
  }
}
