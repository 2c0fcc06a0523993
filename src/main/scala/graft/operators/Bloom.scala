package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the explicit, deterministic form of
  * the runtime filter Spark's own `runtime.bloomFilter` optimization
  * injects: build a bit set from the build side's join keys, ship it to
  * the probe side as a plan literal, and drop probe rows that cannot
  * match BEFORE they reach the join's exchange.
  *
  * When it pays: the build side is too large (or too late-derived) to
  * broadcast-join outright but still far smaller than the probe side,
  * and the join is selective — at 100 TB the filter turns a
  * full-fact-table shuffle into a shuffle of only plausibly-matching
  * rows. The filter itself is tiny (bitsPerKey=12 → ~1.5 KB per 1k
  * build keys) and the probe-side test is pure codegen'd bit math.
  *
  * Determinism: double hashing over murmur3 (`hash`) and `xxhash64`,
  * positions masked into a power-of-two bit space — no randomness, so
  * the same build side always yields the same filter and the pruned
  * join is value-identical to the plain join (false positives are
  * removed by the join itself; the bit test has no false negatives).
  */
object Bloom {

  /** Bit positions per key; 12 bits/key at 5 hashes ≈ 0.3% fpp. */
  val HashCount = 5
  val BitsPerKey = 12

  final case class Filter(bits: Array[Long], numBits: Int) {
    /** Probe-side test, pure column arithmetic (no UDF): for each of the
      * HashCount derived positions, index the literal word array and
      * test the bit.
      */
    def mightContain(key: Column): Column = {
      val lits = typedLit(bits.toSeq)
      (0 until HashCount).map { i =>
        val pos = Bloom.pos(key, i, numBits)
        val word = element_at(lits, shiftright(pos, 6).cast("int") + 1)
        call_function("shiftright", word, pos.bitwiseAND(63L).cast("int")).bitwiseAND(1L) =!= 0L
      }.reduceLeft(_ && _)
    }
  }

  /** Position of hash `i` for `key` in a `numBits`-wide (power-of-two)
    * bit space: double hashing (murmur3 + i * step) & (numBits - 1),
    * with the xxhash64-derived step masked into the bit space first
    * (ANSI mode would overflow on the raw 64-bit product) and forced
    * odd so it cycles the whole power-of-two space.
    */
  private def pos(key: Column, i: Int, numBits: Int): Column = {
    val step = xxhash64(key).bitwiseAND(numBits - 1L).bitwiseOR(1L)
    (hash(key).cast("long") + lit(i.toLong) * step).bitwiseAND(numBits - 1L)
  }

  /** Build the filter from the build side's distinct keys. One partial-
    * aggregated shuffle of (word index → OR of bits) — numBits/64 rows —
    * then a driver collect of the word array (same footprint as a
    * broadcast of the filter).
    */
  def build(dim: DataFrame, keyCol: String): Filter = {
    val keys = dim.select(col(keyCol)).distinct()
    val n = math.max(keys.count(), 1L)
    val numBits = java.lang.Long.highestOneBit(math.max(n * BitsPerKey, 64L) * 2 - 1).toInt
    val words = keys
      .select(explode(array((0 until HashCount).map(i => pos(col(keyCol), i, numBits)): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), col("p").bitwiseAND(63L).cast("int")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    Filter(arr, numBits)
  }

  /** The pruned equi-join: probe rows failing the filter never reach the
    * exchange; the join then removes the filter's false positives, so
    * the result is value-identical to `probe.join(dim, key)`.
    */
  def prunedJoin(probe: DataFrame, dim: DataFrame, keyCol: String): DataFrame = {
    val f = build(dim, keyCol)
    probe.where(f.mightContain(col(keyCol))).join(dim, keyCol)
  }
}
