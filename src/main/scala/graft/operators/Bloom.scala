package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom-filter semi-join reduction — the explicit, deterministic form of
  * the runtime filter Spark's own `runtime.bloomFilter` optimization
  * injects: build a bit set from the build side's join keys, ship it to
  * the probe side, and drop probe rows that cannot match BEFORE they
  * reach the join's exchange.
  *
  * When it pays: the build side is too large (or too late-derived) to
  * broadcast-join outright but still far smaller than the probe side,
  * and the join is selective — at 100 TB the filter turns a
  * full-fact-table shuffle into a shuffle of only plausibly-matching
  * rows. The filter itself is tiny (bitsPerKey=12 → ~1.5 KB per 1k
  * build keys) and the probe-side test is pure codegen'd bit math.
  *
  * Shipping: up to [[Bloom.LiteralMaxWords]] 64-bit words (512 KiB) the
  * word array rides the plan as a `typedLit`; above that it ships as a
  * Spark broadcast variable probed by a codegen'd expression
  * ([[graft.expressions.BroadcastWordAt]]) — a 100M-key build would
  * otherwise bake ~150 MB of literal into the expression tree
  * (analyzer/codegen blowup), where a broadcast serializes as a handle.
  *
  * Determinism: double hashing over murmur3 (`hash`) and `xxhash64`,
  * positions masked into a power-of-two bit space — no randomness, so
  * the same build side always yields the same filter and the pruned
  * join is value-identical to the plain join (false positives are
  * removed by the join itself; the bit test has no false negatives).
  * `hash`/`xxhash64` are TYPE-sensitive (int 7 and bigint 7 hash
  * differently), so both sides are cast to one agreed key type before
  * hashing — [[Bloom.prunedJoin]] derives it from the two sides the way
  * the join's own coercion would.
  */
object Bloom {

  /** Bit positions per key; 12 bits/key at 5 hashes ≈ 0.3% fpp. */
  val HashCount = 5
  val BitsPerKey = 12

  /** Above this many 64-bit words (512 KiB) the filter ships as a
    * broadcast variable instead of a plan literal.
    */
  val LiteralMaxWords: Int = 1 << 16

  /** Bit-space cap: 2^33 bits = 1 GiB of words ≈ 700M build keys at
    * 12 bits/key. Beyond that fpp degrades gracefully instead of the
    * sizing arithmetic overflowing Int (the old `.toInt` truncation
    * crashed with NegativeArraySizeException past ~89M keys).
    */
  val MaxBits: Long = 1L << 33

  final case class Filter(bits: Array[Long], numBits: Long, keyType: DataType,
                          wordFn: Option[String]) {
    /** Probe-side test, pure column arithmetic (no UDF): for each of the
      * HashCount derived positions, index the word array — plan literal
      * or broadcast, per the build-time size decision — and test the bit.
      * The key is cast to the filter's agreed key type first so probe
      * hashing matches build hashing exactly.
      */
    def mightContain(key: Column): Column = {
      val k = key.cast(keyType)
      val wordAt: Column => Column = wordFn match {
        case Some(fn) => idx => call_function(fn, idx)
        case None =>
          val lits = typedLit(bits.toSeq)
          idx => element_at(lits, idx.cast("int") + 1)
      }
      (0 until HashCount).map { i =>
        val pos = Bloom.pos(k, i, numBits)
        val word = wordAt(shiftright(pos, 6))
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
  private def pos(key: Column, i: Int, numBits: Long): Column = {
    val step = xxhash64(key).bitwiseAND(numBits - 1L).bitwiseOR(1L)
    (hash(key).cast("long") + lit(i.toLong) * step).bitwiseAND(numBits - 1L)
  }

  /** Build from the build side's distinct keys, hashing the column's own
    * type. Use the 3-arg overload when the probe side's key type differs.
    */
  def build(dim: DataFrame, keyCol: String): Filter =
    build(dim, keyCol, dim.schema(keyCol).dataType)

  /** Build the filter from the build side's distinct keys, cast to
    * `keyType` before hashing. One partial-aggregated shuffle of
    * (word index → OR of bits) — numBits/64 rows — then a driver collect
    * of the word array (same footprint as a broadcast of the filter).
    * Above `literalMaxWords` the array is registered as a broadcast
    * and a session temp function so `mightContain` probes the broadcast.
    */
  def build(dim: DataFrame, keyCol: String, keyType: DataType,
            literalMaxWords: Int = LiteralMaxWords): Filter = {
    val keys = dim.select(col(keyCol).cast(keyType).as(keyCol)).distinct()
    val n = math.max(keys.count(), 1L)
    val numBits =
      math.min(java.lang.Long.highestOneBit(math.max(n * BitsPerKey, 64L) * 2 - 1), MaxBits)
    val words = keys
      .select(explode(array((0 until HashCount).map(i => pos(col(keyCol), i, numBits)): _*)).as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), col("p").bitwiseAND(63L).cast("int")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long]((numBits / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    if (arr.length > literalMaxWords) {
      val spark = dim.sparkSession
      val bc = spark.sparkContext.broadcast(arr)
      val fn = s"graft_bloom_words_${bc.id}"
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(fn,
        exprs => graft.expressions.BroadcastWordAt(bc, exprs.head), "built-in")
      Filter(arr, numBits, keyType, Some(fn))
    } else Filter(arr, numBits, keyType, None)
  }

  /** The pruned equi-join: probe rows failing the filter never reach the
    * exchange; the join then removes the filter's false positives, so
    * the result is value-identical to `probe.join(dim, key)`. Both
    * sides hash the join's coerced key type (int probe × bigint dim
    * would otherwise false-negative silently).
    */
  def prunedJoin(probe: DataFrame, dim: DataFrame, keyCol: String): DataFrame = {
    val t = commonKeyType(probe.schema(keyCol).dataType, dim.schema(keyCol).dataType, keyCol)
    val f = build(dim, keyCol, t)
    probe.where(f.mightContain(col(keyCol))).join(dim, keyCol)
  }

  /** The type the equi-join would coerce both keys to — the type both
    * sides must hash. Mirrors Catalyst's widening for the types that can
    * meaningfully meet in an equi-join here.
    */
  private[graft] def commonKeyType(p: DataType, d: DataType, keyCol: String): DataType = {
    val numericOrder: Seq[DataType] =
      Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    (p, d) match {
      case (a, b) if a == b => a
      case (a, b) if numericOrder.contains(a) && numericOrder.contains(b) =>
        numericOrder(math.max(numericOrder.indexOf(a), numericOrder.indexOf(b)))
      case (a: DecimalType, b: DecimalType) =>
        val scale = math.max(a.scale, b.scale)
        val range = math.max(a.precision - a.scale, b.precision - b.scale)
        DecimalType(math.min(range + scale, DecimalType.MAX_PRECISION), scale)
      case (a, b) =>
        throw new IllegalArgumentException(
          s"Bloom.prunedJoin: probe/dim key '$keyCol' types $a / $b have no common hash type; " +
            "cast the sides explicitly before the pruned join")
    }
  }
}
