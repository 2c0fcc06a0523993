package graft.operators

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom-filter sidecars for POINT-LOOKUP file skipping.
  *
  * Manifest min/max stats prune range predicates, but a
  * high-cardinality UNSORTED column (the id of a MERGE, a user_id
  * point lookup — the reference's funnel upserts key on exactly such
  * ids, funnel_live.py:155-172) has every file spanning nearly the
  * whole value range: min/max keeps everything. A per-file bloom
  * answers "might this file contain v" in O(1) probes, so a point
  * lookup on a 100 TB table opens only the files that can match —
  * the same design as the lakehouse bloom-index sidecars. A false
  * positive only KEEPS a file; pruning stays an optimization.
  *
  * Sidecar layout mirrors deletion vectors: one immutable commit dir
  * `_bloom/bl-<uuid>/` per [[Snapshot.bloomIndex]] run, one binary per
  * data file (named by the md5 of the file's table-relative path —
  * basenames repeat across partition dirs, full-path hashes cannot),
  * referenced from the manifest ([[Snapshot.BloomRef]]) and reclaimed
  * by vacuum when no retained manifest references their dir. The
  * sidecar format is `[utf magic][int ncols]([utf col][bloom frame])*`
  * with Spark's own `BloomFilter.writeTo` frames.
  *
  * Build is ONE distributed job whatever the table size: scan only
  * the indexed columns plus `_metadata.file_path`, fold per-partition
  * partial blooms, merge per file with `reduceByKey` (bloom bits OR —
  * deterministic whatever the merge order), and write each sidecar
  * from the executor that holds the merged filter, so no bloom ever
  * crosses to the driver; the driver collects only (file, ref) pairs.
  */
object SnapshotBloom {

  private val Magic = "graft-bloom-1"

  /** Indexable types: the point-lookup shapes. Everything else refuses
    * at index time (never silently writes a bloom the probe side would
    * canonicalize differently).
    */
  private[operators] def supported(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[operators] def sidecarName(relFile: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(relFile.getBytes("UTF-8")).map("%02x".format(_)).mkString + ".bloom"
  }

  /** Canonical probe: strings hash as UTF-8 strings, integrals widen
    * to long — the build side ([[build]]) puts with the same rules, so
    * a probe value of any integral width finds what an int column put.
    * An unsupported value class answers true (keep the file — sound).
    */
  private[operators] def mightContain(bf: BloomFilter, v: Any): Boolean = v match {
    case null => true
    case s: String => bf.mightContainString(s)
    case u: org.apache.spark.unsafe.types.UTF8String => bf.mightContainString(u.toString)
    case b: Byte => bf.mightContainLong(b.toLong)
    case s: Short => bf.mightContainLong(s.toLong)
    case i: Int => bf.mightContainLong(i.toLong)
    case l: Long => bf.mightContainLong(l)
    case _ => true
  }

  private def put(bf: BloomFilter, dt: DataType, v: Any): Unit = if (v != null) dt match {
    case StringType => bf.putString(v.toString)
    case ByteType => bf.putLong(v.asInstanceOf[Byte].toLong)
    case ShortType => bf.putLong(v.asInstanceOf[Short].toLong)
    case IntegerType => bf.putLong(v.asInstanceOf[Int].toLong)
    case LongType => bf.putLong(v.asInstanceOf[Long])
    case _ => ()
  }

  /** Build sidecars for `files` over `cols`; returns each file's ref.
    * Files whose scan produces no rows (schema stubs) get no sidecar
    * and no ref — a file without a bloom simply doesn't prune, the
    * same contract as missing stats.
    */
  private[operators] def build(spark: SparkSession, path: String, m: Snapshot.Manifest,
                               files: Seq[String], cols: Seq[String],
                               fpp: Double): Map[String, Snapshot.BloomRef] = {
    if (files.isEmpty) return Map.empty
    val schema = StructType.fromDDL(m.schemaDdl)
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"bloomIndex: unknown column $c"))
      require(!m.partitionCols.contains(c),
        s"bloomIndex: $c is a partition column — partition pruning already skips it exactly")
      require(supported(f.dataType),
        s"bloomIndex: unsupported type ${f.dataType.simpleString} for $c " +
          "(string and integral columns index)")
    }
    val dirRel = s"_bloom/bl-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    val fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootQ = fs.makeQualified(new HPath(path)).toString
    val types = cols.map(c => schema.fields.find(_.name == c).get.dataType)
    // files store PHYSICAL names; sidecars key on them too, so a later
    // logical rename leaves every existing bloom valid
    val physCols = cols.map(c => m.colMap.getOrElse(c, c))
    // expected insertions from manifest row counts (a missing count
    // sizes for 1M — oversizing only costs sidecar bytes, never
    // correctness); fpp is per file, so probes across N files surface
    // ~N*fpp false keeps — still pruning almost everything
    val expected = files.map(f => f -> math.max(1L, m.stats.get(f).map(_.rows).getOrElse(1000000L))).toMap
    val readSchema = StructType(physCols.zip(types).map { case (c, t) => StructField(c, t) })
    // scanned absolute path → manifest entry (external `@alias/` refs
    // of a shallow clone resolve to their source root, so prefix
    // stripping against the table root alone cannot key them back)
    val absToRel = files.map(f =>
      Snapshot.fileKey(Snapshot.fileAbs(path, m, f)) -> f).toMap
    val df = spark.read.schema(readSchema)
      .parquet(files.map(f => Snapshot.fileAbs(path, m, f)): _*)
      .withColumn("__file", col("_metadata.file_path"))
    val sconf = org.apache.spark.graftbridge.ConfBridge.serializable(
      spark.sparkContext.hadoopConfiguration)
    val nCols = cols.size
    val written = df.rdd.mapPartitions { it =>
      // per-partition partial blooms: one array (per indexed column)
      // per data file seen in this split
      val acc = scala.collection.mutable.HashMap.empty[String, Array[BloomFilter]]
      it.foreach { row =>
        val full = row.getString(nCols)
        val rel = absToRel.getOrElse(Snapshot.fileKey(full),
          if (full.startsWith(rootQ + "/")) full.drop(rootQ.length + 1) else full)
        val bfs = acc.getOrElseUpdate(rel,
          Array.fill(nCols)(BloomFilter.create(expected.getOrElse(rel, 1000000L), fpp)))
        var i = 0
        while (i < nCols) { put(bfs(i), types(i), row.get(i)); i += 1 }
      }
      acc.iterator
    }.reduceByKey { (a, b) =>
      var i = 0
      while (i < a.length) { a(i).mergeInPlace(b(i)); i += 1 }
      a
    }.mapPartitions { it =>
      // write each merged sidecar from the executor that holds it; the
      // bytes are deterministic (same size + hash count, bits OR'd), so
      // a task retry overwrites identical content
      val tfs = new HPath(rootQ).getFileSystem(
        org.apache.spark.graftbridge.ConfBridge.value(sconf))
      it.map { case (rel, bfs) =>
        val out = new DataOutputStream(
          tfs.create(new HPath(s"$rootQ/$dirRel/${sidecarName(rel)}"), true))
        try {
          out.writeUTF(Magic)
          out.writeInt(nCols)
          var i = 0
          while (i < nCols) {
            out.writeUTF(physCols(i))
            // length-prefixed frame: BloomFilter.readFrom buffers past
            // its own bytes, so each filter round-trips via its exact
            // byte count, never the raw stream position
            val buf = new java.io.ByteArrayOutputStream()
            bfs(i).writeTo(buf)
            val bytes = buf.toByteArray
            out.writeInt(bytes.length)
            out.write(bytes)
            i += 1
          }
        } finally out.close()
        rel
      }
    }.collect()
    written.map(rel =>
      rel -> Snapshot.BloomRef(s"$dirRel/${sidecarName(rel)}", physCols)).toMap
  }

  private def readSidecar(fs: FileSystem, absFile: String): Map[String, BloomFilter] = {
    val in = new DataInputStream(fs.open(new HPath(absFile)))
    try {
      require(in.readUTF() == Magic, s"not a graft bloom sidecar: $absFile")
      val n = in.readInt()
      (0 until n).map { _ =>
        val c = in.readUTF()
        val bytes = new Array[Byte](in.readInt())
        in.readFully(bytes)
        c -> BloomFilter.readFrom(bytes)
      }.toMap
    } finally in.close()
  }

  /** Drop candidates a bloom PROVES cannot match. `probes` is a
    * conjunction: each entry is (column, OR-values) from a top-level
    * `c = v` / `c IN (...)`; a file is dropped when some probed,
    * indexed column contains NONE of its values. Candidates without a
    * bloom (or whose bloom lacks the column) always keep. Small
    * candidate sets probe on a driver pool; large ones — the exact
    * case blooms exist for, a point lookup over a sea of files — probe
    * as one Spark job over the sidecar list, so planning cost is
    * O(#files) tiny reads with cluster parallelism, never a scan.
    */
  private[operators] def prune(spark: SparkSession, tablePath: String, m: Snapshot.Manifest,
                               candidates: Seq[String], probes0: Seq[(String, Seq[Any])],
                               distributeAbove: Int = 64): Seq[String] = {
    // predicates speak logical names; refs and sidecars key physical
    val probes = probes0.map { case (c, vs) => m.colMap.getOrElse(c, c) -> vs }
    val probeCols = probes.map(_._1).toSet
    val applicable = candidates.filter(f =>
      m.blooms.get(f).exists(r => r.cols.exists(probeCols.contains)))
    if (probes.isEmpty || applicable.isEmpty) return candidates
    def keeps(fs: FileSystem, sidecar: String): Boolean = {
      val bfs = readSidecar(fs, Snapshot.fileAbs(tablePath, m, sidecar))
      probes.forall { case (c, vs) =>
        bfs.get(c).forall(bf => vs.exists(v => mightContain(bf, v)))
      }
    }
    val sidecarOf = applicable.map(f => f -> m.blooms(f).file).toMap
    val kept: Set[String] =
      if (applicable.size <= distributeAbove) {
        val fs = new HPath(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
        applicable.filter(f => keeps(fs, sidecarOf(f))).toSet
      } else {
        val sconf = org.apache.spark.graftbridge.ConfBridge.serializable(
          spark.sparkContext.hadoopConfiguration)
        val slices = math.max(1, math.min(applicable.size / 32, 512))
        spark.sparkContext.parallelize(applicable, slices).filter { rel =>
          keeps(new HPath(tablePath).getFileSystem(
            org.apache.spark.graftbridge.ConfBridge.value(sconf)), sidecarOf(rel))
        }.collect().toSet
      }
    candidates.filter(f => !applicable.contains(f) || kept(f))
  }
}
