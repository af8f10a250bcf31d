package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Sinks (SURVEY §2.2): the reference's per-day batching + per-day commit
  * (sql_to_line.py:91,126) maps to date-partitioned parquet with per-task
  * atomic commits; its UPDATE-merge maps to an idempotent foreachBatch
  * overwrite of the touched partitions.
  *
  * Scale: `partitionBy(date)` gives partition pruning to every downstream
  * reader and bounds any reprocessing to one day — exactly the reference's
  * unit of recovery. (Delta/Iceberg MERGE is the production path; not
  * available offline.)
  */
object Sinks {

  /** Batch: write a frame partitioned by the calendar day of `tsCol`. */
  def writePartitionedByDay(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("date")
      .parquet(outDir)

  /** Day-scoped idempotent merge (replaceWhere-style): overwrite exactly
    * the date partitions present in `updates` — dynamic partition
    * overwrite — leaving every other day untouched. This is the
    * reference's UPDATE-in-place recovery unit (sql_to_line.py:91,126,
    * 230-234) without a transactional table format: a replayed merge
    * rewrites the same days with the same rows, so double-runs produce
    * identical partition contents (exactly-once per day), where a plain
    * append would duplicate and a static overwrite would drop the
    * untouched days.
    *
    * Caller contract: `updates` must carry COMPLETE days — the merge
    * replaces each touched day wholesale.
    */
  def mergeDays(updates: DataFrame, tsCol: String, outDir: String): Unit = {
    val spark  = updates.sparkSession
    val before = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try updates.withColumn("date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("date")
      .parquet(outDir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", before)
  }

  /** Compact a date-partitioned parquet dataset in place: rewrite each day
    * into ⌈day bytes / targetBytes⌉ files. Streaming appends and frequent
    * small merges accrete thousands of tiny files per partition — at 100 TB
    * the resulting open/seek overhead and NameNode/listing pressure
    * dominate read cost, so periodic compaction is a first-class
    * maintenance operator (what OPTIMIZE does in table formats). The
    * rewrite shuffles each day's rows to its computed width via a
    * repartition keyed by (date, random-ish row bucket) and rewrites only
    * days whose file count exceeds their target — untouched days keep
    * their files byte-identical.
    *
    * Returns (daysCompacted, filesBefore, filesAfter).
    */
  def compactDays(spark: org.apache.spark.sql.SparkSession, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int, Int) = {
    import org.apache.hadoop.fs.Path
    // Hadoop FS API, not java.io: the operator must work wherever the
    // write path does (hdfs://, s3a://, file://)
    val root = new Path(outDir)
    val fs   = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dayDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
    def parquetsOf(d: Path) =
      fs.listStatus(d).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    var before = 0
    var after  = 0
    var days   = 0
    dayDirs.foreach { st =>
      val d     = st.getPath
      val files = parquetsOf(d)
      before += files.length
      val bytes  = files.map(_.getLen).sum
      val target = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (files.length > target) {
        days += 1
        // rewrite THIS day only: read the one partition dir, coalesce to
        // the target width, then swap — new files move IN first (their
        // UUID names can't collide with the old ones), originals are
        // deleted after. A crash mid-swap leaves the day readable
        // (duplicated at worst, and the duplicate window is the move
        // loop, not the full rewrite); it never leaves the day empty.
        val day = spark.read.parquet(d.toString)
        val tmp = new Path(root, s".compact_tmp_${d.getName}")
        day.repartition(target).write.mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        val produced = parquetsOf(tmp)
        produced.foreach(f => fs.rename(f.getPath, new Path(d, f.getPath.getName)))
        files.foreach(f => fs.delete(f.getPath, false))
        fs.delete(tmp, true)
        // report what the rewrite actually produced (an empty input
        // partition writes fewer than `target` files)
        after += produced.length
      } else after += files.length
    }
    (days, before, after)
  }

  /** The clustering key [[zorderWrite]] sorts by: each dimension is first
    * scaled to the SAME 16-bit range over its observed [min, max], then
    * Morton-interleaved (Lakehouse.zval). The normalization matters: raw
    * domains of unequal width (lineitem's 20k × 1k keys) put one dim's
    * high bits entirely above the other's, and the "z" order degenerates
    * to a single-column sort — measured before the fix, b-only predicates
    * read 334k/600k rows; balanced, ~40k. Runs one small min/max agg over
    * `df` (a second narrow scan — noise next to the full rewrite).
    * Assumes dimension values fit 47 bits (the ×65535 scale must not
    * overflow a long).
    */
  private[graft] def normalizedZ(df: DataFrame, aCol: String,
      bCol: String): org.apache.spark.sql.Column = {
    val r = df.agg(min(aCol).cast("long"), max(aCol).cast("long"),
      min(bCol).cast("long"), max(bCol).cast("long")).head()
    def norm(c: String, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else (((col(c).cast("long") - lo) * 65535L) / (hi - lo)).cast("long")
    Lakehouse.zval(norm(aCol, r.getLong(0), r.getLong(1)),
      norm(bCol, r.getLong(2), r.getLong(3)))
  }

  /** Z-order clustered write: key rows by the balanced Morton interleave
    * of two dimension columns ([[normalizedZ]]), range-partition and sort
    * by it. Each output file then covers one tight z interval — a small
    * square in (a, b) space — so its parquet min/max stats are tight on
    * BOTH original columns, and the stock pushed-down range predicates
    * prune row groups for EITHER dimension. A single-column sort prunes
    * only its own column's predicates; the z layout answers "sort by which
    * column?" with "both" (ScaleProbe measures rows-read across the two
    * layouts and three predicate shapes). The z key is dropped before the
    * write: pruning rides ordinary (a, b) stats — readers need no
    * cooperation, and the layout survives any engine that reads parquet
    * footers.
    */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String, outDir: String,
      numFiles: Int = 64): Unit =
    df.withColumn("__z", normalizedZ(df, aCol, bCol))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** SCD Type-2 merge: fold a batch of dimension `updates` (one row per
    * key, stamped `eff_ts` microseconds) into a versioned history table
    * with (`valid_from`, `valid_to`, `is_current`). Rows whose tracked
    * attributes are unchanged pass through untouched; changed keys close
    * their current version (`valid_to` = eff_ts, is_current = false) and
    * append a new open version; unseen keys insert as new open versions.
    * This is the UPDATE-then-INSERT history pattern the reference's
    * in-place merge (sql_to_line.py:230-234) cannot express — and the
    * standard way a warehouse tracks attribute changes over time.
    *
    * Pure DataFrame → DataFrame (caller persists, e.g. via [[mergeDays]]
    * keyed on valid_from): one key-partitioned join + unions, no windows,
    * no collect — history size is Θ(changes), parallelism is by key.
    *
    * `history` schema: key, attrs..., valid_from, valid_to (null = open),
    * is_current. `updates` schema: key, attrs...
    */
  def scd2Merge(history: DataFrame, updates: DataFrame, key: String,
      attrs: Seq[String], effTs: Long): DataFrame = {
    val closed  = history.filter(!col("is_current"))
    // side-presence markers, NOT key nullness: a null dimension key never
    // joins (null ≠ null) but its history row must still pass through —
    // key-as-sentinel would silently delete it on every merge
    val current = history.filter(col("is_current"))
      .withColumn("c_present", lit(true))
    val uKeyed = updates.select(col(key).as("u_key") +:
      attrs.map(a => col(a).as(s"u_$a")): _*)
      .withColumn("u_present", lit(true))

    val changedCond = attrs.map(a => !(col(a) <=> col(s"u_$a"))).reduce(_ || _)
    val joined  = current.join(uKeyed, col(key) === col("u_key"), "full_outer")
    val matched = col("c_present").isNotNull && col("u_present").isNotNull

    // current rows with no (joinable) update, or an identical update
    val untouched = joined.filter(col("c_present").isNotNull &&
        (!matched || !changedCond))
      .select(history.columns.map(col): _*)
    // current rows superseded by a differing update → closed out
    val closedOut = joined.filter(matched && changedCond)
      .select(history.columns.map(col): _*)
      .withColumn("valid_to", lit(effTs))
      .withColumn("is_current", lit(false))
    // differing updates + keys with no current version → new open versions
    val opened = joined.filter(col("u_present").isNotNull &&
        (!matched || changedCond))
      .select(col("u_key").as(key) +: attrs.map(a => col(s"u_$a").as(a)): _*)
      .withColumn("valid_from", lit(effTs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

    closed.unionByName(untouched).unionByName(closedOut).unionByName(opened)
  }

  /** Batch: write two tables bucketed by their join key. Readers joining
    * on that key get co-located partitions — the join plans with ZERO
    * exchanges (the 100 TB answer to repeated fact-fact joins: pay the
    * shuffle once at write time). Bucketed tables must go through the
    * catalog (`saveAsTable`).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Streaming: per-micro-batch append into date partitions, stamped with
    * the micro-batch id. Parquet append is at-least-once on replay — a
    * checkpoint-restart rerun of the last batch can double-append, and
    * readers dedupe on (batch_id, key) or take max(batch_id). For the
    * exactly-once unit of recovery (the reference's per-day commit,
    * sql_to_line.py:126), use [[streamToPartitionedParquetExactlyOnce]].
    */
  def streamToPartitionedParquet(stream: DataFrame, tsCol: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("date", to_date(col(tsCol)))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Append)
          .partitionBy("date")
          .parquet(outDir)
      }
      .start()

  /** Streaming with an exactly-once commit protocol over plain parquet —
    * the manifest/commit-log story a transactional table format (Delta/
    * Iceberg, the production path, unavailable offline) would provide,
    * reduced to its essentials. Per micro-batch, [[commitBatch]]:
    *
    *   1. no-ops if `outDir/_manifests/batch-<id>` exists (replay of a
    *      fully committed batch);
    *   2. deletes any `b<id>-*` files a crashed attempt left in the date
    *      partitions (partial publication is keyed by file-name prefix,
    *      so cleanup needs no undo log);
    *   3. stages the batch to a hidden dir, then moves each file into its
    *      final date partition under the `b<id>-` prefix;
    *   4. commit point: atomically renames the manifest marker into place.
    *
    * A checkpoint replay therefore converges to IDENTICAL partition
    * contents no matter where the previous attempt died — before the
    * manifest rename the batch is re-published from scratch (step 2
    * removes the partial files), after it the batch is skipped whole.
    * State per batch is one empty marker file; `_manifests` and the
    * `.staging-*` dirs are underscore/dot-prefixed, which parquet readers
    * ignore. Same unit-of-recovery guarantee as the reference's per-day
    * batch commit (sql_to_line.py:126), extended to streaming.
    */
  def streamToPartitionedParquetExactlyOnce(stream: DataFrame, tsCol: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, batchId, tsCol, outDir)
      }
      .start()

  /** Idempotent per-micro-batch commit — the foreachBatch body of
    * [[streamToPartitionedParquetExactlyOnce]], exposed so the replay
    * contract is directly testable (SinksSpec kill-and-replay).
    */
  def commitBatch(batch: DataFrame, batchId: Long, tsCol: String,
      outDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val spark     = batch.sparkSession
    val root      = new Path(outDir)
    val fs        = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = new Path(root, "_manifests")
    // zero-padded so a lexical listing is also the commit order
    val manifest  = new Path(manifests, f"batch-$batchId%020d")
    if (fs.exists(manifest)) return
    val prefix = s"b$batchId-"
    // a previous attempt of THIS batch may have died mid-publish: its
    // partial files all carry the b<id>- prefix, so they are removable
    // without any record of how far it got
    if (fs.exists(root)) fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .foreach { d =>
        fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith(prefix))
          .foreach(f => fs.delete(f.getPath, false))
      }
    val staging = new Path(root, s".staging-batch-$batchId")
    batch.withColumn("date", to_date(col(tsCol)))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("date")
      .parquet(staging.toString)
    // Hadoop FileSystem.rename/mkdirs report failure by RETURNING FALSE,
    // not throwing. Every publish step must be checked: a silently failed
    // rename followed by the staging delete + manifest commit below would
    // be permanent data loss under an exactly-once marker. On any failure
    // we throw BEFORE touching staging or the manifest, so a replay of the
    // batch finds no manifest, clears the b<id>- partials, and redoes the
    // publish from intact staged files.
    def must(ok: Boolean, what: => String): Unit =
      if (!ok) throw new java.io.IOException(s"commitBatch($batchId): $what")
    fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .foreach { d =>
        val dest = new Path(root, d.getPath.getName)
        must(fs.mkdirs(dest) || fs.getFileStatus(dest).isDirectory,
          s"mkdirs failed: $dest")
        fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            val target = new Path(dest, prefix + f.getPath.getName)
            must(fs.rename(f.getPath, target), s"rename ${f.getPath} -> $target")
          }
      }
    fs.delete(staging, true)
    must(fs.mkdirs(manifests) || fs.getFileStatus(manifests).isDirectory,
      s"mkdirs failed: $manifests")
    val tmp = new Path(manifests, s".tmp-$batchId")
    fs.create(tmp, true).close()
    must(fs.rename(tmp, manifest), s"manifest rename $tmp -> $manifest")
  }

  /** Time-travel read of the exactly-once sink: the rows of every
    * COMMITTED batch with id <= `asOfBatch` — the `VERSION AS OF` face of
    * the manifest log, reduced to essentials like [[commitBatch]] itself.
    *
    * Consistency comes from reading the COMMIT LOG, not the data files: a
    * crashed attempt's partial `b<id>-` files (manifest never landed) and
    * any batch still publishing are filtered out by batch id, so the
    * snapshot is stable mid-crash and mid-ingest. The committed-id set is
    * one driver-side `_manifests` listing — O(total batches), the same
    * scale Delta/Iceberg logs carry.
    *
    * Scale-stable membership (round 7 — formerly a literal IN-list, which
    * degenerates into an O(batches)-literal expression tree at O(10⁵)
    * commits): the filter is the WATERMARK predicate
    * `batch_id <= max(committed ≤ asOf)` — a single pushed-down
    * comparison, so parquet row-group stats still prune whole files (each
    * published file holds exactly one batch id) and date-partition pruning
    * still applies — plus a broadcast LEFT ANTI join against the HOLES
    * below the watermark (ids with no manifest: crashed attempts whose
    * successor committed first). Streaming batch ids are dense, so the
    * hole set is bounded by failed attempts — almost always empty, never
    * O(commits) — and when it is empty the plan is just the filtered scan.
    */
  def readAsOf(spark: org.apache.spark.sql.SparkSession, outDir: String,
      asOfBatch: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root      = new Path(outDir)
    val fs        = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = new Path(root, "_manifests")
    val committed: Array[Long] =
      if (!fs.exists(manifests)) Array.empty
      else fs.listStatus(manifests).map(_.getPath.getName)
        .collect { case n if n.startsWith("batch-") =>
          n.stripPrefix("batch-").toLong }
        .filter(_ <= asOfBatch)
    require(committed.nonEmpty,
      s"readAsOf($asOfBatch): no committed batch at or before that id in $outDir")
    val watermark    = committed.max
    val committedSet = committed.toSet
    val holes        = (0L to watermark).filterNot(committedSet)
    val base = spark.read.parquet(outDir).filter(col("batch_id") <= watermark)
    if (holes.isEmpty) base
    else {
      import spark.implicits._
      base.join(broadcast(holes.toDF("batch_id")), Seq("batch_id"), "left_anti")
    }
  }
}
