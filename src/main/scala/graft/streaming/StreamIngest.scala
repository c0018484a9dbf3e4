package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.fold.{EntityFold, EntityState, UpdateTask}
import graft.ingest.EventTasks
import graft.ops.TaskCodec

/** Structured-Streaming wrapper over the batch fold (SURVEY §2.13): the
  * reference's filer-watcher + RabbitMQ + worker pipeline collapses to
  * `readStream → validate → foreachBatch(applyToSnapshot)`.
  *
  *  - Source: file stream (the reference's `read_dir` maildir claim protocol,
  *    `warden_receiver.py:50–172`, is exactly what Spark's file source +
  *    checkpointing gives for free).
  *  - Late/future data: events older than `maxAgeDays` or more than 5 min in
  *    the future are rejected (`warden_receiver.py:444–457,510–517`); the
  *    watermark bounds any event-time state the same way.
  *  - State: the entity snapshot is a versioned parquet table; each
  *    micro-batch cogroups its tasks with the previous version and writes the
  *    next (the exactly-once story is the file sink's atomic directory swap +
  *    source checkpoint, mirroring the reference's ack-after-write,
  *    `update_manager.py:452–457`).
  */
object StreamIngest {

  /** Timestamp validation (`warden_receiver.py:510–517`): drop events beyond
    * the reception window or from the future (>5 min skew).
    */
  def validate(batch: DataFrame, nowEpoch: Long, maxAgeDays: Int = 7): DataFrame =
    batch.filter(
      unix_timestamp(col("ts")) > nowEpoch - maxAgeDays * 86400L &&
        unix_timestamp(col("ts")) <= nowEpoch + 300L)

  /** Day-tumbling windowed event counters with a watermark — the §2.13
    * "calendar-day buckets relative to event time" shape as a genuine
    * Structured-Streaming aggregation (reference `event_counter.py:77–105`
    * recomputes the same per-day vector from stored events; here the stream
    * maintains it incrementally). The 7-day watermark mirrors
    * `max_event_reception_age`: state for a day window is dropped once the
    * watermark passes its end, so event-time state is bounded by
    * |entities| × 7 windows regardless of stream length. In append output
    * mode a window emits exactly once, when the watermark closes it —
    * downstream gets immutable per-(entity, day) rows.
    */
  def dailyCounts(events: DataFrame, watermark: String = "7 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id").as("entity"), window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value")).cast("long")).as("conns"))
      .select(col("entity"), to_date(col("w").getField("start")).as("d"),
        col("n"), col("conns"))

  /** A persisted entity snapshot that a micro-batch of tasks folds onto. */
  trait EntityStore {
    def read(): Dataset[EntityState]
    /** Fold one batch of tasks onto the stored snapshot and persist. */
    def applyBatch(tasks: Dataset[UpdateTask], nowEpoch: Long): Unit
  }

  /** Versioned parquet snapshot store: read the latest version, write the
    * next — never overwrite the directory being read (Spark cannot
    * read-modify-write one parquet path in a single job).
    */
  final class SnapshotStore(spark: SparkSession, root: String) extends EntityStore {
    import spark.implicits._
    // Hadoop FS, not java.io.File: the store root may be hdfs://, s3a://, or
    // any other FileSystem scheme — local-only listing would silently report
    // "no versions" there.
    private def versions: Seq[Long] = {
      val path = new org.apache.hadoop.fs.Path(root)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.length > 1)
        .map(_.drop(1).toLong)
        .sorted
    }
    def read(): Dataset[EntityState] = versions.lastOption match {
      case Some(v) => spark.read.parquet(s"$root/v$v").as[EntityState]
      case None    => spark.emptyDataset[EntityState]
    }
    def write(ds: Dataset[EntityState]): Unit = {
      val next = versions.lastOption.getOrElse(-1L) + 1
      // Range-partition + sort by entity id: parquet min/max zone maps then
      // prune subnet/range scans over the record table — the columnar
      // restatement of the reference's int-IP index (SURVEY §4,
      // core/mongodb.py:81-95). The per-batch shuffle is the standard
      // layout-maintenance cost of a sorted store.
      ds.repartitionByRange(org.apache.spark.sql.functions.col("eid"))
        .sortWithinPartitions("eid")
        .write.mode("overwrite").parquet(s"$root/v$next")
    }
    override def applyBatch(tasks: Dataset[UpdateTask], nowEpoch: Long): Unit =
      write(EntityFold.applyToSnapshot(read(), tasks, nowEpoch))
  }

  /** Merge-on-read snapshot store: entities hash into `numBuckets` buckets;
    * a micro-batch rewrites ONLY the buckets its tasks touch, writing them as
    * a new delta version with a manifest of the buckets it owns. Reads
    * resolve each bucket to the newest version that wrote it, so per-batch
    * write cost is O(touched buckets), not O(snapshot) — the difference that
    * matters when a billion-record snapshot meets a thousand-task batch.
    * `compact()` folds all live buckets into one full version and drops the
    * superseded deltas (the read-amplification ceiling).
    *
    * Layout: `root/v<n>/bucket=<b>/part-....parquet` + `root/v<n>/_buckets.json`.
    * The manifest — not the directory listing — is the source of truth for
    * ownership: a bucket whose fold emptied out (all entities deleted) has a
    * manifest entry but no directory, and must NOT resurrect from an older
    * version.
    */
  /** @param maxDeltas if > 0, `applyBatch` auto-compacts once the delta
    *                   chain exceeds this many versions — the read-side scans
    *                   at most `maxDeltas + 1` version directories between
    *                   compactions, bounding read amplification under a
    *                   long-running micro-batch stream.
    */
  final class MergeOnReadSnapshotStore(spark: SparkSession, root: String,
                                       numBuckets: Int = 64,
                                       maxDeltas: Int = 0) extends EntityStore {
    import spark.implicits._
    require(numBuckets > 0)

    private def fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def versions: Seq[Long] = {
      val path = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toLong)
        .filter(v => fs.exists(manifestPath(v))) // manifest = commit record
        .sorted
    }

    private def manifestPath(v: Long) =
      new org.apache.hadoop.fs.Path(s"$root/v$v/_buckets.json")

    /** The manifest doubles as the COMMIT RECORD: `versions` only lists
      * directories whose manifest exists, so a version that crashed between
      * the parquet write and the manifest write is invisible to readers and
      * healed by the retry's overwrite. Two formats are read: the legacy
      * bare bucket array, and the object form
      * `{"buckets":[...],"batches":[...]}` whose `batches` carries the
      * micro-batch ids this version (or, after compaction, its absorbed
      * ancestors) committed — the idempotent-replay ledger.
      */
    /** Per-instance parse cache: a manifest is immutable once written (it IS
      * the commit record), so each version's file is opened and parsed at
      * most once per store instance — one micro-batch otherwise re-reads
      * every delta's manifest several times (ledger check, owner
      * resolution, compaction sweep), which on an object store is a pile of
      * sequential metadata round-trips. Version numbers are never reused
      * (`next` is strictly increasing, compaction continues past the
      * deleted range), so entries can't go stale; `compact()` still drops
      * the absorbed ids for hygiene.
      */
    private val manifestCache =
      new java.util.concurrent.ConcurrentHashMap[Long, (Seq[Int], Seq[Long])]()

    private def readManifest(v: Long): (Seq[Int], Seq[Long]) =
      manifestCache.computeIfAbsent(v, _ => {
        val in = fs.open(manifestPath(v))
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
        import scala.jdk.CollectionConverters._
        if (node.isArray) (node.elements().asScala.map(_.asInt()).toSeq, Seq.empty)
        else (node.get("buckets").elements().asScala.map(_.asInt()).toSeq,
          Option(node.get("batches")).toSeq
            .flatMap(_.elements().asScala.map(_.asLong()).toSeq))
      })

    private def writeManifest(v: Long, buckets: Seq[Int],
                              batches: Seq[Long] = Seq.empty): Unit = {
      val out = fs.create(manifestPath(v), true)
      val json = s"""{"buckets":${buckets.sorted.mkString("[", ",", "]")},""" +
        s""""batches":${batches.sorted.mkString("[", ",", "]")}}"""
      try out.write(json.getBytes("UTF-8"))
      finally out.close()
    }

    /** bucket → newest version owning it (later versions shadow earlier). */
    private def owners: Map[Int, Long] =
      versions.foldLeft(Map.empty[Int, Long]) { (acc, v) =>
        acc ++ readManifest(v)._1.map(_ -> v)
      }

    /** Micro-batch ids committed into this store (carried forward through
      * compaction) — the replay-dedup ledger of [[applyBatchIdempotent]]. */
    def committedBatchIds: Set[Long] =
      versions.flatMap(v => readManifest(v)._2).toSet

    private val stateSchema =
      org.apache.spark.sql.Encoders.product[EntityState].schema
        .add("bucket", org.apache.spark.sql.types.IntegerType)

    private def bucketCol(etype: org.apache.spark.sql.Column,
                          eid: org.apache.spark.sql.Column) =
      pmod(hash(etype, eid), lit(numBuckets))

    /** Read the live state of a bucket subset: for each delta version, scan
      * only the bucket partitions that version still owns (directory-level
      * partition pruning via the `bucket=` filter).
      */
    private def readOwned(wanted: Int => Boolean): Dataset[EntityState] = {
      val byVersion = owners.toSeq.filter { case (b, _) => wanted(b) }
        .groupBy(_._2).view.mapValues(_.map(_._1)).toSeq
      val parts = byVersion.map { case (v, buckets) =>
        spark.read.schema(stateSchema)
          .option("basePath", s"$root/v$v")
          .parquet(s"$root/v$v")
          .where(col("bucket").isin(buckets.map(Integer.valueOf): _*))
          .select("etype", "eid", "json").as[EntityState]
      }
      parts.reduceOption(_ union _).getOrElse(spark.emptyDataset[EntityState])
    }

    override def read(): Dataset[EntityState] = readOwned(_ => true)

    override def applyBatch(tasks: Dataset[UpdateTask], nowEpoch: Long): Unit =
      applyInternal(tasks, nowEpoch, Seq.empty)

    /** Exactly-once variant for streaming crash-replay (the MOR sibling of
      * [[TransactionalSnapshotStore.applyBatch]]): a `batchId` already in
      * the committed ledger returns without touching storage, so the replay
      * of a batch that committed before the streaming checkpoint recorded
      * it cannot double-fold. The ledger rides the per-version manifest
      * (the store's existing commit point — a version is invisible until
      * its manifest lands) and survives compaction, which carries absorbed
      * ids forward. A batch whose task set is EMPTY records no id (there is
      * no version to record it on); its replay is a no-op by vacuity.
      */
    def applyBatchIdempotent(tasks: Dataset[UpdateTask], nowEpoch: Long,
                             batchId: Long): Unit =
      if (!committedBatchIds.contains(batchId))
        applyInternal(tasks, nowEpoch, Seq(batchId))

    private def applyInternal(tasks: Dataset[UpdateTask], nowEpoch: Long,
                              batchIds: Seq[Long]): Unit = {
      // One directory listing per batch (the store is single-writer by
      // contract, so the listing can't change under us mid-batch).
      val vs = versions
      // The task set is read twice (bucket discovery + the fold): pin it for
      // the batch so a streaming source isn't re-scanned.
      tasks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // Touched-bucket set: tiny by construction (≤ numBuckets ints).
        val touched = tasks.select(bucketCol(col("etype"), col("eid")))
          .distinct().as[Int].collect().toSet
        if (touched.isEmpty) return
        val folded = EntityFold.applyToSnapshot(readOwned(touched), tasks, nowEpoch)
        val next = vs.lastOption.getOrElse(-1L) + 1
        // One file per bucket, eid-sorted inside: parquet min/max zone maps
        // keep pruning subnet/range scans, same as the full-rewrite store's
        // layout.
        folded
          .withColumn("bucket", bucketCol(col("etype"), col("eid")))
          .repartition(col("bucket"))
          .sortWithinPartitions("bucket", "eid")
          .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/v$next")
        writeManifest(next, touched.toSeq, batchIds)
        if (maxDeltas > 0 && vs.size + 1 > maxDeltas) compact()
      } finally tasks.unpersist()
    }

    /** Rewrite the live snapshot as one full version and drop superseded
      * deltas — bounds read amplification after many small batches.
      */
    def compact(): Unit = {
      val olds = versions
      if (olds.isEmpty) return
      val next = olds.last + 1
      // absorbed batch ids ride along so the replay ledger survives the
      // deltas' deletion
      val absorbed = olds.flatMap(v => readManifest(v)._2).distinct
      read()
        .withColumn("bucket", bucketCol(col("etype"), col("eid")))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", "eid")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/v$next")
      writeManifest(next, (0 until numBuckets).toSeq, absorbed)
      olds.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true)
        manifestCache.remove(v)
      }
    }

    /** Delta-version count since the last compaction (read-amp telemetry). */
    def versionCount: Int = versions.size
  }

  /** One micro-batch: validate → derive tasks → fold onto the snapshot. */
  def runBatch(store: EntityStore, batch: DataFrame, nowEpoch: Long,
               maxAgeDays: Int = 7): Unit = {
    import batch.sparkSession.implicits._
    val tasks = EventTasks.preAggregated(validate(batch, nowEpoch, maxAgeDays))
      .map(t => UpdateTask(t.etype, t.eid, t.seq, t.src, TaskCodec.render(t.ops)))
    store.applyBatch(tasks, nowEpoch)
  }

  /** Streaming-native stateful counters via `mapGroupsWithState` — the
    * `flatMapGroupsWithState` pattern SURVEY §2.13 maps NERD's per-entity
    * worker state onto: the shuffle keys by entity (the reference's
    * hash-routing), state is the running (total, last_activity) pair, and
    * `GroupStateTimeout` carries the `_ttl` eviction semantics. This is the
    * ingest-critical-subset alternative to the snapshot-rebuild path; the
    * full record stays on the batch fold (state size, SURVEY §7.3).
    */
  def statefulCounts(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]):
      org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val keyed = events
      .selectExpr("user_id", "cast(floor(unix_timestamp(ts)) as long) as epoch")
      .as[(Long, Long)]
      .groupByKey(_._1)
    keyed.mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
        val (prevN, prevLast) = state.getOption.getOrElse((0L, 0L))
        var n = prevN
        var last = prevLast
        rows.foreach { case (_, ep) => n += 1; last = math.max(last, ep) }
        state.update((n, last))
        (uid, n, last)
    }
  }

  /** Event-time state TTL (SURVEY §2.13 state-TTL row): the reference's
    * `_ttl`-token eviction (`cleaner.py:204–241` — all tokens expired ⇒
    * `!DELETE` the record) expressed as a NATIVE streaming state timeout
    * instead of a daily batch sweep. Per-entity counter state expires
    * `ttlSecs` after the entity's last event-time activity; a timed-out
    * group emits one tombstone row `(entity, -1, lastSeen)` — the `!DELETE`
    * analog — and drops its state, bounding state size by the active-entity
    * set, which is what makes the operator viable at 100 TB.
    *
    * Reactivation semantics (reference-faithful, `cleaner.py:204–241`): a
    * `!DELETE`d record that receives new events afterwards is a FRESH record
    * — so an entity reactivated after its tombstone restarts its counter at
    * 0, exactly like the reference re-creating the entity. Eviction drops
    * state, so a cross-lifetime grand total is deliberately NOT kept (it
    * would require unbounded tombstone state, defeating the TTL). Consumers
    * that need all-time totals aggregate per-lifetime outputs downstream
    * (each lifetime's rows are cumulative; lifetimes are delimited by the
    * tombstone). Pinned by `StreamingSpec` "reactivated entity restarts".
    */
  def statefulCountsWithTtl(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                            ttlSecs: Long): org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val keyed = events
      .withWatermark("ts", "0 seconds")
      .selectExpr("user_id", "ts")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
    keyed.flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
       state: GroupState[(Long, Long)]) =>
        if (state.hasTimedOut) {
          val (_, last) = state.get
          state.remove()
          Iterator((uid, -1L, last))
        } else {
          val (prevN, prevLast) = state.getOption.getOrElse((0L, 0L))
          var n = prevN
          var last = prevLast
          rows.foreach { case (_, t) => n += 1; last = math.max(last, t.getTime / 1000) }
          val timeoutMs = (last + ttlSecs) * 1000
          if (timeoutMs < state.getCurrentWatermarkMs()) {
            // the group's data arrived with the watermark ALREADY past its
            // would-be expiry (late-ish data after an earlier batch advanced
            // the clock): a past timeout timestamp is rejected by the
            // runtime, and semantically the record is expired the moment the
            // batch commits — evict now, emitting the update and the
            // tombstone in order (the reference's cleaner would delete it on
            // the very next sweep)
            state.remove()
            Iterator((uid, n, last), (uid, -1L, last))
          } else {
            state.update((n, last))
            state.setTimeoutTimestamp(timeoutMs)
            Iterator((uid, n, last))
          }
        }
    }
  }

  /** Streaming first-seen exact deduplication: the stateful, micro-batch
    * form of the crawl-vs-corpus dedup (`llm_incr_dedup`'s Bloom path is the
    * batch analog). Each micro-batch shuffles its documents by content
    * digest; state holds ONE long per distinct digest ever seen (the
    * canonical doc id — the minimum id in the digest's first-seen batch),
    * so state size is bounded by the distinct-content count, not the stream
    * length, and a duplicate arriving any number of batches later maps to
    * the same canonical without rescanning the corpus. Emits every input
    * row exactly once: (doc_id, canonical, kept 0/1).
    */
  def statefulDedup(docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                    keyExpr: String = "md5(text)"):
      org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    // keyExpr picks the identity: the default exact digest, or e.g. the
    // bag-of-words fingerprint for order-insensitive streaming dedup
    val keyed = docs.selectExpr("doc_id", s"$keyExpr as dg")
      .as[(Long, String)]
      .groupByKey(_._2)
    keyed.flatMapGroupsWithState[Long, (Long, Long, Long)](
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (_: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
        val ids = rows.map(_._1).toVector
        val canonical = state.getOption.getOrElse(ids.min)
        if (!state.exists) state.update(canonical)
        ids.iterator.map(id =>
          (id, canonical, if (id == canonical) 1L else 0L))
    }
  }

  /** Exactly-once snapshot store keyed by micro-batch id — the missing half
    * of the crash-replay story. The plain [[SnapshotStore]] is append-only
    * versioned, so a query that dies AFTER `applyBatch` committed but BEFORE
    * the streaming checkpoint recorded the batch would re-fold that batch on
    * restart and double every counter. Here the version id IS the batch id
    * (`b<batchId>`, committed iff the parquet job's `_SUCCESS` marker
    * exists), so replay of an already-committed batch is a metadata-only
    * no-op and a crash mid-write is invisible (uncommitted dirs are ignored
    * by `read()` and overwritten by the retry). This is the reference's
    * ack-after-processing redelivery contract (`update_manager.py:442–457`)
    * restated as idempotent-by-batch-id sink commits — the standard Spark
    * transactional-foreachBatch discipline.
    */
  final class TransactionalSnapshotStore(spark: SparkSession, root: String) {
    import spark.implicits._
    private def fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def committedBatches: Seq[Long] = {
      val path = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("b") && n.length > 1 && n.drop(1).forall(_.isDigit))
        .filter(n => fs.exists(new org.apache.hadoop.fs.Path(s"$root/$n/_SUCCESS")))
        .map(_.drop(1).toLong)
        .sorted
    }
    def read(): Dataset[EntityState] = committedBatches.lastOption match {
      case Some(b) => spark.read.parquet(s"$root/b$b").as[EntityState]
      case None    => spark.emptyDataset[EntityState]
    }
    /** Number of committed batch versions (replay-dedup receipt: a replayed
      * batch must NOT mint a new version). */
    def commitCount: Int = committedBatches.size
    /** Fold one micro-batch onto the snapshot, exactly once per `batchId`:
      * a replayed id returns without touching storage. */
    def applyBatch(tasks: Dataset[UpdateTask], nowEpoch: Long, batchId: Long): Unit = {
      if (committedBatches.contains(batchId)) return // replay after commit
      EntityFold.applyToSnapshot(read(), tasks, nowEpoch)
        .repartitionByRange(col("eid"))
        .sortWithinPartitions("eid")
        .write.mode("overwrite").parquet(s"$root/b$batchId")
    }
  }

  /** One micro-batch through the transactional store: validate → derive
    * tasks → fold, committed under the batch id (see
    * [[TransactionalSnapshotStore.applyBatch]]).
    */
  def runBatchExactlyOnce(store: TransactionalSnapshotStore, batch: DataFrame,
                          nowEpoch: Long, batchId: Long, maxAgeDays: Int = 7): Unit =
    store.applyBatch(deriveBatchTasks(batch, nowEpoch, maxAgeDays), nowEpoch, batchId)

  /** Same, against the merge-on-read store (the production shape: O(touched
    * buckets) writes + the manifest-ledger replay dedup). */
  def runBatchExactlyOnce(store: MergeOnReadSnapshotStore, batch: DataFrame,
                          nowEpoch: Long, batchId: Long, maxAgeDays: Int): Unit =
    store.applyBatchIdempotent(deriveBatchTasks(batch, nowEpoch, maxAgeDays),
      nowEpoch, batchId)

  private def deriveBatchTasks(batch: DataFrame, nowEpoch: Long,
                               maxAgeDays: Int): Dataset[UpdateTask] = {
    import batch.sparkSession.implicits._
    EventTasks.preAggregated(validate(batch, nowEpoch, maxAgeDays))
      .map(t => UpdateTask(t.etype, t.eid, t.seq, t.src, TaskCodec.render(t.ops)))
  }

  /** Two-lane source admission — the reference's bounded normal queue +
    * unbounded priority queue, priority consumed first
    * (`task_queue.py:4–12,365–377`; internal tasks are priority,
    * `update_manager.py:349–361`). Spark-first restatement: per-source
    * trigger admission on a union of two file sources. The normal lane is
    * rate-limited (`maxFilesPerTrigger`), so a backlog drains across many
    * micro-batches; the priority lane has NO admission cap, so everything
    * waiting on it lands in the first micro-batch — the whole priority
    * queue is serviced while the normal backlog is still queued, which is
    * exactly the drain-priority-first contract. Each row lands in the sink
    * tagged with its lane and micro-batch id, so the admission schedule
    * itself is an auditable output (and, because the fold downstream is
    * order-insensitive by design, the FINAL folded state is invariant to
    * the admission split — the property that makes bounded admission safe
    * at 100-TB backlog scale).
    */
  def startTwoLane(spark: SparkSession, normalDir: String, priorityDir: String,
                   schema: org.apache.spark.sql.types.StructType,
                   checkpointDir: String, sinkDir: String,
                   normalMaxFiles: Int = 1): StreamingQuery = {
    val normal = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", normalMaxFiles.toString)
      .parquet(normalDir)
      .withColumn("lane", lit("normal"))
    val priority = spark.readStream.schema(schema)
      .parquet(priorityDir)
      .withColumn("lane", lit("priority"))
    priority.unionByName(normal)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(sinkDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** Query-level restart supervisor (`update_manager.py:478–497`: the thread
    * watchdog that restarts dead workers, ≤ 20 restarts). Spark retries
    * TASKS for free; what it does not do by itself is resurrect a DRIVER
    * query whose micro-batch exhausted its task retries. This supervisor
    * rebuilds the query from its checkpoint after a failure, up to
    * `maxRestarts` times — combined with [[TransactionalSnapshotStore]] the
    * restarted query replays the failed batch exactly once. Returns the
    * number of restarts consumed; rethrows once the budget is spent.
    */
  def superviseRestarts(maxRestarts: Int)(mkQuery: () => StreamingQuery): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      // mkQuery()/start() sit INSIDE the try: a restart attempt that dies
      // while rebuilding the query (transient checkpoint-dir IO, a source
      // listing hiccup) consumes restart budget like a post-start death —
      // otherwise a start-time failure would escape the supervisor entirely.
      // NonFatal (not just StreamingQueryException) for the same reason;
      // fatal JVM errors still propagate immediately.
      try { mkQuery().awaitTermination(); done = true }
      catch {
        case scala.util.control.NonFatal(e) =>
          if (restarts >= maxRestarts) throw e
          restarts += 1
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"query failed (restart $restarts/$maxRestarts): ${e.getMessage}")
      }
    }
    restarts
  }

  /** Batch-level watchdog (`NERDd/core/scheduler.py` + the reference's
    * worker-watchdog restarts): a failing micro-batch retries up to
    * `maxAttempts` times before the failure propagates and kills the query —
    * Spark already retries TASKS; this covers batch-scoped transient faults
    * (a flaky store listing, an external fixture hiccup) the same way the
    * reference's supervisor re-runs a crashed worker.
    */
  def runBatchWithRetry(store: EntityStore, batch: DataFrame, nowEpoch: Long,
                        maxAgeDays: Int = 7, maxAttempts: Int = 3): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      // NonFatal only: retrying after a fatal JVM error (OutOfMemoryError,
      // StackOverflowError) would re-run the batch on a corrupted heap —
      // those must propagate and kill the query so the SUPERVISOR restarts
      // a fresh JVM-side query from the checkpoint instead
      try { runBatch(store, batch, nowEpoch, maxAgeDays); done = true }
      catch {
        case scala.util.control.NonFatal(e) if attempt < maxAttempts =>
          org.apache.log4j.Logger.getLogger(getClass)
            .warn(s"batch attempt $attempt failed, retrying: ${e.getMessage}")
      }
    }
  }

  /** Start the streaming ingest over a parquet file source. `nowEpoch` is a
    * function so tests can pin batch time (determinism rule SURVEY §7.3).
    *
    * Backpressure: the reference bounds inflow with RabbitMQ prefetch +
    * queue length; the Spark analog is source-side trigger admission —
    * `maxFilesPerTrigger`/`maxBytesPerTrigger` cap what each micro-batch
    * admits, so a backlog drains in bounded-size batches instead of one
    * giant catch-up batch that overwhelms executor memory.
    */
  def start(spark: SparkSession, sourceDir: String, store: EntityStore,
            checkpointDir: String, nowEpoch: () => Long,
            maxFilesPerTrigger: Option[Int] = None,
            maxBytesPerTrigger: Option[Long] = None,
            maxAttempts: Int = 1,
            trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val reader0 = spark.readStream.schema(schema)
    val reader1 = maxFilesPerTrigger.fold(reader0)(n =>
      reader0.option("maxFilesPerTrigger", n.toString))
    val reader = maxBytesPerTrigger.fold(reader1)(n =>
      reader1.option("maxBytesPerTrigger", n.toString))
    val writer = reader
      .parquet(sourceDir)
      .withWatermark("ts", "7 days")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        runBatchWithRetry(store, batch, nowEpoch(), maxAttempts = math.max(1, maxAttempts))
      }
    // Trigger.AvailableNow drains the backlog in admission-bounded batches
    // and terminates — the finite-run mode (correctness gate, backfills);
    // default is the continuous watcher the reference's daemon runs.
    trigger.fold(writer)(writer.trigger).start()
  }
}
