package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F60: the IVF+PQ index LIFECYCLE — persist / version / swap
  * (VERDICT r9 #1). The F6/F25 family builds its artifacts in-session;
  * a production ANN service instead LOADS a versioned index and swaps
  * epochs: queries pin an epoch for their whole lifetime, a refresh
  * publishes the next epoch, and nothing a reader holds ever mutates.
  *
  * On-disk layout under `root` (all parquet, all immutable once
  * published):
  *
  * {{{
  *   seg=<n>/                 inverted-list SEGMENT: (vec_id, cent_id,
  *                            pcode) — written once, shared by every
  *                            later epoch (the Lucene/FAISS segment
  *                            model: an extend writes ONE new segment
  *                            for the delta, never rewrites the corpus)
  *   epoch=<e>/centroids/     coarse codebook (cent_id, ce)
  *   epoch=<e>/codebook/      product codebook (s, j, cw)
  *   epoch=<e>/segments/      manifest: the `seg` ids this epoch reads
  *   epoch=<e>/tombstones/    deleted vec_ids (absent = none)
  *   _ready_epoch_<e>         0-byte marker, written LAST (streaming
  *                            publishes suffix it with __txn_<batchId>)
  * }}}
  *
  * The SWAP discipline is the marker file: an epoch exists only once
  * its `_ready_epoch_<e>` marker does, and the marker is created (one
  * atomic name-level operation) strictly after every artifact under
  * `epoch=<e>/` is fully written. [[currentEpoch]] = max ready marker,
  * so a reader either sees the old epoch or the complete new one —
  * never a mix — and a build that dies mid-write leaves an invisible
  * (retryable) partial dir. Ready epochs are never rewritten
  * (enforced), so an epoch-pinned query is repeatable forever.
  *
  * Scale shape: centroids and codebook are K-row / m·kc-row bounded
  * artifacts (the broadcast contract); the lists segments are the only
  * corpus-sized piece, written repartitioned+sorted by cent_id so
  * row-group stats cluster each inverted list. [[extend]]'s work is
  * one assign+encode pass over the DELTA plus three bounded-table
  * rewrites — corpus-size-independent, the F37 merge discipline.
  */
object AnnIndex {

  /** Build parameters — the F25h surface. */
  final case class Params(nCentroids: Int, nProbe: Int, m: Int, kc: Int,
                          iters: Int, rateBp: Int)

  /** A loaded, epoch-pinned index: everything a search needs, nothing
    * mutable. `centroids` carries (cent_id, ce, cn); `lists` is the
    * LIVE view — the union of the epoch's segments minus its
    * tombstoned vec_ids.
    */
  final case class Loaded(epoch: Long, params: Params, centroids: DataFrame,
                          book: IndexedSeq[IndexedSeq[Array[Float]]],
                          lists: DataFrame)

  private def hadoopFs(spark: SparkSession, root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The publish marker doubles as the TXN RECORD (VERDICT r10 #3):
    * when an epoch is published on behalf of a streaming micro-batch,
    * the batch id rides the marker NAME — `_ready_epoch_<e>__txn_<b>`
    * — so "epoch published" and "batch committed" are ONE atomic
    * name-level creation with no window between them (a separate txn
    * file would leave a crash slot where the epoch exists but the
    * batch looks uncommitted, or vice versa).
    */
  private def markerName(epoch: Long, txn: Option[Long] = None) =
    s"_ready_epoch_$epoch" + txn.map(b => s"__txn_$b").getOrElse("")

  /** The live epoch: the highest published marker. Loud when none —
    * an index root without a ready epoch is not an index.
    */
  def currentEpoch(spark: SparkSession, root: String): Long = {
    val es = readyEpochs(spark, root)
    require(es.nonEmpty, s"no ready epoch under $root — build() one first")
    es.max
  }

  private def markerNames(spark: SparkSession, root: String): Seq[String] = {
    val (fs, p) = hadoopFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .filter(_.startsWith("_ready_epoch_"))
  }

  def readyEpochs(spark: SparkSession, root: String): Seq[Long] =
    markerNames(spark, root)
      .map(_.stripPrefix("_ready_epoch_").split("__txn_")(0).toLong)

  /** Micro-batch ids already committed into this index (read off the
    * marker names — one listing, no data scan).
    */
  private[graft] def committedTxns(spark: SparkSession, root: String): Set[Long] =
    markerNames(spark, root).toSeq
      .filter(_.contains("__txn_"))
      .map(_.split("__txn_")(1).toLong).toSet

  private def isReady(spark: SparkSession, root: String, epoch: Long): Boolean =
    readyEpochs(spark, root).contains(epoch)

  private def publish(spark: SparkSession, root: String, epoch: Long,
                      txn: Option[Long]): Unit = {
    val (fs, p) = hadoopFs(spark, root)
    require(!isReady(spark, root, epoch),
      s"epoch $epoch already published under $root")
    val ok = fs.createNewFile(
      new org.apache.hadoop.fs.Path(p, markerName(epoch, txn)))
    require(ok, s"epoch $epoch already published under $root")
  }

  private def segIds(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = hadoopFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("seg=") => n.stripPrefix("seg=").toLong }
  }

  /** One assign+encode pass: the (vec_id, cent_id, pcode) inverted-list
    * rows of `vecs` under a FROZEN (centroids, book) — the exact
    * two-pass index build of the in-session IVFPQ path
    * (Ann.ivfTopKPqWithBook), shared so a persisted segment can never
    * encode differently than the in-session index does.
    */
  def encodeLists(vecs: DataFrame, centroids: DataFrame,
                  book: IndexedSeq[IndexedSeq[Array[Float]]]): DataFrame =
    Ann.coarseAssign(vecs, centroids)
      .join(Ann.pqEncode(vecs, book), Seq("vec_id"))

  private def writeSegment(lists: DataFrame, root: String, seg: Long): Unit =
    lists
      // cluster each inverted list: one shuffle on cent_id, rows sorted
      // (cent_id, vec_id) within files so parquet row-group min/max
      // stats isolate a probed list without reading its neighbors
      .repartition(col("cent_id"))
      .sortWithinPartitions(col("cent_id"), col("vec_id"))
      .write.mode("overwrite").parquet(s"$root/seg=$seg")

  /** Tombstoned vec_ids of a published epoch — absent dir = none
    * (epochs published before a delete read as delete-free).
    */
  private def rawTombstones(spark: SparkSession, root: String,
                            epoch: Long): Option[DataFrame] = {
    val dir = s"$root/epoch=$epoch/tombstones"
    val (fs, p) = hadoopFs(spark, dir)
    if (fs.exists(p)) Some(spark.read.parquet(dir).select(col("vec_id")))
    else None
  }

  private def writeEpochTables(spark: SparkSession, root: String, epoch: Long,
                               params: Params, centroids: DataFrame,
                               book: IndexedSeq[IndexedSeq[Array[Float]]],
                               segs: Seq[Long],
                               txn: Option[Long] = None,
                               tombstones: Option[DataFrame] = None): Unit = {
    require(!isReady(spark, root, epoch),
      s"epoch $epoch is published and immutable under $root")
    import spark.implicits._
    val dir = s"$root/epoch=$epoch"
    centroids.select(col("cent_id"), col("ce"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    val bookRows = for {
      s <- book.indices; j <- book(s).indices
    } yield (s, j, book(s)(j).toSeq)
    bookRows.toDF("s", "j", "cw")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    // the manifest rides the params so load() needs no out-of-band
    // configuration — an epoch is self-describing
    segs.map(sg => (sg, params.nCentroids, params.nProbe, params.m,
        params.kc, params.iters, params.rateBp))
      .toDF("seg", "n_centroids", "n_probe", "m", "kc", "iters", "rate_bp")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/segments")
    tombstones.foreach(_.select(col("vec_id")).distinct()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/tombstones"))
    publish(spark, root, epoch, txn)
  }

  /** Full build: train the coarse + product codebooks on `vecs` (the
    * F25h trained path), encode the corpus into segment 1, publish
    * epoch 1. Returns the published epoch.
    */
  def build(spark: SparkSession, vecs: DataFrame, params: Params,
            root: String): Long = {
    require(readyEpochs(spark, root).isEmpty,
      s"$root already holds a published index — use extend() or a new root")
    val cents = Ann.initialCentroids(vecs, params.nCentroids)
    val book = Ann.pqCodebookTrained(vecs, params.m, params.kc,
      params.iters, params.rateBp)
    writeSegment(encodeLists(vecs, cents, book), root, seg = 1L)
    writeEpochTables(spark, root, epoch = 1L, params, cents, book, Seq(1L))
    1L
  }

  /** Incremental refresh: encode ONLY `newVecs` under the live epoch's
    * FROZEN codebooks into a new segment, publish epoch e+1 referencing
    * the old segments plus the new one. Work ∝ the delta (one
    * assign+encode pass + three bounded-table rewrites); readers
    * pinned at epoch e are untouched — their segments and tables are
    * immutable. Codebooks deliberately do NOT retrain here (the FAISS
    * operational rule: retraining is a rebuild under a fresh root,
    * because new codewords would silently re-key every existing
    * segment).
    */
  def extend(spark: SparkSession, root: String, newVecs: DataFrame,
             txn: Option[Long] = None): Long = {
    val e = currentEpoch(spark, root)
    val idx = load(spark, root, Some(e))
    val seg = segIds(spark, root).max + 1
    writeSegment(encodeLists(newVecs, idx.centroids, idx.book), root, seg)
    val oldSegs = loadManifest(spark, root, e)._2
    writeEpochTables(spark, root, e + 1, idx.params, idx.centroids,
      idx.book, oldSegs :+ seg, txn,
      tombstones = rawTombstones(spark, root, e)) // carried forward
    e + 1
  }

  /** DELETE vectors — the remaining lifecycle verb (a production index
    * must forget: takedowns, re-crawled replacements, GDPR). A delete
    * is a TOMBSTONE epoch: epoch e+1 references the SAME segments and
    * codebooks plus a (vec_id) tombstone table (old set ∪ `ids`);
    * [[load]] applies it as one broadcast anti-join, so a deleted
    * vector vanishes from every later epoch's search while readers
    * pinned at e keep their answers (the immutability law holds —
    * nothing a reader holds ever mutates). Physical removal is
    * [[compactSegments]]'s job: it rewrites the LIVE view (already
    * tombstone-filtered) and publishes with an EMPTY tombstone set —
    * exactly Lucene's delete→merge discipline. Tombstones are bounded
    * by the deletes between compactions (the broadcast contract);
    * re-adding a deleted vec_id requires a compaction first — the
    * tombstone hides every occurrence of the id.
    */
  def delete(spark: SparkSession, root: String, ids: DataFrame,
             txn: Option[Long] = None): Long = {
    val e = currentEpoch(spark, root)
    val idx = load(spark, root, Some(e))
    val (params, segs) = loadManifest(spark, root, e)
    val merged = rawTombstones(spark, root, e)
      .map(_.unionByName(ids.select(col("vec_id"))))
      .getOrElse(ids.select(col("vec_id")))
    writeEpochTables(spark, root, e + 1, params, idx.centroids, idx.book,
      segs, txn, tombstones = Some(merged))
    e + 1
  }

  /** Segment COMPACTION — the Lucene merge step: a long-running index
    * accretes one segment per [[extend]]; this re-clusters the live
    * epoch's lists into ONE segment and publishes it as epoch+1 under
    * the same codebooks. Lossless by construction (one repartition, no
    * aggregation — spec-pinned bit-equal search); readers pinned at
    * older epochs keep their segment set, because compaction never
    * deletes anything — [[vacuum]] reclaims space separately, under an
    * explicit retention choice.
    */
  def compactSegments(spark: SparkSession, root: String,
                      txn: Option[Long] = None): Long = {
    val e = currentEpoch(spark, root)
    val idx = load(spark, root, Some(e))
    val seg = segIds(spark, root).max + 1
    writeSegment(idx.lists, root, seg)
    writeEpochTables(spark, root, e + 1, idx.params, idx.centroids,
      idx.book, Seq(seg), txn)
    e + 1
  }

  /** Epoch RETENTION: delete every published epoch older than the
    * newest `keep`, then every segment no surviving epoch references.
    * The deletion order is reader-safe: epoch markers vanish FIRST
    * (new loads can no longer pin a doomed epoch), then the epoch
    * tables, then orphaned segments — a reader that pinned a doomed
    * epoch before the vacuum may fail mid-scan, which is the
    * documented contract of every retention system (pin + finish
    * within the retention window). Returns (epochs, segments) deleted.
    */
  def vacuum(spark: SparkSession, root: String,
             keep: Int = 2): (Seq[Long], Seq[Long]) = {
    require(keep >= 1, s"vacuum: keep must be >= 1 (got $keep)")
    val (fs, p) = hadoopFs(spark, root)
    val epochs = readyEpochs(spark, root).sorted
    val doomed = epochs.dropRight(keep)
    val doomedSet = doomed.toSet
    // resolve each doomed epoch's ACTUAL marker name (it may carry a
    // __txn_<b> suffix)
    markerNames(spark, root)
      .filter(n => doomedSet.contains(
        n.stripPrefix("_ready_epoch_").split("__txn_")(0).toLong))
      .foreach(n => fs.delete(new org.apache.hadoop.fs.Path(p, n), false))
    doomed.foreach { e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/epoch=$e"), true)
    }
    val live = epochs.takeRight(keep)
      .flatMap(e => loadManifest(spark, root, e)._2).toSet
    val orphans = segIds(spark, root).filterNot(live.contains).sorted
    orphans.foreach(sg =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/seg=$sg"), true))
    (doomed, orphans)
  }

  /** Streaming index maintenance — the G14/G17 standing-artifact
    * discipline for the vector side: every micro-batch of new vectors
    * [[extend]]s the live epoch (one delta encode + one segment + one
    * epoch publish per batch; queries keep reading whatever epoch they
    * pinned). An empty batch publishes nothing.
    *
    * REPLAY-IDEMPOTENT (VERDICT r10 #3): foreachBatch is
    * at-least-once, and a naively replayed batch would re-encode the
    * same vectors into a NEW segment — duplicate vec_ids in every
    * later epoch's lists (the same vector at two ranks in top-k) plus
    * unbounded epoch growth per replay. The batch id rides the epoch
    * publish marker itself ([[markerName]]'s `__txn_<b>` suffix — ONE
    * atomic creation, no marker-vs-publish crash window), and a batch
    * whose id any marker already carries is skipped whole.
    *
    * COMPOSED MAINTENANCE (VERDICT r10 #4): a long-running stream
    * otherwise accretes one segment AND one epoch per batch forever.
    * With `compactEvery` = K > 0, a tick whose extend leaves the live
    * epoch holding ≥ K segments runs [[compactSegments]] in the same
    * tick (both publishes carry the batch's txn id, so the replay
    * guard holds wherever the tick dies); with `vacuumKeep` = N ≥ 1,
    * [[vacuum]](N) then bounds the epoch chain. Steady state: ≤ K
    * segments live, ≤ N epochs retained — the G26 maintained-store
    * loop applied to the vector index. vacuum can only delete markers
    * of epochs older than the newest N, and a replayed batch id is
    * always the most recent batch, whose txn marker rides the newest
    * epoch — so retention never forgets a replay-relevant txn.
    */
  def extendSink(vecs: DataFrame, root: String, checkpoint: String,
                 compactEvery: Int = 0, vacuumKeep: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        extendOnce(batch, root, batchId, compactEvery, vacuumKeep): Unit
      }
      .start()

  /** One [[extendSink]] tick, exposed for the replay spec and the
    * batch-driven long-chain evidence. Returns whether the tick ran
    * (false = the batch id was already committed, or the batch was
    * empty).
    */
  private[graft] def extendOnce(batch: DataFrame, root: String, batchId: Long,
                                compactEvery: Int = 0,
                                vacuumKeep: Int = 0): Boolean = {
    val spark = batch.sparkSession
    if (committedTxns(spark, root).contains(batchId)) false
    else {
      val b = batch.cache()
      val ran =
        if (b.isEmpty) false
        else {
          extend(spark, root, b, txn = Some(batchId))
          if (compactEvery > 0 &&
              loadManifest(spark, root,
                currentEpoch(spark, root))._2.size >= compactEvery)
            compactSegments(spark, root, txn = Some(batchId)): Unit
          if (vacuumKeep >= 1) vacuum(spark, root, vacuumKeep): Unit
          true
        }
      b.unpersist()
      ran
    }
  }

  private def loadManifest(spark: SparkSession, root: String,
                           epoch: Long): (Params, Seq[Long]) = {
    val m = spark.read.parquet(s"$root/epoch=$epoch/segments").collect()
    val h = m.head
    (Params(h.getAs[Int]("n_centroids"), h.getAs[Int]("n_probe"),
      h.getAs[Int]("m"), h.getAs[Int]("kc"), h.getAs[Int]("iters"),
      h.getAs[Int]("rate_bp")),
      m.map(_.getAs[Long]("seg")).toSeq.sorted)
  }

  /** Load an epoch (default: the live one). The codebook collects to
    * the driver — m·kc rows, the bounded-codebook contract — and `cn`
    * is recomputed with the same FloatDot norm the build used, so the
    * loaded centroids are bit-identical to the in-session ones.
    */
  def load(spark: SparkSession, root: String,
           epoch: Option[Long] = None): Loaded = {
    val e = epoch.getOrElse(currentEpoch(spark, root))
    require(isReady(spark, root, e), s"epoch $e is not published under $root")
    val (params, segs) = loadManifest(spark, root, e)
    val cents = spark.read.parquet(s"$root/epoch=$e/centroids")
      .withColumn("cn", sqrt(graft.functions.FloatDot.dot(col("ce"), col("ce"))))
    val bookRows = spark.read.parquet(s"$root/epoch=$e/codebook").collect()
      .map(r => ((r.getAs[Int]("s"), r.getAs[Int]("j")),
        r.getSeq[Float](r.fieldIndex("cw")).toArray)).toMap
    val m = bookRows.keys.map(_._1).max + 1
    val kc = bookRows.keys.map(_._2).max + 1
    val book = (0 until m).map(s => (0 until kc).map(j => bookRows((s, j))))
    val lists = segs.map(sg => spark.read.parquet(s"$root/seg=$sg"))
      .reduce(_ unionByName _)
    // the LIVE view: tombstoned ids vanish via one broadcast anti-join
    // (bounded by deletes-since-compaction); compactSegments therefore
    // physically purges them, because it rewrites exactly this frame
    val live = rawTombstones(spark, root, e) match {
      case Some(t) => lists.join(broadcast(t), Seq("vec_id"), "left_anti")
      case None => lists
    }
    Loaded(e, params, cents, book, live)
  }

  // ---- REBUILD CUTOVER (VERDICT r11 #3): the root-level alias.
  //
  // extend() never retrains codebooks (the FAISS rule: new codewords
  // would silently re-key every existing segment), so the prescribed
  // remedy for codebook drift is a REBUILD under a fresh root — but a
  // reader holds a root path, so without a pointer a retrain needs
  // client coordination. The alias is that pointer, one level up from
  // the epoch markers and under the same discipline:
  //
  //   <alias>/gen_<g>     the generation's index ROOT path (UTF-8),
  //                       fully written and closed FIRST
  //   <alias>/_cur_<g>    0-byte marker, created LAST (atomic name-level
  //                       creation — the generation exists only once its
  //                       marker does)
  //
  // loadCurrent follows max-published-gen → root → load(root): a reader
  // sees the old generation or the complete new one, never a partial.
  // A cutover is ONE marker creation; the old root stays untouched, so
  // every reader pinned to it (via its own epoch markers) is unaffected
  // until vacuumAlias reclaims it after a grace period.

  private def aliasGens(spark: SparkSession, alias: String): Seq[Long] = {
    val (fs, p) = hadoopFs(spark, alias)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("_cur_") => n.stripPrefix("_cur_").toLong }
      .sorted
  }

  private def genRoot(spark: SparkSession, alias: String, g: Long): String = {
    val (fs, _) = hadoopFs(spark, alias)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$alias/gen_$g"))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
      new String(bytes.toByteArray, "UTF-8").trim
    } finally in.close()
  }

  /** Publish `root` as the alias's next generation — the cutover.
    * `root` must already hold a ready epoch (cut over to a half-built
    * index and every loadCurrent dies). Returns the generation.
    */
  def cutover(spark: SparkSession, alias: String, root: String): Long = {
    require(readyEpochs(spark, root).nonEmpty,
      s"cutover: $root holds no ready epoch — build() it first")
    val (fs, p) = hadoopFs(spark, alias)
    fs.mkdirs(p)
    val g = aliasGens(spark, alias).lastOption.getOrElse(0L) + 1
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$alias/gen_$g"), false)
    try out.write(root.getBytes("UTF-8")) finally out.close()
    require(fs.createNewFile(new org.apache.hadoop.fs.Path(s"$alias/_cur_$g")),
      s"cutover: generation $g already published under $alias")
    g
  }

  /** The alias's live root — max published generation's pointer. */
  def currentRoot(spark: SparkSession, alias: String): String = {
    val gs = aliasGens(spark, alias)
    require(gs.nonEmpty, s"no published generation under $alias — cutover() first")
    genRoot(spark, alias, gs.max)
  }

  /** Load through the alias: the live generation's live epoch. The
    * returned index is pinned as ever — a cutover (or a vacuum of a
    * NEWER generation's predecessors, after grace) never mutates it.
    */
  def loadCurrent(spark: SparkSession, alias: String,
                  epoch: Option[Long] = None): Loaded =
    load(spark, currentRoot(spark, alias), epoch)

  /** Generation RETENTION: drop every published generation older than
    * the newest `keep`, deleting each doomed generation's marker first
    * (new loads can no longer follow it), then its pointer, then its
    * ROOT — the whole retired index. Run a grace period after cutover,
    * exactly [[vacuum]]'s contract one level up. A root still referenced
    * by a surviving generation is never deleted (re-cutover to the same
    * root is legal). Returns the generations dropped.
    */
  def vacuumAlias(spark: SparkSession, alias: String,
                  keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"vacuumAlias: keep must be >= 1 (got $keep)")
    val (fs, _) = hadoopFs(spark, alias)
    val gs = aliasGens(spark, alias)
    val doomed = gs.dropRight(keep)
    val liveRoots = gs.takeRight(keep).map(genRoot(spark, alias, _)).toSet
    doomed.foreach { g =>
      val root = genRoot(spark, alias, g)
      fs.delete(new org.apache.hadoop.fs.Path(s"$alias/_cur_$g"), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$alias/gen_$g"), false)
      if (!liveRoots.contains(root))
        fs.delete(new org.apache.hadoop.fs.Path(root), true): Unit
    }
    doomed
  }

  /** Search through a loaded, epoch-pinned index — the shared
    * [[Ann.ivfTopKPqOnIndex]] tail, so results are bit-equal to the
    * in-session [[Ann.ivfTopKPqTrained]] over the same corpus and
    * params by construction.
    */
  def search(queries: DataFrame, idx: Loaded, k: Int): DataFrame =
    Ann.ivfTopKPqOnIndex(queries, idx.centroids, idx.lists, k,
      idx.params.nProbe, idx.book)
}
