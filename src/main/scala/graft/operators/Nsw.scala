package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Graph-based ANN: sharded Navigable-Small-World beam search — the
  * last ANN family member beside IVF/LSH/PQ (Malkov et al. 2014 NSW;
  * HNSW 2016 adds a layer hierarchy on the same search principle).
  *
  * Spark-first layout: the corpus is hash-sharded (`vec_id % nShards`),
  * and each shard gets an INDEPENDENT small-world graph built inside
  * one `mapPartitions` task — the sanctioned per-partition imperative
  * case: graph insertion is inherently sequential within a shard, but
  * shards build in parallel and never communicate. At 100 TB you pick
  * nShards so a shard (vectors + adjacency) fits one executor's memory
  * (e.g. ~1M × 384-d ≈ 1.5 GB/shard → a few thousand shards); build
  * cost per shard is n·log n beam searches instead of the n² of a
  * brute-force kNN-graph.
  *
  * Search fans one beam per shard (each task touches O(ef·log n) nodes
  * of its local graph, not the shard), emits ≤ efSearch candidate ids
  * per shard, and the union (≤ nShards·efSearch ids — bounded, like
  * IVF's probe list) is re-ranked EXACTLY by the same codegen'd cosine
  * expression the exact-KNN path uses. That two-stage shape is what
  * makes the result hash-gateable: the candidate set is deterministic
  * (ascending-id insertion, id tie-breaks everywhere), so the DuckDB
  * oracle re-ranks the identical id list with its own cosine and must
  * agree bit-for-bit after the shared round(·,6) exit.
  *
  * Determinism contract (everything the oracle leans on):
  *   - insertion order = ascending vec_id within a shard;
  *   - entry point = smallest vec_id in the shard;
  *   - all heap orderings break distance ties by smaller id;
  *   - distances in Double with fixed left-to-right accumulation.
  *
  * Why NSW has NO transparent KNN→probe rewrite (unlike IVF/LSH,
  * plans.IvfProbeRule): those rewrites inject a probe IN-filter whose
  * probe set is computable DRIVER-SIDE from index metadata resident in
  * the rule (centroid array, hyperplanes) — an O(nlist·dim) closed-form
  * step that is legitimate inside an optimizer rule. An NSW probe set
  * IS the beam walk: deriving it requires a distributed pass over the
  * data-sized graph store, and launching a Spark job from inside
  * Catalyst optimization is both unsound (rules may re-fire, plans may
  * never execute) and unbounded-latency. Graph indexes therefore serve
  * through the explicit [[search]]/[[batchSearch]] API; the exact
  * re-rank stage still plans identically to the rewritten IVF/LSH
  * probes (pushed IN-filter + TakeOrderedAndProject).
  */
object Nsw {

  /** Build/search knobs. `m` = edges added per insertion, `maxDegree` =
    * cap after bidirectional backlinks (2m, the usual NSW setting),
    * `efConstruction`/`efSearch` = beam widths.
    */
  final case class Params(
      nShards: Int = 4,
      m: Int = 8,
      efConstruction: Int = 32,
      efSearch: Int = 32) {
    val maxDegree: Int = 2 * m
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }

  /** (distance, id) ordering with the id tiebreak — the ONE ordering
    * every heap below uses, so the search is deterministic.
    */
  private val byDistThenId: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  /** Greedy best-first beam over one shard's graph: returns the ef
    * closest visited nodes to `q`, ascending (distance, id). Classic
    * NSW search — a min-heap of frontier candidates, a bounded
    * max-heap of results; stop when the nearest frontier node is
    * farther than the worst retained result.
    */
  def beamSearch(q: Array[Float], entry: Long,
                 vecs: collection.Map[Long, Array[Float]],
                 adj: collection.Map[Long, Array[Long]],
                 ef: Int): Seq[(Double, Long)] =
    beamSearchFn(q, entry, vecs, adj.getOrElse(_, Array.empty), ef)

  /** [[beamSearch]] over a FUNCTION adjacency — the layered (HNSW)
    * variants walk one layer of a per-node layer stack through this.
    */
  private def beamSearchFn(q: Array[Float], entry: Long,
                           vecs: collection.Map[Long, Array[Float]],
                           adjFn: Long => Array[Long],
                           ef: Int): Seq[(Double, Long)] = {
    val visited = mutable.Set[Long](entry)
    val d0 = cosine(q, vecs(entry))
    val frontier = mutable.PriorityQueue((d0, entry))(byDistThenId.reverse) // min-heap
    val results = mutable.PriorityQueue((d0, entry))(byDistThenId)         // max-heap
    while (frontier.nonEmpty) {
      val (d, node) = frontier.dequeue()
      if (results.size >= ef && byDistThenId.gt((d, node), results.head)) {
        frontier.clear() // nearest frontier ≥ worst result: done
      } else {
        adjFn(node).foreach { nb =>
          if (visited.add(nb)) {
            val dn = cosine(q, vecs(nb))
            if (results.size < ef || byDistThenId.lt((dn, nb), results.head)) {
              results.enqueue((dn, nb))
              if (results.size > ef) results.dequeue()
              frontier.enqueue((dn, nb))
            }
          }
        }
      }
    }
    results.dequeueAll.reverse.toSeq
  }

  /** Diverse-neighbor selection (the HNSW select-neighbors heuristic,
    * Malkov & Yashunin 2016 Alg. 4): walking candidates in ascending
    * (distance, id), keep one only if it is closer to the BASE than to
    * every already-kept neighbor; unfilled slots backfill from the
    * pruned list in order. Plain nearest-m trimming fails on clustered
    * corpora — it severs exactly the long-range inter-cluster edges
    * that make the graph navigable, fragmenting it into cluster
    * islands (measured: mean recall@10 collapsed to 0.48 at ef=32 on
    * the mixture-of-Gaussians corpus before this heuristic; see
    * RECALL.md). Deterministic: fixed visit order, id tie-breaks.
    */
  def selectNeighbors(cands: Seq[(Double, Long)], m: Int,
                      vec: Long => Array[Float]): Array[Long] = {
    val kept = mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val pruned = mutable.ArrayBuffer.empty[Long]
    cands.sorted(byDistThenId).foreach { case (d, id) =>
      if (kept.size < m) {
        val cv = vec(id)
        if (kept.forall { case (_, kv) => cosine(cv, kv) >= d }) kept += ((id, cv))
        else pruned += id
      }
    }
    (kept.map(_._1) ++ pruned.take(m - kept.size)).toArray
  }

  /** Insert `batch` (ascending id) into an existing shard graph — the
    * ONE insertion procedure: each new node links to `m` DIVERSE nodes
    * among its efConstruction-beam nearest (the select-neighbors
    * heuristic), bidirectionally; any node exceeding maxDegree
    * re-selects maxDegree diverse edges the same way. The initial
    * build is this with an empty existing graph; incremental append is
    * this with the persisted one — same code, so append ≡ "rebuild
    * where the batch ids happen to insert last".
    */
  def insertIntoShardGraph(existing: Array[(Long, Array[Float], Array[Long])],
                           batch: Array[(Long, Array[Float])],
                           p: Params): Map[Long, Array[Long]] = {
    val vecs = mutable.Map.empty[Long, Array[Float]]
    // adjacency arrays are rebuilt on append/trim — each is ≤ maxDegree+1
    // long, so the copies are O(1); the map itself is never copied
    val adj = mutable.Map.empty[Long, Array[Long]]
    existing.foreach { case (id, v, nbrs) => vecs(id) = v; adj(id) = nbrs }
    var entry = if (existing.isEmpty) Long.MaxValue else existing.iterator.map(_._1).min
    def trim(id: Long): Unit = {
      val edges = adj(id)
      if (edges.length > p.maxDegree) {
        val base = vecs(id)
        adj(id) = selectNeighbors(
          edges.map(e => (cosine(base, vecs(e)), e)).toSeq, p.maxDegree, vecs)
      }
    }
    batch.sortBy(_._1).foreach { case (id, v) =>
      if (vecs.isEmpty) { vecs(id) = v; adj(id) = Array.empty; entry = id }
      else {
        val near = beamSearch(v, entry, vecs, adj,
          math.max(p.efConstruction, p.m))
        vecs(id) = v
        adj(id) = selectNeighbors(near, p.m, vecs)
        adj(id).foreach { nb => adj(nb) = adj(nb) :+ id; trim(nb) }
        trim(id)
        entry = math.min(entry, id)
      }
    }
    adj.toMap
  }

  /** One shard's NSW graph from scratch (the initial-build case of
    * [[insertIntoShardGraph]]).
    */
  def buildShardGraph(nodes: Array[(Long, Array[Float])],
                      p: Params): Map[Long, Array[Long]] =
    insertIntoShardGraph(Array.empty, nodes, p)

  private val graphSchema: StructType = StructType(Seq(
    StructField("shard", IntegerType),
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("neighbors", ArrayType(LongType))))

  /** Build the sharded graph store: one `mapPartitions` task per shard
    * (shards never communicate), output rows (shard, vec_id, embedding,
    * neighbors). Write this partitioned by `shard` so search's per-shard
    * tasks read exactly one directory each.
    */
  def buildGraph(corpus: DataFrame, vecCol: String, idCol: String,
                 p: Params): DataFrame = {
    val spark = corpus.sparkSession
    val sharded = corpus
      .select(pmod(col(idCol), lit(p.nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("vec_id"), col(vecCol).cast("array<float>").as("embedding"))
      .repartition(p.nShards, col("shard"))
    val out = sharded.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray())
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val nodes = grp.map(r => (r._2, r._3))
        val adj = buildShardGraph(nodes, p)
        nodes.sortBy(_._1).iterator.map { case (id, v) =>
          Row(shard, id, v.toSeq, adj.getOrElse(id, Array.empty[Long]).toSeq)
        }
      }
    }
    spark.createDataFrame(out, graphSchema)
  }

  /** Per-shard beam candidates for one query: ≤ efSearch ids per shard
    * (ascending (distance, id) within the shard). The scan is one pass
    * over the graph store; each task returns a bounded row count —
    * the same "every task returns ≤ k rows" contract as exact KNN.
    *
    * The repartition is a CORRECTNESS requirement, not a convenience: a
    * shard's rows must all reach one task (a parquet file >
    * maxPartitionBytes splits across tasks, and a beam over half a
    * shard's graph returns wrong candidates). The exchange moves the
    * graph store once per CALL — [[batchSearch]] amortizes it across a
    * whole query batch (one pass serves N queries), and a serving
    * deployment keeps the post-exchange relation cached (a resident
    * index: the shuffle is paid once per executor lifetime, exactly
    * like loading an HNSW index into RAM).
    */
  def shardCandidates(graph: DataFrame, queryVec: Array[Float],
                      p: Params): DataFrame = {
    val spark = graph.sparkSession
    val q = spark.sparkContext.broadcast(queryVec)
    val prepared = graph
      .select(col("shard"), col("vec_id"), col("embedding"), col("neighbors"))
      .repartition(p.nShards, col("shard"))
    val out = prepared.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(),
          ir.getArray(3).toLongArray())
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val vecs = grp.map(r => (r._2, r._3)).toMap
        val adj = grp.map(r => (r._2, r._4)).toMap
        val entry = grp.iterator.map(_._2).min
        beamSearch(q.value, entry, vecs, adj, p.efSearch)
          .iterator.map { case (d, id) => Row(shard, id, d) }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("shard", IntegerType),
      StructField("vec_id", LongType),
      StructField("beam_distance", DoubleType))))
  }

  /** Incremental index refresh: insert a new batch into the persisted
    * graph without rebuilding it. Per shard, the existing (vectors,
    * adjacency) load once and the shard's batch slice inserts through
    * the SAME procedure as the initial build — compute cost is
    * O(|batch|·ef·log n), not O(|corpus|). Backlinks may retouch
    * existing nodes' edge lists, so the touched SHARDS rewrite (write
    * amplification graph stores inherently pay where IVF append is
    * file-append-only, maint_ivf_append); under hash sharding every
    * shard is touched, so at 100 TB an appendy deployment shards by
    * arrival window instead ([[buildGraphWindowed]] /
    * [[appendToGraphWindowed]]) — then an append rewrites only the
    * newest window's shard and search fans over all shards exactly as
    * here.
    */
  def appendToGraph(graph: DataFrame, batch: DataFrame, vecCol: String,
                    idCol: String, p: Params): DataFrame = {
    val spark = graph.sparkSession
    val existing = graph
      .select(col("shard"), col("vec_id"), col("embedding"), col("neighbors"),
        lit(false).as("is_new"))
    val incoming = batch
      .select(pmod(col(idCol), lit(p.nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("embedding"),
        typedLit(Seq.empty[Long]).as("neighbors"), lit(true).as("is_new"))
      // idempotence: an id already in the graph must not insert twice
      // (a replayed batch would otherwise emit duplicate rows and wire
      // a node to itself through its earlier copy) — and neither must a
      // vec_id duplicated WITHIN the batch (the second insert would
      // reset the node's adjacency while backlinks from the first
      // persist in other nodes' edge lists)
      .join(graph.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .dropDuplicates("vec_id")
      .select(existing.columns.map(col): _*)
    val all = existing.union(incoming).repartition(p.nShards, col("shard"))
    val out = all.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(),
          ir.getArray(3).toLongArray(), ir.getBoolean(4))
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val (nw, ex) = grp.partition(_._5)
        val adj = insertIntoShardGraph(
          ex.map(r => (r._2, r._3, r._4)), nw.map(r => (r._2, r._3)), p)
        grp.sortBy(_._2).iterator.map { case (_, id, v, _, _) =>
          Row(shard, id, v.toSeq, adj.getOrElse(id, Array.empty[Long]).toSeq)
        }
      }
    }
    spark.createDataFrame(out, graphSchema)
  }

  /** Persist the graph store partitioned by `shard`: each search task
    * then reads exactly one shard directory (static pruning if a probe
    * policy ever restricts shards; locality either way).
    */
  def writeGraph(graph: DataFrame, path: String): Unit =
    graph.write.partitionBy("shard").mode("overwrite").parquet(path)

  // ------------------------------------------------------------------
  // Arrival-window sharding — the appendy-deployment layout
  // ------------------------------------------------------------------

  /** Arrival-window shard assignment: `shard = vec_id div windowSize`.
    * Ids are assigned in arrival order, so contiguous id ranges ARE
    * arrival windows — an append batch (all ids past the stored max)
    * lands in the newest window's shard(s) only, and
    * [[appendToGraphWindowed]] rewrites exactly those directories.
    * Hash sharding ([[buildGraph]]) spreads every batch over every
    * shard — better balanced for a static corpus, but an append
    * rewrites the whole store; this layout is the documented
    * mitigation. Search code is layout-agnostic: tasks group rows by
    * the `shard` column, so [[shardCandidates]]/[[batchShardCandidates]]
    * fan over windowed stores unchanged.
    */
  def windowShard(idCol: String, windowSize: Long): org.apache.spark.sql.Column =
    // integer `div`, not `/` (double division) — exact at any id scale.
    // NOTE: Spark `div` truncates toward zero while DuckDB `//` floors;
    // they agree ONLY for non-negative ids, which the arrival-order
    // vec_id domain guarantees (ids are assigned 0,1,2,… at ingest) —
    // a signed id domain would need the offset-shift discipline instead
    expr(s"CAST(CAST($idCol AS BIGINT) div ${windowSize}L AS INT)")

  /** Build the sharded graph store under arrival-window sharding —
    * the same independent per-shard NSW construction as [[buildGraph]],
    * with `vec_id div windowSize` in place of the hash shard. Insertion
    * order (ascending vec_id within a shard) and every other clause of
    * the determinism contract are unchanged, so a windowed append of a
    * strictly-newer batch is bit-identical to a windowed full rebuild
    * (the batch ids insert last either way — NswSpec locks this).
    */
  def buildGraphWindowed(corpus: DataFrame, vecCol: String, idCol: String,
                         windowSize: Long, p: Params): DataFrame = {
    val spark = corpus.sparkSession
    val sharded = corpus
      .select(windowShard(idCol, windowSize).as("shard"),
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("embedding"))
      .repartition(col("shard"))
    val out = sharded.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray())
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val nodes = grp.map(r => (r._2, r._3))
        val adj = buildShardGraph(nodes, p)
        nodes.sortBy(_._1).iterator.map { case (id, v) =>
          Row(shard, id, v.toSeq, adj.getOrElse(id, Array.empty[Long]).toSeq)
        }
      }
    }
    spark.createDataFrame(out, graphSchema)
  }

  /** Incremental refresh of a PERSISTED arrival-window store, rewriting
    * ONLY the shard directories the batch touches: the batch's windows
    * are computed first (a distinct over the batch — batch-sized, not
    * corpus-sized), the store is read WITH a pushed `shard IN (...)`
    * partition filter (static pruning: untouched shard directories are
    * never opened, let alone rewritten), the touched shards re-insert
    * through the ONE insertion procedure, and the refreshed partitions
    * are staged then atomically swapped in. Untouched shard dirs keep
    * their exact bytes — THE property hash sharding cannot offer
    * (every shard is touched there), and the reason an appendy
    * deployment shards by arrival window.
    *
    * Backlinks stay within a shard by construction, so pruning to the
    * touched shards loses nothing. Cost: O(touched shards), i.e.
    * O(|batch|) when the batch is one arrival window — the IVF
    * file-append cost shape, recovered for graph stores.
    */
  def appendToGraphWindowed(spark: SparkSession, storePath: String,
                            batch: DataFrame, vecCol: String, idCol: String,
                            windowSize: Long, p: Params): Unit = {
    recoverAside(spark, storePath)
    val incoming = batch
      .select(windowShard(idCol, windowSize).as("shard"),
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("embedding"))
      // batch-internal idempotence (the cross-store anti-join below only
      // covers ids ALREADY in the store): duplicate vec_ids within one
      // batch would insert twice — the second insert resets the node's
      // adjacency while backlinks from the first persist, corrupting the
      // graph invariants. Equal-id rows are replays of one logical row,
      // so keeping any single one is correct.
      .dropDuplicates("vec_id")
    val touched = incoming.select(col("shard")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val existingTouched = readGraph(spark, storePath)
      .filter(col("shard").isin(touched.map(Integer.valueOf).toSeq: _*))
      .select(col("shard"), col("vec_id"), col("embedding"), col("neighbors"),
        lit(false).as("is_new"))
    // idempotence (same clause as appendToGraph): a replayed id must not
    // insert twice — the anti-join is against the touched slice only,
    // which is sufficient because windowing sends an id to ONE shard
    val fresh = incoming
      .join(existingTouched.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("shard"), col("vec_id"), col("embedding"),
        typedLit(Seq.empty[Long]).as("neighbors"), lit(true).as("is_new"))
    val all = existingTouched.union(fresh).repartition(col("shard"))
    val out = all.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(),
          ir.getArray(3).toLongArray(), ir.getBoolean(4))
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val (nw, ex) = grp.partition(_._5)
        val adj = insertIntoShardGraph(
          ex.map(r => (r._2, r._3, r._4)), nw.map(r => (r._2, r._3)), p)
        grp.sortBy(_._2).iterator.map { case (_, id, v, _, _) =>
          Row(shard, id, v.toSeq, adj.getOrElse(id, Array.empty[Long]).toSeq)
        }
      }
    }
    val refreshed = spark.createDataFrame(out, graphSchema)
    // stage-then-swap, per TOUCHED partition only: the refresh READS the
    // directories being replaced, so they are written to a sibling dir
    // first and the shard dirs swapped after the job completes — the
    // same hazard note as NswAppendStore, scoped to touched shards
    val staging = storePath + "_windowed_staging"
    refreshed.write.partitionBy("shard").mode("overwrite").parquet(staging)
    val hconf = spark.sessionState.newHadoopConf()
    val store = new org.apache.hadoop.fs.Path(storePath)
    val staged = new org.apache.hadoop.fs.Path(staging)
    val fs = store.getFileSystem(hconf)
    // swap via rename-aside, never delete-then-rename: a crash between
    // `delete(to)` and `rename(from, to)` would leave the store missing
    // a shard with nothing reconciling it. Renaming the old dir aside
    // first keeps its bytes until the new dir is IN PLACE; the aside is
    // deleted last, and the entry-time recovery above restores it if
    // this JVM dies mid-swap.
    val asideRoot = new org.apache.hadoop.fs.Path(storePath + "_windowed_aside")
    // writer-liveness sentinel, created BEFORE the first rename: a
    // reader that lands mid-swap sees the transient empty-slot+aside
    // state, and without the fence its recovery would rename the OLD
    // shard back into the slot (failing this appender's rename-in) and
    // delete asideRoot out from under the swap — if the appender then
    // died before renaming the staged shard in, the old bytes would
    // already be gone, reopening exactly the data-loss window the aside
    // exists to close. The pid-stamped marker lets recoverAside
    // distinguish a crashed swap (owner pid dead → recover) from an
    // in-flight one (owner alive → leave the swap alone).
    val marker = swapMarker(storePath)
    val out2 = fs.create(marker, true)
    out2.write(ProcessHandle.current().pid().toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out2.close()
    fs.mkdirs(asideRoot)
    touched.foreach { sh =>
      val from = new org.apache.hadoop.fs.Path(staged, s"shard=$sh")
      val to = new org.apache.hadoop.fs.Path(store, s"shard=$sh")
      val aside = new org.apache.hadoop.fs.Path(asideRoot, s"shard=$sh")
      if (fs.exists(to))
        require(fs.rename(to, aside), s"aside rename failed for shard=$sh")
      require(fs.rename(from, to), s"swap failed for shard=$sh")
    }
    fs.delete(asideRoot, true)
    fs.delete(staged, true)
    fs.delete(marker, false)
  }

  private def swapMarker(storePath: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(storePath + "_windowed_swap_inprogress")

  /** True if the swap marker names a live process — the fence that keeps
    * a concurrent reader's recovery from destroying an in-flight swap.
    * An unreadable/garbled marker reads as "owner dead" (the crash left
    * it half-written; recovery is then the right move).
    */
  private def swapOwnerAlive(fs: org.apache.hadoop.fs.FileSystem,
                             marker: org.apache.hadoop.fs.Path): Boolean =
    try {
      val in = fs.open(marker)
      val bytes = try in.readAllBytes() finally in.close()
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8).trim
        .toLongOption.exists(p => ProcessHandle.of(p).isPresent)
    } catch { case _: java.io.IOException => false }

  /** Crash recovery from an interrupted windowed-append swap: any shard
    * dir parked in the aside root whose store slot is EMPTY is the old
    * bytes of a swap that renamed-out but never renamed-in — restore it
    * (the aside lives OUTSIDE the store path so partition discovery
    * never sees a half-swapped dir). A mixed store (some shards already
    * refreshed, some restored) is safe: the vec_id anti-join in
    * [[appendToGraphWindowed]] makes the whole append idempotent, so
    * re-running converges. Runs at BOTH entry points — append AND read:
    * without the read-side check, a readGraph between a mid-swap crash
    * and the next append would silently see fewer rows (discovery just
    * lists fewer shard dirs). One FS existence check when no aside
    * exists — negligible against the parquet footer reads.
    *
    * FENCED behind the writer-liveness sentinel: recovery only proceeds
    * when no live appender owns the swap (marker absent, or its pid is
    * dead). A reader concurrent with a LIVE appendToGraphWindowed swap
    * must not "recover" it — doing so renames old bytes back into slots
    * the appender is about to fill and deletes the aside out from under
    * it. The restore also tolerates a slot that became non-empty between
    * the existence check and the rename (two recoverers racing after a
    * genuine crash): the slot being occupied IS the recovered state.
    */
  private def recoverAside(spark: SparkSession, storePath: String): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val store = new org.apache.hadoop.fs.Path(storePath)
    val fs = store.getFileSystem(hconf)
    val asideRoot = new org.apache.hadoop.fs.Path(storePath + "_windowed_aside")
    val marker = swapMarker(storePath)
    val markerExists = fs.exists(marker)
    if (markerExists && swapOwnerAlive(fs, marker)) return // in-flight swap
    if (fs.exists(asideRoot)) {
      fs.listStatus(asideRoot).foreach { st =>
        val slot = new org.apache.hadoop.fs.Path(store, st.getPath.getName)
        if (!fs.exists(slot))
          require(fs.rename(st.getPath, slot) || fs.exists(slot),
            s"crash recovery failed restoring ${st.getPath.getName}")
      }
      fs.delete(asideRoot, true)
    }
    if (markerExists) fs.delete(marker, false)
  }

  /** Read a persisted graph store (partition column restored to int).
    * Restores any half-completed windowed-swap aside first, so a read
    * landing between a crash and the next append sees the full store.
    */
  def readGraph(spark: SparkSession, path: String): DataFrame = {
    recoverAside(spark, path)
    spark.read.parquet(path)
      .select(col("shard").cast("int").as("shard"), col("vec_id"),
        col("embedding"), col("neighbors"))
  }

  /** Multi-query beam pass: one scan of the graph store serves a WHOLE
    * query batch — each task builds its shard's (vecs, adj) maps once
    * and loops the broadcast queries over them, emitting ≤ efSearch
    * candidate rows per (shard, query). The per-batch cost is one job
    * regardless of batch size; at 100 TB this is the serving shape
    * (a job per query would pay the scan |batch| times).
    */
  def batchShardCandidates(graph: DataFrame,
                           queries: Seq[(Int, Array[Float])],
                           p: Params): DataFrame = {
    val spark = graph.sparkSession
    val qb = spark.sparkContext.broadcast(queries)
    val prepared = graph
      .select(col("shard"), col("vec_id"), col("embedding"), col("neighbors"))
      .repartition(p.nShards, col("shard"))
    val out = prepared.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(),
          ir.getArray(3).toLongArray())
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val vecs = grp.map(r => (r._2, r._3)).toMap
        val adj = grp.map(r => (r._2, r._4)).toMap
        val entry = grp.iterator.map(_._2).min
        qb.value.iterator.flatMap { case (qid, qv) =>
          beamSearch(qv, entry, vecs, adj, p.efSearch)
            .iterator.map { case (_, id) => Row(qid, shard, id) }
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("query_id", IntegerType),
      StructField("shard", IntegerType),
      StructField("vec_id", LongType))))
  }

  /** Batch search: beam candidates for every query in ONE graph-store
    * pass, then per-query exact top-k over the candidate union — the
    * candidate relation (≤ |batch|·nShards·efSearch rows) broadcasts
    * onto the corpus scan, queries broadcast beside it, and one
    * query-keyed rank shuffle of candidate-sized data finishes. Returns
    * the ranked result plus the per-query candidate ids (for the
    * late-bound oracle, which re-ranks exactly these).
    */
  def batchSearch(graph: DataFrame, corpus: DataFrame, vecCol: String,
                  idCol: String, queries: Seq[(Int, Array[Float])], k: Int,
                  p: Params, metric: Knn.Metric = Knn.Cosine)
      : (DataFrame, Map[Int, Seq[Long]]) = {
    val byQ = batchShardCandidates(graph, queries, p)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq.sorted }
    (exactBatchRerank(corpus, vecCol, idCol, queries, k, metric, byQ), byQ)
  }

  /** The exact second stage shared by [[batchSearch]] and
    * [[routedBatchSearch]]: per-query exact top-k over the recorded
    * candidate sets — candidates and queries broadcast onto ONE corpus
    * scan, one query-keyed rank shuffle of candidate-sized data.
    */
  private def exactBatchRerank(corpus: DataFrame, vecCol: String,
                               idCol: String, queries: Seq[(Int, Array[Float])],
                               k: Int, metric: Knn.Metric,
                               byQ: Map[Int, Seq[Long]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val candDf = byQ.toSeq.flatMap { case (q, ids) => ids.map(q -> _) }
      .toDF("query_id", idCol)
    val qDf = queries.map { case (i, v) => (i, v.toSeq) }
      .toDF("query_id", "graft_query_vec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("distance_score").asc, col(idCol).asc)
    corpus
      .join(broadcast(candDf), idCol)
      .join(broadcast(qDf), "query_id")
      .withColumn("distance_score", metric(col(vecCol), col("graft_query_vec")))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  /** Routed multi-query beam pass — [[batchShardCandidates]] with the
    * shard ROUTER applied per query (the r17 batch-serving scale gap:
    * the single-query router existed but batch serving still beamed
    * EVERY shard for every query). Each query routes driver-side to
    * its nprobe centroid-nearest shards, the graph scan prunes to the
    * UNION of routed shards (a pushed partition filter — shards no
    * query in the batch routed to are never opened), and within a
    * shard's task only the queries routed THERE beam. Per-query cost
    * is ≤ min(nShards, nprobe)·efSearch candidates — the single-query
    * router's constant-in-corpus bound, now batch-wide.
    */
  def routedBatchShardCandidates(graph: DataFrame,
                                 queries: Seq[(Int, Array[Float])],
                                 centroids: Array[(Int, Array[Double])],
                                 nprobe: Int, p: Params)
      : (DataFrame, Map[Int, Seq[Int]]) = {
    val routes = queries.map { case (qid, qv) =>
      qid -> routeShards(centroids, qv, nprobe)
    }.toMap
    val unionShards = routes.values.flatten.toSet.toSeq.sorted
    val spark = graph.sparkSession
    val qb = spark.sparkContext.broadcast(queries)
    val rb = spark.sparkContext.broadcast(
      routes.map { case (q, shs) => (q, shs.toSet) })
    val prepared = graph
      .filter(col("shard").isin(unionShards.map(Integer.valueOf): _*))
      .select(col("shard"), col("vec_id"), col("embedding"), col("neighbors"))
      .repartition(p.nShards, col("shard"))
    val out = prepared.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(),
          ir.getArray(3).toLongArray())
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val vecs = grp.map(r => (r._2, r._3)).toMap
        val adj = grp.map(r => (r._2, r._4)).toMap
        val entry = grp.iterator.map(_._2).min
        qb.value.iterator
          .filter { case (qid, _) => rb.value(qid).contains(shard) }
          .flatMap { case (qid, qv) =>
            beamSearch(qv, entry, vecs, adj, p.efSearch)
              .iterator.map { case (_, id) => Row(qid, shard, id) }
          }
      }
    }
    (spark.createDataFrame(out, StructType(Seq(
      StructField("query_id", IntegerType),
      StructField("shard", IntegerType),
      StructField("vec_id", LongType)))), routes)
  }

  /** Routed batch search: [[batchSearch]]'s exact second stage over
    * [[routedBatchShardCandidates]]' per-query candidate sets. Returns
    * (ranked result, per-query candidate ids, per-query routed shards)
    * — the candidate map feeds the recorded-candidate late oracle, the
    * route map rides gated output.
    */
  def routedBatchSearch(graph: DataFrame, corpus: DataFrame, vecCol: String,
                        idCol: String, queries: Seq[(Int, Array[Float])],
                        k: Int, centroids: Array[(Int, Array[Double])],
                        nprobe: Int, p: Params,
                        metric: Knn.Metric = Knn.Cosine)
      : (DataFrame, Map[Int, Seq[Long]], Map[Int, Seq[Int]]) = {
    val (candDf, routes) =
      routedBatchShardCandidates(graph, queries, centroids, nprobe, p)
    val byQ = candDf
      .select("query_id", "vec_id").collect()
      .groupBy(_.getInt(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq.sorted }
    (exactBatchRerank(corpus, vecCol, idCol, queries, k, metric, byQ),
      byQ, routes)
  }

  /** End-to-end search: beam per shard → bounded candidate id list
    * (≤ nShards·efSearch, collected like IVF's probe list) → EXACT
    * top-k over the candidates via the same codegen'd expression and
    * TakeOrderedAndProject as exact KNN, with the `vec_id IN (...)`
    * filter pushed into the corpus scan. Returns (result, candidates)
    * so callers (the late oracle, recall telemetry) see the id set.
    */
  def search(graph: DataFrame, corpus: DataFrame, vecCol: String,
             idCol: String, queryVec: Array[Float], k: Int,
             p: Params, metric: Knn.Metric = Knn.Cosine): (DataFrame, Seq[Long]) = {
    val cands = shardCandidates(graph, queryVec, p)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val result = Knn.search(
      corpus.filter(col(idCol).isin(cands: _*)),
      vecCol, idCol, queryVec, k, metric)
    (result, cands)
  }

  // ------------------------------------------------------------------
  // HNSW — log-layered entry-point descent over the same shards
  // ------------------------------------------------------------------

  /** Deterministic HNSW level draw (Malkov & Yashunin 2016 Alg. 1's
    * `floor(-ln(U)·mL)`, mL = 1/ln(m) so P(level ≥ l) = m^(-l)) — with
    * U derived from the portable 48-bit md5 hash of the vec_id instead
    * of RNG state: a node's level is a pure function of its id, so an
    * append assigns the SAME level a full rebuild would (the append ≡
    * rebuild contract the flat NSW store already has), and two builds
    * of one corpus are byte-identical. StrictMath.log, not Math.log:
    * levels must not depend on the host's libm. The level only shapes
    * the graph — gated arithmetic stays in the exact re-rank stage.
    */
  def hnswLevel(id: Long, m: Int, maxLevel: Int): Int = {
    val u = (graft.functions.Md5.long48(s"hnsw:$id") + 1).toDouble / (1L << 48).toDouble
    val mL = 1.0 / StrictMath.log(m.toDouble)
    math.min(maxLevel, (-StrictMath.log(u) * mL).toInt)
  }

  /** Layer cap: with P(level ≥ l) = m^(-l), level 8 at m = 8 is one
    * node in 8^8 ≈ 16M — deeper layers would be empty at any shard
    * size an executor can hold.
    */
  val HnswMaxLevel = 8

  /** Insert `batch` (ascending id) into an existing per-shard HNSW —
    * the layered twin of [[insertIntoShardGraph]] and the SAME
    * determinism contract: ascending-id insertion, id tie-breaks in
    * every heap, diverse-neighbor selection at every layer. Entry
    * point = the highest-level node (ties → smallest id, and a new
    * node replaces the entry only when STRICTLY higher — insertion
    * order never flips it on ties). Each node carries one adjacency
    * array per layer 0..level(id); upper layers cap at m edges,
    * layer 0 at the flat store's 2m (the M/M_max0 convention).
    * Descent: greedy ef=1 from the entry's top layer down to
    * level+1, then an efConstruction beam + select at each layer
    * level..0 — the log-layered entry that replaces the flat store's
    * smallest-id entry point, and the payoff at large shard sizes
    * (the beam no longer walks in from an arbitrary corner of the
    * shard).
    */
  def insertIntoShardHnsw(existing: Array[(Long, Array[Float], Array[Array[Long]])],
                          batch: Array[(Long, Array[Float])],
                          p: Params): Map[Long, Array[Array[Long]]] = {
    val vecs = mutable.Map.empty[Long, Array[Float]]
    val layers = mutable.Map.empty[Long, Array[Array[Long]]]
    existing.foreach { case (id, v, ls) => vecs(id) = v; layers(id) = ls }
    def levelOf(id: Long): Int = layers(id).length - 1
    var entry: Long = -1L
    layers.keysIterator.foreach { id =>
      if (entry == -1L || levelOf(id) > levelOf(entry) ||
        (levelOf(id) == levelOf(entry) && id < entry)) entry = id
    }
    def adjAt(l: Int)(id: Long): Array[Long] = {
      val ls = layers(id); if (l < ls.length) ls(l) else Array.empty
    }
    def greedyAt(l: Int, q: Array[Float], start: Long): Long = {
      var cur = start
      var curD = cosine(q, vecs(cur))
      var improved = true
      while (improved) {
        improved = false
        adjAt(l)(cur).foreach { nb =>
          val dn = cosine(q, vecs(nb))
          if (byDistThenId.lt((dn, nb), (curD, cur))) {
            cur = nb; curD = dn; improved = true
          }
        }
      }
      cur
    }
    def maxDegreeAt(l: Int): Int = if (l == 0) p.maxDegree else p.m
    def trim(l: Int, id: Long): Unit = {
      val edges = layers(id)(l)
      if (edges.length > maxDegreeAt(l)) {
        val base = vecs(id)
        layers(id)(l) = selectNeighbors(
          edges.map(e => (cosine(base, vecs(e)), e)).toSeq, maxDegreeAt(l), vecs)
      }
    }
    batch.sortBy(_._1).foreach { case (id, v) =>
      val lvl = hnswLevel(id, p.m, HnswMaxLevel)
      vecs(id) = v
      layers(id) = Array.fill(lvl + 1)(Array.empty[Long])
      if (entry == -1L) entry = id
      else {
        val entryLvl = levelOf(entry)
        var cur = entry
        var l = entryLvl
        while (l > lvl) { cur = greedyAt(l, v, cur); l -= 1 }
        l = math.min(lvl, entryLvl)
        while (l >= 0) {
          val near = beamSearchFn(v, cur, vecs, adjAt(l),
            math.max(p.efConstruction, p.m))
          layers(id)(l) = selectNeighbors(near, p.m, vecs)
          layers(id)(l).foreach { nb =>
            layers(nb)(l) = layers(nb)(l) :+ id
            trim(l, nb)
          }
          trim(l, id)
          cur = near.head._2
          l -= 1
        }
        if (lvl > entryLvl) entry = id
      }
    }
    layers.toMap
  }

  /** One shard's HNSW from scratch. */
  def buildShardHnsw(nodes: Array[(Long, Array[Float])],
                     p: Params): Map[Long, Array[Array[Long]]] =
    insertIntoShardHnsw(Array.empty, nodes, p)

  private val hnswSchema: StructType = StructType(Seq(
    StructField("shard", IntegerType),
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("level", IntegerType),
    StructField("layers", ArrayType(ArrayType(LongType)))))

  /** Build the sharded HNSW store — same hash sharding, one
    * `mapPartitions` task per shard, rows carry the per-layer
    * adjacency stack (`layers(l)` = neighbors at layer l).
    */
  def buildHnswGraph(corpus: DataFrame, vecCol: String, idCol: String,
                     p: Params): DataFrame = {
    val spark = corpus.sparkSession
    val sharded = corpus
      .select(pmod(col(idCol), lit(p.nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("embedding"))
      .repartition(p.nShards, col("shard"))
    val out = sharded.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray())
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val nodes = grp.map(r => (r._2, r._3))
        val layers = buildShardHnsw(nodes, p)
        nodes.sortBy(_._1).iterator.map { case (id, v) =>
          val ls = layers(id)
          Row(shard, id, v.toSeq, ls.length - 1, ls.map(_.toSeq).toSeq)
        }
      }
    }
    spark.createDataFrame(out, hnswSchema)
  }

  def writeHnswGraph(graph: DataFrame, path: String): Unit =
    graph.write.partitionBy("shard").mode("overwrite").parquet(path)

  def readHnswGraph(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("shard").cast("int").as("shard"), col("vec_id"),
        col("embedding"), col("level"), col("layers"))

  /** Incremental HNSW refresh — the layered twin of [[appendToGraph]]:
    * per shard, the existing (vectors, layer stacks) load once and the
    * batch inserts through the SAME procedure as the initial build.
    * Because levels are a pure function of the id ([[hnswLevel]]) and
    * insertion order is ascending id, a batch of strictly-newer ids
    * replays exactly the tail of a full rebuild — append ≡ rebuild,
    * byte for byte (NswSpec locks this), the strongest form of the
    * flat store's append contract. Backlinks retouch existing nodes,
    * so touched shards rewrite (the graph-store write amplification;
    * arrival-window sharding bounds it, as for the flat store).
    */
  def appendToHnswGraph(graph: DataFrame, batch: DataFrame, vecCol: String,
                        idCol: String, p: Params): DataFrame = {
    val spark = graph.sparkSession
    val existing = graph
      .select(col("shard"), col("vec_id"), col("embedding"), col("level"),
        col("layers"), lit(false).as("is_new"))
    val incoming = batch
      .select(pmod(col(idCol), lit(p.nShards)).cast("int").as("shard"),
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<float>").as("embedding"),
        lit(0).as("level"),
        typedLit(Seq.empty[Seq[Long]]).as("layers"), lit(true).as("is_new"))
      // idempotence: a replayed id must not insert twice — the anti-join
      // covers ids already in the graph; dropDuplicates covers a vec_id
      // duplicated WITHIN the batch (the second insertIntoShardHnsw
      // insert would reset layers(id) while backlinks from the first
      // persist in other nodes' adjacency, silently breaking the
      // advertised append ≡ rebuild byte-for-byte contract)
      .join(graph.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .dropDuplicates("vec_id")
      .select(existing.columns.map(col): _*)
    val all = existing.union(incoming).repartition(p.nShards, col("shard"))
    val out = all.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        val layersData = ir.getArray(4)
        val ls = Array.tabulate(layersData.numElements()) { i =>
          layersData.getArray(i).toLongArray()
        }
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(), ls,
          ir.getBoolean(5))
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val (nw, ex) = grp.partition(_._5)
        val layers = insertIntoShardHnsw(
          ex.map(r => (r._2, r._3, r._4)), nw.map(r => (r._2, r._3)), p)
        grp.sortBy(_._2).iterator.map { case (_, id, v, _, _) =>
          val ls = layers(id)
          Row(shard, id, v.toSeq, ls.length - 1, ls.map(_.toSeq).toSeq)
        }
      }
    }
    spark.createDataFrame(out, hnswSchema)
  }

  /** Per-shard HNSW candidates: greedy layer descent from the shard's
    * top-level entry (ties → smallest id, matching the build), then
    * one efSearch beam at layer 0 — ≤ efSearch ids per shard, the
    * same bounded-candidate contract as [[shardCandidates]].
    */
  def hnswShardCandidates(graph: DataFrame, queryVec: Array[Float],
                          p: Params): DataFrame = {
    val spark = graph.sparkSession
    val q = spark.sparkContext.broadcast(queryVec)
    val prepared = graph
      .select(col("shard"), col("vec_id"), col("embedding"), col("level"),
        col("layers"))
      .repartition(p.nShards, col("shard"))
    val out = prepared.queryExecution.toRdd.mapPartitions { it =>
      val rows = it.map { ir =>
        val layersData = ir.getArray(4)
        val ls = Array.tabulate(layersData.numElements()) { i =>
          layersData.getArray(i).toLongArray()
        }
        (ir.getInt(0), ir.getLong(1), ir.getArray(2).toFloatArray(),
          ir.getInt(3), ls)
      }.toArray
      rows.groupBy(_._1).iterator.flatMap { case (shard, grp) =>
        val vecs = grp.map(r => (r._2, r._3)).toMap
        val layers = grp.map(r => (r._2, r._5)).toMap
        def adjAt(l: Int)(id: Long): Array[Long] = {
          val ls = layers(id); if (l < ls.length) ls(l) else Array.empty
        }
        var entry = grp.head._2
        grp.foreach { r =>
          val better = r._4 > layers(entry).length - 1 ||
            (r._4 == layers(entry).length - 1 && r._2 < entry)
          if (better) entry = r._2
        }
        var cur = entry
        var curD = cosine(q.value, vecs(cur))
        var l = layers(entry).length - 1
        while (l > 0) {
          var improved = true
          while (improved) {
            improved = false
            adjAt(l)(cur).foreach { nb =>
              val dn = cosine(q.value, vecs(nb))
              if (byDistThenId.lt((dn, nb), (curD, cur))) {
                cur = nb; curD = dn; improved = true
              }
            }
          }
          l -= 1
        }
        beamSearchFn(q.value, cur, vecs, adjAt(0), p.efSearch)
          .iterator.map { case (d, id) => Row(shard, id, d) }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("shard", IntegerType),
      StructField("vec_id", LongType),
      StructField("beam_distance", DoubleType))))
  }

  /** End-to-end HNSW search: layered beam per shard → bounded
    * candidate list → EXACT top-k re-rank, identical second stage to
    * [[search]] (and the identical recorded-candidate-set late-oracle
    * contract).
    */
  def hnswSearch(graph: DataFrame, corpus: DataFrame, vecCol: String,
                 idCol: String, queryVec: Array[Float], k: Int,
                 p: Params, metric: Knn.Metric = Knn.Cosine): (DataFrame, Seq[Long]) = {
    val cands = hnswShardCandidates(graph, queryVec, p)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val result = Knn.search(
      corpus.filter(col(idCol).isin(cands: _*)),
      vecCol, idCol, queryVec, k, metric)
    (result, cands)
  }

  /** Hybrid predicate + HNSW search: the beams run unchanged (the graph
    * is predicate-agnostic — dropping nodes DURING traversal would
    * disconnect the small-world routing), and the predicate applies in
    * the exact re-rank stage, composing with the candidate IN-filter on
    * one corpus scan (both push to the parquet scan). Only
    * predicate-survivors can place, so the efSearch beam is the
    * oversampling budget: a deployment sizes efSearch ∝ 1/selectivity
    * (the standard filtered-ANN contract — same trade as IVF's
    * knn_filtered_ivf_rewrite, where probes oversample instead).
    */
  def hnswFilteredSearch(graph: DataFrame, corpus: DataFrame,
                         predicate: org.apache.spark.sql.Column,
                         vecCol: String, idCol: String,
                         queryVec: Array[Float], k: Int, p: Params,
                         metric: Knn.Metric = Knn.Cosine): (DataFrame, Seq[Long]) = {
    val cands = hnswShardCandidates(graph, queryVec, p)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val result = Knn.search(
      corpus.filter(predicate && col(idCol).isin(cands: _*)),
      vecCol, idCol, queryVec, k, metric)
    (result, cands)
  }

  // ------------------------------------------------------------------
  // Shard routing — graph-ANN query cost independent of corpus size
  // ------------------------------------------------------------------
  //
  // The full-fan searches above launch one beam per shard, and nShards
  // must grow with the corpus (a shard's graph has to fit one executor),
  // so per-query work is LINEAR in corpus size where monolithic HNSW is
  // logarithmic — the documented trade of the sharded layout. The
  // router closes it: each shard keeps one centroid (a bounded
  // build-time aggregate, the IvfCatalog-stats pattern), a query beams
  // only its nprobe nearest shards, and per-query cost becomes
  // O(nShards·dim) driver-side routing + O(nprobe·ef·log shardSize)
  // beams — constant in corpus size once nprobe is fixed, exactly how
  // IVF keeps probe cost flat while nlist grows. Recall now depends on
  // the router sending the query to the right shards: under HASH
  // sharding every shard sees the same distribution (centroids nearly
  // coincide — routing is a coin flip and recall degrades ∝
  // nprobe/nShards), so a routed deployment shards by a locality-
  // bearing key (arrival window when drift gives windows structure, or
  // a coarse k-means assignment — the IVF-of-graphs layout). The
  // recall/fan-out trade is measured in RECALL.md.

  /** Per-shard centroids of a graph store: ONE bounded aggregate —
    * nShards·dim rows collected, the same "driver holds index metadata,
    * never data" contract as IVF's centroid array. Element sums
    * accumulate in exact DECIMAL so the centroid is a pure function of
    * the shard's vector SET (shuffle-order-independent) and routing is
    * reproducible across runs. Works for flat-NSW and HNSW stores alike
    * (both carry (shard, embedding)).
    */
  def shardCentroids(graph: DataFrame): Array[(Int, Array[Double])] = {
    val rows = graph
      .select(col("shard"), posexplode(col("embedding")))
      .groupBy(col("shard"), col("pos"))
      .agg(sum(col("col").cast("decimal(28,10)")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    rows.groupBy(_.getInt(0)).toArray.sortBy(_._1).map { case (sh, rs) =>
      val arr = new Array[Double](rs.map(_.getInt(1)).max + 1)
      rs.foreach { r =>
        arr(r.getInt(1)) = r.getDecimal(2).doubleValue() / r.getLong(3)
      }
      (sh, arr)
    }
  }

  private def cosineDbl(a: Array[Float], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }

  /** The nprobe shards whose centroids are cosine-nearest the query
    * (ties → smaller shard id), ascending shard id — an O(nShards·dim)
    * driver-side closed form, the graph twin of `Ann.probeIds`.
    */
  def routeShards(centroids: Array[(Int, Array[Double])],
                  queryVec: Array[Float], nprobe: Int): Seq[Int] =
    centroids.map { case (sh, c) => (cosineDbl(queryVec, c), sh) }
      .sortBy(t => (t._1, t._2)).take(nprobe).map(_._2).sorted

  /** Routed HNSW search: route to the nprobe centroid-nearest shards,
    * beam ONLY those (the shard filter is a pushed partition filter on
    * the shard-partitioned store — unrouted shard directories are never
    * opened), then the identical exact re-rank + recorded-candidate-set
    * contract as [[hnswSearch]]. Returns (result, candidates, routed
    * shards). Candidates are by construction the full fan's candidates
    * restricted to the routed shards (per-shard beams are independent).
    */
  def hnswRoutedSearch(graph: DataFrame, corpus: DataFrame, vecCol: String,
                       idCol: String, queryVec: Array[Float], k: Int,
                       centroids: Array[(Int, Array[Double])], nprobe: Int,
                       p: Params, metric: Knn.Metric = Knn.Cosine)
      : (DataFrame, Seq[Long], Seq[Int]) = {
    val routed = routeShards(centroids, queryVec, nprobe)
    val pruned = graph.filter(col("shard")
      .isin(routed.map(Integer.valueOf): _*))
    val cands = hnswShardCandidates(pruned, queryVec, p)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val result = Knn.search(
      corpus.filter(col(idCol).isin(cands: _*)),
      vecCol, idCol, queryVec, k, metric)
    (result, cands, routed)
  }

  /** Routed flat-NSW search — the same router over [[shardCandidates]]'
    * store shape (the two stores share (shard, embedding), so one
    * centroid relation serves both).
    */
  def routedSearch(graph: DataFrame, corpus: DataFrame, vecCol: String,
                   idCol: String, queryVec: Array[Float], k: Int,
                   centroids: Array[(Int, Array[Double])], nprobe: Int,
                   p: Params, metric: Knn.Metric = Knn.Cosine)
      : (DataFrame, Seq[Long], Seq[Int]) = {
    val routed = routeShards(centroids, queryVec, nprobe)
    val pruned = graph.filter(col("shard")
      .isin(routed.map(Integer.valueOf): _*))
    val cands = shardCandidates(pruned, queryVec, p)
      .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
    val result = Knn.search(
      corpus.filter(col(idCol).isin(cands: _*)),
      vecCol, idCol, queryVec, k, metric)
    (result, cands, routed)
  }
}
