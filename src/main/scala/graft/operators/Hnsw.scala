package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbor — HNSW (Malkov & Yashunin,
  * "Efficient and robust approximate nearest neighbor search using
  * Hierarchical Navigable Small World graphs", TPAMI 2018) — north-star
  * extension alongside [[Similarity.lshTopK]] (hash-based) and
  * [[Similarity.ivfTopK]] (partition-based).
  *
  * Distribution model: the corpus is hash-sharded; each shard builds an
  * independent in-memory HNSW graph inside `mapPartitions` (no shuffle —
  * graph build is the classic single-node algorithm over the shard's
  * vectors), every broadcast query searches every shard's graph, and a
  * global window keeps the overall top-k. This is the standard sharded
  * deployment of graph ANN (one Faiss/HNSW index per shard, scatter the
  * query, gather-merge): per-shard memory is bounded by shard size, build
  * parallelism = shard count, and query fan-out is shards × efSearch.
  * Search quality per shard is unaffected by sharding — each graph is
  * exact HNSW over its subset, and the union of per-shard top-k (each
  * shard returns a full k) always CONTAINS the true approximate answer a
  * single graph of the union would refine from.
  *
  * Divergences from the paper, chosen for determinism and compactness:
  * level assignment uses a seeded splitmix64 stream keyed by insertion
  * order (deterministic across runs — the paper leaves the RNG free),
  * and neighbor selection is closest-M (the paper's Algorithm 3 "simple"
  * variant, not the Algorithm 4 diversity heuristic; recall on the gate
  * corpus is measured by HnswSpec, not assumed).
  *
  * Distances are cosine over unit vectors (negated dot product
  * internally, smaller = closer), matching the rest of the similarity
  * family.
  */
object Hnsw {

  /** Single-shard HNSW graph over unit vectors. Insertion-order node ids;
    * deterministic given (vectors, M, efConstruction, seed). */
  @SerialVersionUID(1L) // saved indexes must survive recompiles — see HnswIndex.save
  final class Graph(dim: Int, m: Int, efConstruction: Int, seed: Long) extends Serializable {
    private val levelMult = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    // neighbors(node)(level) = growable int array of neighbor node ids
    private val neighbors =
      scala.collection.mutable.ArrayBuffer.empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1
    private var entryLevel: Int = -1

    def size: Int = vecs.length

    private def mix(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    private def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      -s // unit vectors: maximize dot == minimize negated dot
    }

    /** Greedy single-step descent used on levels above the target. */
    private def greedy(q: Array[Double], start: Int, level: Int): Int = {
      var cur = start
      var curD = dist(q, vecs(cur))
      var improved = true
      while (improved) {
        improved = false
        val ns = neighbors(cur)(level)
        var i = 0
        while (i < ns.length) {
          val d = dist(q, vecs(ns(i)))
          if (d < curD) { curD = d; cur = ns(i); improved = true }
          i += 1
        }
      }
      cur
    }

    /** Primitive binary heap over parallel (dist, node) arrays — the
      * search hot path must not box (a tuple PriorityQueue version of
      * this measured 5× the CPU from allocation alone). `sign` +1 =
      * min-heap, −1 = max-heap. */
    private final class Heap(cap0: Int, sign: Int) {
      var d = new Array[Double](math.max(cap0, 8))
      var n = new Array[Int](d.length)
      var size = 0
      def top: Double = d(0)
      def topNode: Int = n(0)
      def add(dd: Double, nn: Int): Unit = {
        if (size == d.length) {
          d = java.util.Arrays.copyOf(d, size * 2); n = java.util.Arrays.copyOf(n, size * 2)
        }
        var i = size; d(i) = dd; n(i) = nn; size += 1
        while (i > 0 && sign * d((i - 1) / 2) > sign * d(i)) {
          val p = (i - 1) / 2
          val td = d(p); d(p) = d(i); d(i) = td
          val tn = n(p); n(p) = n(i); n(i) = tn
          i = p
        }
      }
      def poll(): Unit = {
        size -= 1; d(0) = d(size); n(0) = n(size)
        var i = 0
        while (true) {
          val l = 2 * i + 1; val r = l + 1
          var b = i
          if (l < size && sign * d(l) < sign * d(b)) b = l
          if (r < size && sign * d(r) < sign * d(b)) b = r
          if (b == i) return
          val td = d(b); d(b) = d(i); d(i) = td
          val tn = n(b); n(b) = n(i); n(i) = tn
          i = b
        }
      }
    }

    /** Beam search at one level: returns up to `ef` (dist, node) pairs,
      * closest first. */
    private def searchLayer(q: Array[Double], start: Int, level: Int, ef: Int)
        : (Array[Double], Array[Int]) = {
      val visited = new java.util.BitSet(vecs.length)
      val cand = new Heap(ef + 1, +1) // min-heap by distance
      val res = new Heap(ef + 1, -1)  // max-heap: worst kept on top
      val d0 = dist(q, vecs(start))
      cand.add(d0, start); res.add(d0, start); visited.set(start)
      while (cand.size > 0) {
        val cd = cand.top; val c = cand.topNode
        cand.poll()
        if (cd > res.top && res.size >= ef) {
          cand.size = 0 // every remaining candidate is farther — done
        } else {
          val ns = neighbors(c)(level)
          var i = 0
          while (i < ns.length) {
            val nn = ns(i)
            if (!visited.get(nn)) {
              visited.set(nn)
              val d = dist(q, vecs(nn))
              if (res.size < ef || d < res.top) {
                cand.add(d, nn); res.add(d, nn)
                if (res.size > ef) res.poll()
              }
            }
            i += 1
          }
        }
      }
      // drain the max-heap into closest-first arrays
      val k = res.size
      val od = new Array[Double](k); val on = new Array[Int](k)
      var i = k - 1
      while (i >= 0) { od(i) = res.top; on(i) = res.topNode; res.poll(); i -= 1 }
      (od, on)
    }

    def insert(v: Array[Double]): Unit = {
      val node = vecs.length
      vecs += v
      val level = {
        // u in (0,1] from the deterministic stream; floor(-ln(u)·mult)
        val u = ((mix(seed + node) >>> 11).toDouble + 1.0) / (1L << 53).toDouble
        math.min(math.floor(-math.log(u) * levelMult).toInt, 31)
      }
      neighbors += Array.fill(level + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = node; entryLevel = level; return }

      var cur = entry
      var l = entryLevel
      while (l > level) { cur = greedy(v, cur, l); l -= 1 }
      l = math.min(level, entryLevel)
      while (l >= 0) {
        val (_, foundNodes) = searchLayer(v, cur, l, efConstruction)
        val cap = if (l == 0) maxM0 else m
        var s = 0
        while (s < foundNodes.length && s < m) {
          val nbr = foundNodes(s)
          neighbors(node)(l) += nbr
          val back = neighbors(nbr)(l)
          back += node
          if (back.length > cap) {
            // prune the now-overfull neighbor list back to its cap,
            // keeping the closest (closest-M selection, deterministic
            // tie-break by node id)
            val pruned = back.toArray
              .map(x => (dist(vecs(nbr), vecs(x)), x))
              .sortBy(t => (t._1, t._2)).take(cap).map(_._2)
            back.clear(); back ++= pruned
          }
          s += 1
        }
        if (foundNodes.nonEmpty) cur = foundNodes(0)
        l -= 1
      }
      if (level > entryLevel) { entry = node; entryLevel = level }
    }

    /** Top-k (node, cosine) for a unit query vector, closest first. */
    def search(q: Array[Double], k: Int, efSearch: Int): Array[(Int, Double)] = {
      if (entry < 0) return Array.empty
      var cur = entry
      var l = entryLevel
      while (l > 0) { cur = greedy(q, cur, l); l -= 1 }
      val (ds, ns) = searchLayer(q, cur, 0, math.max(efSearch, k))
      Array.tabulate(math.min(k, ns.length))(i => (ns(i), -ds(i)))
    }
  }

  /** Persisted sharded-HNSW index — the build-once / serve-many shape
    * (the [[Similarity.IvfIndex]] analog for graph ANN): one row per
    * shard carrying the shard id, the java-serialized [[Graph]] and the
    * node→id map. Query cost per batch is shards × (descend + beam)
    * with NO graph rebuild; `save`/`load` round-trip the shard frame +
    * a one-row meta through parquet (graph blobs are a binary column —
    * a 5k-vector/64-dim shard is a few MB). The build geometry
    * (numShards, m, efConstruction, seed) rides in the index so
    * [[append]] can route an increment to the SAME shard a rebuild
    * would and grow previously-empty shards with consistent graphs. */
  final case class HnswIndex private[operators] (shards: DataFrame,
      numShards: Int, m: Int, efConstruction: Int, seed: Long) {

    /** Same output contract as [[Hnsw.topK]]. */
    def topK(queries: DataFrame, vecCol: String, idCol: String, k: Int,
        efSearch: Int = 64): DataFrame =
      searchShards(shards, collectQueries(queries, vecCol, idCol), k, efSearch)

    /** Insert an increment into the sharded graphs — the growing-corpus
      * path the other indexes (Bm25/Ivf/Lsh) already have, adapted to
      * graph-ANN's approximate semantics: new vectors route to shards
      * by the SAME partition function the build used
      * (`pmod(murmur3_hash(id), numShards)` ≡ `repartition(n, id)` —
      * per-shard id membership after append is EXACTLY what a rebuild
      * over the union would produce, spec-pinned), and each shard's
      * graph takes the new vectors through the normal insert path
      * (deterministic: increment sorted by id, level stream keyed by
      * insertion index). The per-shard graph is still exact HNSW over
      * the shard's full vector set, so the scatter-gather merge
      * contract is unchanged; the graph EDGES differ from a rebuild's
      * (insertion order differs — that is the approximate part), with
      * recall on the union spec-pinned to the gate band. */
    def append(increment: DataFrame, vecCol: String, idCol: String): HnswIndex = {
      val spark = shards.sparkSession
      import spark.implicits._
      val inc = Similarity.withUnitVec(increment, vecCol, "__cv")
        .select(col(idCol).as("id"), col("__cv").as("v"),
          pmod(hash(col(idCol)), lit(numShards)).cast("int").as("shard"))
        .as[(Long, Seq[Double], Int)]
      val (mm, efC, sd) = (m, efConstruction, seed)
      val updated = shards
        .select(col("shard").cast("int"), col("graph"), col("ids"))
        .as[(Int, Array[Byte], Seq[Long])].groupByKey(_._1)
        .cogroup(inc.groupByKey(_._3)) { (shard, oldIt, newIt) =>
          val olds = oldIt.toArray
          val news = newIt.toArray.sortBy(_._1)
          if (news.isEmpty) {
            olds.iterator.map { case (_, blob, ids) => (shard, blob, ids) }
          } else {
            val (g, ids0) =
              if (olds.isEmpty)
                (new Graph(news.head._2.length, mm, efC, sd), Seq.empty[Long])
              else {
                val in = new java.io.ObjectInputStream(
                  new java.io.ByteArrayInputStream(olds.head._2))
                (try in.readObject().asInstanceOf[Graph] finally in.close(),
                  olds.head._3)
              }
            news.foreach { case (_, v, _) => g.insert(v.toArray) }
            val bos = new java.io.ByteArrayOutputStream()
            val out = new java.io.ObjectOutputStream(bos)
            out.writeObject(g); out.close()
            Iterator((shard, bos.toByteArray, ids0 ++ news.map(_._1)))
          }
        }.toDF("shard", "graph", "ids")
      copy(shards = updated)
    }

    /** Deliberately NO `remove` (the one index-family member without
      * it): HNSW graph edges reference neighbors by insertion index, so
      * deleting a node either tombstones it (searches still route
      * through it — the per-shard exact-top-k merge contract breaks
      * silently) or requires repairing every edge that points at it (a
      * per-shard rebuild in disguise). Takedowns here = rebuild the
      * affected shards' corpus subset with [[HnswIndex.build]]; the
      * pmod id routing means only shards containing removed ids need
      * their vectors re-fed. The filter-only removes live on the exact
      * indexes (Lsh/Bm25/Ivf), where membership is per-row. */

    /** Persist under `dir`: shards/ + meta/ (one row of the build
      * geometry). */
    def save(dir: String): Unit = {
      val spark = shards.sparkSession
      import spark.implicits._
      shards.write.mode("overwrite").parquet(s"$dir/shards")
      Seq((numShards, m, efConstruction, seed))
        .toDF("num_shards", "m", "ef_construction", "seed")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    }
  }

  object HnswIndex {
    /** One graph per hash shard, built inside mapPartitions and
      * serialized into the shard row (shard id = the partition index,
      * which for `repartition(n, id)` is `pmod(murmur3_hash(id), n)` —
      * the routing [[HnswIndex#append]] replays). */
    def build(corpus: DataFrame, vecCol: String, idCol: String,
        m: Int = 16, efConstruction: Int = 200, shards: Int = 32,
        seed: Long = 42L): HnswIndex = {
      val spark = corpus.sparkSession
      import spark.implicits._
      val u = Similarity.withUnitVec(corpus, vecCol, "__cv")
        .select(col(idCol).as("id"), col("__cv").as("v")).as[(Long, Seq[Double])]
      val (mm, efC, sd) = (m, efConstruction, seed)
      val shardDf = u.repartition(shards, col("id"))
        .sortWithinPartitions("id")
        .mapPartitions { it =>
          if (!it.hasNext) Iterator.empty
          else {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val rows = it.toArray
            // dimension comes from the shard's own (homogeneous) rows —
            // probing it with a driver-side head() would execute the
            // whole upstream plan one extra time
            val g = new Graph(rows.head._2.length, mm, efC, sd)
            rows.foreach { case (_, v) => g.insert(v.toArray) }
            val bos = new java.io.ByteArrayOutputStream()
            val out = new java.io.ObjectOutputStream(bos)
            out.writeObject(g); out.close()
            Iterator((pid, bos.toByteArray, rows.map(_._1).toSeq))
          }
        }.toDF("shard", "graph", "ids")
      HnswIndex(shardDf, shards, m, efConstruction, seed)
    }

    /** Restore a built-then-saved index. Meta read BY NAME and
      * validated loudly — a mutated/truncated meta fails here naming
      * the field, not later as a mis-routed append. */
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): HnswIndex = {
      val metaDf = spark.read.parquet(s"$dir/meta")
      val required = Seq("num_shards", "m", "ef_construction", "seed")
      val missing = required.filterNot(metaDf.columns.contains)
      require(missing.isEmpty,
        s"HnswIndex.load: $dir/meta is missing field(s) ${missing.mkString(", ")} — " +
          s"not a saved HnswIndex (have: ${metaDf.columns.mkString(", ")})")
      val meta = metaDf.head
      def pos(name: String): Int = {
        val v = meta.getAs[Int](name)
        require(v > 0, s"HnswIndex.load: $dir/meta has non-positive $name = $v — corrupt meta")
        v
      }
      HnswIndex(spark.read.parquet(s"$dir/shards").select("shard", "graph", "ids"),
        pos("num_shards"), pos("m"), pos("ef_construction"),
        meta.getAs[Long]("seed"))
    }
  }

  private def collectQueries(queries: DataFrame, vecCol: String, idCol: String)
      : Array[(Long, Array[Double])] = {
    val q = Similarity.withUnitVec(queries, vecCol, "__qv")
      .select(col(idCol), col("__qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(q.nonEmpty, "no query vectors")
    q
  }

  /** Scatter every broadcast query to every shard graph, gather the
    * per-shard top-k, keep the global top-k with one window — the single
    * search path behind both the one-shot [[topK]] and [[HnswIndex.topK]]
    * (self-matches excluded by id so a corpus row querying itself returns
    * its true neighbors). */
  private def searchShards(shards: DataFrame, q: Array[(Long, Array[Double])],
      k: Int, efSearch: Int): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    val bcQ = spark.sparkContext.broadcast(q)
    val kk = k; val efS = efSearch
    val hits = shards.select(col("graph"), col("ids"))
      .as[(Array[Byte], Seq[Long])]
      .flatMap { case (blob, ids) =>
        val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(blob))
        val g = try in.readObject().asInstanceOf[Graph] finally in.close()
        bcQ.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, kk + 1, efS).iterator.collect {
            case (node, score) if ids(node) != qid => (qid, ids(node), score)
          }.take(kk)
        }
      }.toDF("query_id", "neighbor_id", "score")
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    hits.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Approximate cosine top-k via sharded HNSW graphs.
    * Output: (query_id, neighbor_id, rank, score) — same contract as
    * [[Similarity.bruteForceTopK]]. Deterministic: shard membership is a
    * hash of the id, within-shard insertion order is sorted by id, and
    * graph construction/search use a seeded RNG stream. One-shot shape:
    * build (mapPartitions) and search (flatMap) are narrow neighbors in
    * the same stage, so the serialized graph bytes never leave the
    * executor — the index detour costs one in-memory round-trip, not a
    * shuffle or an extra job. */
  def topK(corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      k: Int, m: Int = 16, efConstruction: Int = 200, efSearch: Int = 64,
      shards: Int = 32, seed: Long = 42L): DataFrame =
    HnswIndex.build(corpus, vecCol, idCol, m, efConstruction, shards, seed)
      .topK(queries, vecCol, idCol, k, efSearch)
}
