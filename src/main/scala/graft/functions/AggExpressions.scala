package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native aggregates (TypedImperativeAggregate — the mutable-buffer sketch
  * shape, same machinery as Spark's HLL/percentile sketches). */
object AggExpressions {

  /** One-pass MinHash signature aggregate: input rows are (already
    * exploded) shingle hashes; the buffer holds the running minimum of
    * `numHashes` universal-hash permutations h_i(x) = (a_i·x + b_i) mod p.
    *
    * Replaces `numHashes` separate min(pmod(...)) aggregate columns with a
    * single buffer updated in one pass — one aggregate expression instead
    * of 64, one buffer allocation per group, and partial/merge combine is
    * an elementwise min (associative + commutative, so map-side partial
    * aggregation applies as usual).
    *
    * Parameters (a_i, b_i) derive from the fixed seed so signatures are
    * identical across runs and partitionings. Inputs are expected in
    * [Int.MinValue, Int.MaxValue] (32-bit base hash widened to long), so
    * a_i·x stays far from 63-bit overflow — same contract as
    * Dedup.minhashSignature. */
  case class MinHashSigAgg(
      child: Expression,
      numHashes: Int,
      seed: Long = 42L,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    private val P = 2305843009213693951L // 2^61 - 1
    // deterministic permutation parameters (same scheme as minhashSignature)
    @transient private lazy val params: Array[(Long, Long)] = {
      val rnd = new scala.util.Random(seed)
      Array.fill(numHashes)(
        (rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
    }

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(numHashes)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < numHashes) {
          val (a, b) = params(i)
          val m = java.lang.Math.floorMod(h * a + b, P)
          if (m < buf(i)) buf(i) = m
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        if (other(i) < buf(i)) buf(i) = other(i)
        i += 1
      }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * numHashes)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(numHashes)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "minhash_sig"

    override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): MinHashSigAgg = copy(child = cs.head)
  }

  /** Column entry point: aggregate a (long) shingle-hash column into the
    * numHashes-element MinHash signature. */
  def minhash_sig(hashCol: Column, numHashes: Int): Column =
    GraftSqlGlue.column(
      MinHashSigAgg(GraftSqlGlue.expression(hashCol), numHashes)
        .toAggregateExpression())

  /** Bottom-k (KMV) distinct-count sketch over a column of 64-bit hashes
    * (Beyer et al. 2007, the DataSketches-theta family): the buffer holds
    * the k smallest DISTINCT hash values in UNSIGNED order. Merge is
    * union + re-trim — associative and commutative, so map-side partial
    * aggregation applies and a 100 TB COUNT(DISTINCT) becomes O(k)
    * mergeable state per group instead of a full distinct shuffle.
    *
    * Estimator: with fewer than k tracked hashes the count is EXACT (the
    * sketch saw every distinct value); at capacity, the classic unbiased
    * estimate (k-1) · 2^64 / h_k under the uniform-hash assumption.
    * Feed it [[HashExpressions.Md5Hash64]] values and the WHOLE sketch —
    * state and estimate — is engine-reproducible: the hash mirrors
    * `('0x'||substr(md5(s),1,16))::UBIGINT`, unsigned order is UBIGINT
    * order, the h_k → double conversion is correctly rounded
    * (`Double.parseDouble` of the unsigned decimal string, matching an
    * external engine's UBIGINT→DOUBLE cast), and the estimate is one
    * IEEE division + multiplication in a fixed order.
    *
    * Output: struct(est double, n_tracked long) — n_tracked =
    * min(distinct seen, k). */
  case class KmvDistinctAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
    require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long](KmvDistinctAgg.UnsignedOrder)

    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        if (buf.size < k) buf.add(h)
        else if (java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
          if (buf.add(h)) buf.pollLast()
        }
      }
      buf
    }

    override def merge(buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long])
        : java.util.TreeSet[java.lang.Long] = {
      buf.addAll(other)
      while (buf.size > k) buf.pollLast()
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val n = buf.size
      val est =
        if (n < k) n.toDouble
        else {
          val hk = buf.last().longValue()
          val hkD = java.lang.Double.parseDouble(
            java.lang.Long.toUnsignedString(hk))
          (k - 1).toDouble * (KmvDistinctAgg.Two64 / hkD)
        }
      InternalRow(est, n.toLong)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long])
        : Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.size)
      buf.forEach(h => bb.putLong(h))
      bb.array()
    }

    override def deserialize(bytes: Array[Byte])
        : java.util.TreeSet[java.lang.Long] = {
      val buf = createAggregationBuffer()
      val bb = ByteBuffer.wrap(bytes)
      while (bb.hasRemaining) buf.add(bb.getLong)
      buf
    }

    override def dataType: DataType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("est",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("n_tracked", LongType,
          nullable = false)))
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "kmv_distinct"

    override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): KmvDistinctAgg = copy(child = cs.head)
  }

  object KmvDistinctAgg {
    /** 2^64, exactly representable in double. */
    val Two64: Double = 1.8446744073709552E19

    /** Serializable unsigned comparator (a lambda field would make the
      * whole expression unserializable for executor shipping). */
    object UnsignedOrder extends java.util.Comparator[java.lang.Long]
        with Serializable {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    }
  }

  /** Column entry point: KMV distinct sketch over a 64-bit hash column
    * (pair with [[HashExpressions.md5_hash64]] for engine portability). */
  def kmv_distinct(hashCol: Column, k: Int): Column =
    GraftSqlGlue.column(
      KmvDistinctAgg(GraftSqlGlue.expression(hashCol), k)
        .toAggregateExpression())

  /** [[KmvDistinctAgg]] variant that evals to the sketch STATE — the
    * unsigned-ascending array of (at most) k smallest distinct hashes —
    * instead of the (est, n_tracked) summary. The state is what an
    * incrementally-maintained rollup persists per group: two states
    * union-merge ([[KmvMergeExpr]]) into exactly the state a one-shot
    * aggregation of the union would produce (bottom-k-distinct is a
    * semilattice homomorphism), so insert-only maintenance never has to
    * re-read the source. */
  case class KmvSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
    require(k >= 2, s"kmv_sketch needs k >= 2, got $k")
    private val inner = KmvDistinctAgg(child, k)

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      inner.createAggregationBuffer()
    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] =
      inner.update(buf, input)
    override def merge(buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long])
        : java.util.TreeSet[java.lang.Long] = inner.merge(buf, other)
    override def serialize(buf: java.util.TreeSet[java.lang.Long])
        : Array[Byte] = inner.serialize(buf)
    override def deserialize(bytes: Array[Byte])
        : java.util.TreeSet[java.lang.Long] = inner.deserialize(bytes)

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      var i = 0
      buf.forEach { h => out(i) = h; i += 1 } // TreeSet iterates unsigned-asc
      new GenericArrayData(out)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "kmv_sketch"
    override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): KmvSketchAgg = copy(child = cs.head)
  }

  /** Column entry point: KMV sketch state (array of bottom-k distinct
    * hashes, unsigned ascending). */
  def kmv_sketch(hashCol: Column, k: Int): Column =
    GraftSqlGlue.column(
      KmvSketchAgg(GraftSqlGlue.expression(hashCol), k)
        .toAggregateExpression())

  /** Scalar union-merge of two KMV sketch states: distinct union,
    * unsigned order, keep the k smallest. NULL on either side acts as
    * the empty sketch (a group new to dst, or a delta with no inserts),
    * so the rollup's full-outer combine needs no coalesce scaffolding.
    * Interpreted eval (CodegenFallback): it runs on aggregate-sized
    * rows — one per changed group — never in a per-row hot path. */
  case class KmvMergeExpr(left: Expression, right: Expression, k: Int)
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(k >= 2, s"kmv_merge needs k >= 2, got $k")
    override def children: Seq[Expression] = Seq(left, right)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = {
      val set = new java.util.TreeSet[java.lang.Long](
        KmvDistinctAgg.UnsignedOrder)
      def addAll(v: Any): Unit = v match {
        case null => ()
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          var i = 0
          while (i < a.numElements()) { set.add(a.getLong(i)); i += 1 }
      }
      addAll(left.eval(input))
      addAll(right.eval(input))
      while (set.size > k) set.pollLast()
      val out = new Array[Long](set.size)
      var i = 0
      set.forEach { h => out(i) = h; i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(
        newLeft: IndexedSeq[Expression]): Expression =
      copy(left = newLeft(0), right = newLeft(1))
  }

  def kmv_merge(a: Column, b: Column, k: Int): Column =
    GraftSqlGlue.column(KmvMergeExpr(
      GraftSqlGlue.expression(a), GraftSqlGlue.expression(b), k))

  /** Scalar estimate from a KMV sketch state — the same correctly-
    * rounded arithmetic as [[KmvDistinctAgg.eval]], so a maintained
    * state's estimate is bit-identical to the one-shot aggregate's (and
    * to a DuckDB SQL rebuild). NULL state estimates as 0 distinct. */
  case class KmvEstimateExpr(child: Expression, k: Int)
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    require(k >= 2, s"kmv_estimate needs k >= 2, got $k")
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = false
    override def eval(input: InternalRow): Any = child.eval(input) match {
      case null => 0.0
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        val n = a.numElements()
        if (n < k) n.toDouble
        else {
          val hk = a.getLong(n - 1) // unsigned-ascending: last = h_k
          val hkD = java.lang.Double.parseDouble(
            java.lang.Long.toUnsignedString(hk))
          (k - 1).toDouble * (KmvDistinctAgg.Two64 / hkD)
        }
    }
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  }

  def kmv_estimate(state: Column, k: Int): Column =
    GraftSqlGlue.column(KmvEstimateExpr(GraftSqlGlue.expression(state), k))

  /** Fixed-size Bloom filter over a column of xxhash64 values: `m` bits,
    * `k` probes double-hashed from the 64-bit input (h1 + i·h2). Buffer is
    * the raw bitset; merge is elementwise OR (associative/commutative →
    * map-side partial aggregation applies). Sized for the snapshot log's
    * per-file membership stats: 8192 bits / 4 probes ≈ 2% false positives
    * at ~1000 distinct values per file — false positives only KEEP a file,
    * never skip one. */
  case class BloomAgg(
      child: Expression,
      numBits: Int = BloomAgg.DefaultBits,
      numProbes: Int = BloomAgg.DefaultProbes,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(numBits > 0 && (numBits & 63) == 0, "numBits must be a multiple of 64")

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](numBits / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) BloomAgg.add(buf, v.asInstanceOf[Long], numBits, numProbes)
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.length)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(numBits / 64)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "bloom_agg"

    override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): BloomAgg = copy(child = cs.head)
  }

  object BloomAgg {
    val DefaultBits = 8192
    val DefaultProbes = 4

    def add(bits: Array[Long], hash: Long, m: Int, k: Int): Unit = {
      val h1 = hash
      val h2 = java.lang.Long.rotateLeft(hash, 32) | 1L
      var i = 0
      while (i < k) {
        val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, m.toLong).toInt
        bits(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
    }

    def mightContain(bits: Array[Long], hash: Long, k: Int): Boolean = {
      val m = bits.length * 64
      val h1 = hash
      val h2 = java.lang.Long.rotateLeft(hash, 32) | 1L
      var i = 0
      while (i < k) {
        val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, m.toLong).toInt
        if ((bits(pos >> 6) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  /** Column entry point: Bloom bitset (array<long>) over xxhash64 values. */
  def bloom_agg(hashCol: Column): Column =
    GraftSqlGlue.column(
      BloomAgg(GraftSqlGlue.expression(hashCol)).toAggregateExpression())

  /** Bounded-heap top-k aggregate: keeps the k (id, score) pairs with the
    * highest score (ties broken by smaller id — fully deterministic) in a
    * k-element heap. Partial aggregation applies: every map task reduces
    * its rows to AT MOST k pairs before the shuffle, so a top-k over a
    * scored corpus moves O(k × partitions) rows instead of the whole
    * scored set — the shape that beats a row_number window (which must
    * shuffle every scored row to rank it) at any scale, and the reason
    * ANN brute-force scoring stays one scan + a tiny exchange.
    *
    * Ids may be any integral or string column (validated at ANALYSIS time
    * via checkInputDataTypes — no runtime ClassCastException); scores any
    * numeric. The output `neighbor_id` keeps the id column's type. */
  case class TopKAgg(
      idChild: Expression,
      scoreChild: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[
        scala.collection.mutable.PriorityQueue[(Double, Any)]] {
    require(k > 0, "k must be positive")

    import org.apache.spark.sql.types._

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      val idOk = idChild.dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _ => false
      }
      if (!idOk) TypeCheckFailure("topk_by id must be an integral or " +
        s"string column, got ${idChild.dataType.simpleString}")
      else if (!scoreChild.dataType.isInstanceOf[NumericType])
        TypeCheckFailure("topk_by score must be numeric, got " +
          scoreChild.dataType.simpleString)
      else TypeCheckSuccess
    }

    // id tie-break uses Spark's interpreted ordering for the id's own type
    // (internal values: boxed integrals / UTF8String)
    @transient private lazy val idOrd: Ordering[Any] =
      GraftSqlGlue.interpretedOrdering(idChild.dataType)

    private def toScore(v: Any): Double = v match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
    }

    // heap head = WORST kept pair (lowest score, then largest id), so a
    // better candidate evicts the head in O(log k)
    private def heapOrd: Ordering[(Double, Any)] =
      new Ordering[(Double, Any)] {
        override def compare(x: (Double, Any), y: (Double, Any)): Int = {
          val c = java.lang.Double.compare(y._1, x._1) // lower score = max
          if (c != 0) c else idOrd.compare(x._2, y._2) // larger id = max
        }
      }

    override def createAggregationBuffer()
        : scala.collection.mutable.PriorityQueue[(Double, Any)] =
      new scala.collection.mutable.PriorityQueue[(Double, Any)]()(heapOrd)

    private def add(
        buf: scala.collection.mutable.PriorityQueue[(Double, Any)],
        pair: (Double, Any)): Unit = {
      if (buf.size < k) buf.enqueue(pair)
      else if (heapOrd.compare(pair, buf.head) < 0) { // pair beats worst
        buf.dequeue(); buf.enqueue(pair)
      }
    }

    override def update(
        buf: scala.collection.mutable.PriorityQueue[(Double, Any)],
        input: InternalRow)
        : scala.collection.mutable.PriorityQueue[(Double, Any)] = {
      val id = idChild.eval(input)
      val score = scoreChild.eval(input)
      if (id != null && score != null)
        add(buf, (toScore(score), id match {
          // UTF8String buffers may be reused by the scan — copy to own it
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case other => other
        }))
      buf
    }

    override def merge(
        buf: scala.collection.mutable.PriorityQueue[(Double, Any)],
        other: scala.collection.mutable.PriorityQueue[(Double, Any)])
        : scala.collection.mutable.PriorityQueue[(Double, Any)] = {
      other.foreach(add(buf, _))
      buf
    }

    /** array<struct<neighbor_id, cos>> sorted best-first. */
    override def eval(
        buf: scala.collection.mutable.PriorityQueue[(Double, Any)]): Any = {
      val sorted = buf.clone().dequeueAll.reverse // dequeue yields worst-first
      new GenericArrayData(sorted.map { case (s, id) =>
        InternalRow(id, s)
      }.toArray[Any])
    }

    override def serialize(
        buf: scala.collection.mutable.PriorityQueue[(Double, Any)])
        : Array[Byte] = {
      val items = buf.toArray
      val idBytes: Array[Array[Byte]] = idChild.dataType match {
        case StringType => items.map(
          _._2.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
        case _ => items.map { it =>
          val l = it._2 match {
            case b: Byte => b.toLong
            case s: Short => s.toLong
            case i: Int => i.toLong
            case l: Long => l
          }
          ByteBuffer.allocate(8).putLong(l).array()
        }
      }
      val bb = ByteBuffer.allocate(
        4 + items.map(_ => 12).sum + idBytes.map(_.length).sum)
      bb.putInt(items.length)
      items.zip(idBytes).foreach { case ((s, _), ib) =>
        bb.putDouble(s); bb.putInt(ib.length); bb.put(ib)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte])
        : scala.collection.mutable.PriorityQueue[(Double, Any)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val s = bb.getDouble
        val len = bb.getInt
        val ib = new Array[Byte](len)
        bb.get(ib)
        val id: Any = idChild.dataType match {
          case StringType =>
            org.apache.spark.unsafe.types.UTF8String.fromBytes(ib)
          case ByteType => ByteBuffer.wrap(ib).getLong.toByte
          case ShortType => ByteBuffer.wrap(ib).getLong.toShort
          case IntegerType => ByteBuffer.wrap(ib).getLong.toInt
          case _ => ByteBuffer.wrap(ib).getLong
        }
        buf.enqueue((s, id))
        i += 1
      }
      buf
    }

    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("neighbor_id",
          idChild.dataType, nullable = false),
        org.apache.spark.sql.types.StructField("cos",
          org.apache.spark.sql.types.DoubleType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(idChild, scoreChild)
    override def prettyName: String = "topk_by"

    override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): TopKAgg =
      copy(idChild = cs(0), scoreChild = cs(1))
  }

  /** Column entry point: top-k (neighbor_id, cos) pairs per group by
    * descending score, ascending id. */
  def topk_by(idCol: Column, scoreCol: Column, k: Int): Column =
    GraftSqlGlue.column(
      TopKAgg(GraftSqlGlue.expression(idCol),
        GraftSqlGlue.expression(scoreCol), k).toAggregateExpression())

  /** Element-wise sum of fixed-length long-array columns — the centroid
    * accumulator for k-means. One buffer per group holding the running
    * per-dimension sums; merge is element-wise add (associative +
    * commutative → map-side partial aggregation applies), so a centroid
    * update over N vectors shuffles k × dim longs per map task instead of
    * the N × dim rows a posexplode/groupBy(pos) formulation would move.
    * Integer adds keep the aggregate order-free, which is what makes the
    * clustering oracle-checkable: no float summation order to disagree on.
    */
  case class VectorSumAgg(
      child: Expression,
      dim: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(dim > 0, "dim must be positive")

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckSuccess
        case other => TypeCheckFailure(
          s"vector_sum expects array<bigint>, got ${other.simpleString}")
      }
    }

    override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        require(arr.numElements() == dim,
          s"vector_sum: expected $dim elements, got ${arr.numElements()}")
        var i = 0
        while (i < dim) { buf(i) += arr.getLong(i); i += 1 }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * dim)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(dim)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "vector_sum"

    override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): VectorSumAgg = copy(child = cs.head)
  }

  /** Column entry point: element-wise sum of `dim`-length array<long>. */
  def vector_sum(vecCol: Column, dim: Int): Column =
    GraftSqlGlue.column(
      VectorSumAgg(GraftSqlGlue.expression(vecCol), dim)
        .toAggregateExpression())

  /** Misra-Gries heavy hitters: at most `k` counters track the stream's
    * frequent items in O(k) memory per group — the corpus-scale answer to
    * "top tokens / top domains" where an exact groupBy would shuffle the
    * full distinct set. Guarantees (not approximations of them): any item
    * with true frequency > n/(k+1) IS in the summary, and each reported
    * count is a lower bound within n/(k+1) of truth. Counters are
    * mergeable (combine, then subtract the (k+1)-th largest — the
    * Agarwal et al. mergeable-summaries construction), so map-side
    * partial aggregation applies and the shuffle carries ≤ k entries per
    * task. Counts (not the retention guarantee) depend on merge order, so
    * the operator is spec-pinned rather than SQL-oracled.
    *
    * Output: array<struct<item string, count long>> sorted by count desc,
    * item asc. */
  case class HeavyHittersAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[
        java.util.HashMap[String, Long]] {
    require(k > 0, "k must be positive")

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
      child.dataType match {
        case org.apache.spark.sql.types.StringType => TypeCheckSuccess
        case other => TypeCheckFailure(
          s"heavy_hitters expects a string column, got ${other.simpleString}")
      }
    }

    override def createAggregationBuffer(): java.util.HashMap[String, Long] =
      new java.util.HashMap[String, Long]()

    /** classic MG step: known item +1; room for a new counter; else decay
      * every counter by 1 (dropping zeros). */
    private def offer(buf: java.util.HashMap[String, Long], item: String,
        weight: Long): Unit = {
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + weight)
      else if (buf.size < k) buf.put(item, weight)
      else {
        // decrement all by the min(weight, smallest counter) — the
        // weighted MG step (weight 1 for plain updates)
        var dec = weight
        while (dec > 0 && buf.size >= k) {
          val it = buf.values().iterator()
          var minC = Long.MaxValue
          while (it.hasNext) minC = math.min(minC, it.next())
          val step = math.min(dec, minC)
          val entries = buf.entrySet().iterator()
          while (entries.hasNext) {
            val e = entries.next()
            val nv = e.getValue - step
            if (nv <= 0L) entries.remove() else e.setValue(nv)
          }
          dec -= step
        }
        if (dec > 0) buf.put(item, dec)
      }
    }

    override def update(buf: java.util.HashMap[String, Long],
        input: InternalRow): java.util.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null)
        offer(buf, v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .toString, 1L)
      buf
    }

    /** mergeable-summaries combine: add counters, then reduce back to k
      * by subtracting the (k+1)-th largest count from everything. */
    override def merge(buf: java.util.HashMap[String, Long],
        other: java.util.HashMap[String, Long])
        : java.util.HashMap[String, Long] = {
      val oit = other.entrySet().iterator()
      while (oit.hasNext) {
        val e = oit.next()
        val cur = buf.get(e.getKey) // missing unboxes to 0L
        buf.put(e.getKey, cur + e.getValue)
      }
      if (buf.size > k) {
        val counts = new Array[Long](buf.size)
        var i = 0
        val it = buf.values().iterator()
        while (it.hasNext) { counts(i) = it.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(buf.size - k - 1) // (k+1)-th largest
        val entries = buf.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          val nv = e.getValue - cut
          if (nv <= 0L) entries.remove() else e.setValue(nv)
        }
      }
      buf
    }

    override def eval(buf: java.util.HashMap[String, Long]): Any = {
      val items = new Array[(String, Long)](buf.size)
      var i = 0
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); items(i) = (e.getKey, e.getValue); i += 1
      }
      scala.util.Sorting.stableSort(items,
        (a: (String, Long), b: (String, Long)) =>
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      new GenericArrayData(items.map { case (s, c) =>
        InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(s), c)
      }.toArray[Any])
    }

    override def serialize(buf: java.util.HashMap[String, Long])
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val b = e.getKey.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte])
        : java.util.HashMap[String, Long] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.put(new String(b, "UTF-8"), in.readLong())
        i += 1
      }
      buf
    }

    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("count", LongType,
          nullable = false))),
      containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override def prettyName: String = "heavy_hitters"

    override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HeavyHittersAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): HeavyHittersAgg = copy(child = cs.head)
  }

  /** Column entry point: Misra-Gries k-counter heavy-hitters summary. */
  def heavy_hitters(itemCol: Column, k: Int): Column =
    GraftSqlGlue.column(
      HeavyHittersAgg(GraftSqlGlue.expression(itemCol), k)
        .toAggregateExpression())
}
