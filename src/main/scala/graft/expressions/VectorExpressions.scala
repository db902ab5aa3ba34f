package graft.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot loops the built-in higher-order
  * functions leave interpreted (SURVEY preference order: compose built-ins >
  * custom Expression > UDF; HOF lambdas have no whole-stage codegen and box
  * every element).
  *
  * Semantics are BIT-IDENTICAL to the Column-function formulations they
  * replace (and to the DuckDB oracle): strictly sequential left-to-right
  * double accumulation for the dot product; exact integer vote math for
  * SimHash. The correctness gate re-proves this equivalence on every run.
  */

/** `dot(a, b)`: sequential-order double dot product over two equal-length
  * `array<float>` (or `array<double>`) columns. Replaces
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — same fold order, codegen'd
  * tight loop, no per-element boxing.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot expects array<float>/array<double>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (elemIsFloat(left) && elemIsFloat(right)) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else if (elemIsFloat(left)) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    } else if (elemIsFloat(right)) {
      while (i < n) { acc += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double)$a.$getL($i) * (double)$b.$getR($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `simhash32(hashes)`: 32-bit SimHash from an `array<long>` of per-token
  * 32-bit hashes (bit b of the result = sign of the sum of +-1 votes from
  * bit b of each hash). Replaces the nested aggregate/transform HOF chain —
  * exact same integer math, one codegen'd pass over the tokens.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash32 expects array<long>, got ${dt.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        votes(b) += (((h >> b) & 1L).toInt * 2) - 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |int[] $votes = new int[32];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    $votes[$b] += ((int)(($h >> $b) & 1L) * 2) - 1;
         |  }
         |}
         |long ${ev.value}Acc = 0L;
         |for (int $b = 0; $b < 32; $b++) {
         |  if ($votes[$b] > 0) ${ev.value}Acc |= (1L << $b);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Registration of the native expressions as SQL functions. Spark 4 keeps
  * Column<->Expression conversion private to sql, so the public route to a
  * custom Expression is the function registry: either the
  * [[GraftExtensions]] `spark.sql.extensions` hook (cluster deployment) or
  * the idempotent per-session [[VectorExpressions.register]] the operator
  * pipelines call.
  */
object VectorExpressions {

  // lazy: refers to the builder vals below (object vals initialize in
  // declaration order)
  private lazy val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args => DotProduct(args(0), args(1)) },
    "graft_simhash32" -> { args => SimHash32(args(0)) },
    "graft_minhash_bands" -> { args => MinHashBandDigests(args(0)) },
    "graft_shingle_set" -> { args => ShingleSet(args(0)) },
    "graft_winnow" -> { args => WinnowFingerprints(args(0)) },
    "graft_hyperplane_bands" -> { args => HyperplaneBands(args(0), args(1)) },
    "graft_minhash1" -> { args => MinHashOne(args(0), args(1)) },
    "graft_minhash_all" -> { args => MinHashAll(args(0), args(1)) },
    "graft_hash_embed64" -> { args =>
      HashEmbed64(args(0), args(1), args(2)) },
    "graft_shingles" -> { args => Shingles(args(0), args(1)) },
    "graft_shingle_hashes" -> { args => ShingleHashes(args(0), args(1)) },
    "graft_sliding_chunks" -> { args => SlidingChunks(args(0), args(1), args(2)) },
    "graft_lang_id" -> { args => LangIdBest(args(0)) },
    "graft_rep_stats" -> { args => RepStats(args(0)) },
    "graft_nearest_centroid" -> { args => NearestCentroid(args(0), args(1)) },
    "graft_bloom_agg" -> bloomAggBuilder,
    "graft_might_contain" -> mightContainBuilder)

  /** Spark's own runtime-filter bloom pair, surfaced as SQL functions (it
    * registers neither): build-side aggregate + codegen'd probe, keyed by
    * xxhash64 on BOTH sides so the bits always agree. The bloom argument to
    * might_contain must be a scalar subquery (Spark enforces this), which
    * is exactly the build-once/probe-everywhere broadcast shape we want.
    * One builder shared by the session registry and [[GraftExtensions]].
    */
  private[expressions] val bloomAggBuilder: Seq[Expression] => Expression =
    { args =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      // BloomFilterAggregate wants a LONG estimatedNumItems; accept any
      // foldable integral expression (an unsuffixed 131072 parses as INT,
      // and constant folding has not yet run when this builder fires, so
      // `64 * 1024` arrives as an unfolded Multiply) and refuse anything
      // non-constant outright — a silent default here would size the bit
      // array inconsistently with the passed estimate.
      def asLong(e: Expression): Option[Long] =
        if (!e.foldable) None
        else scala.util.Try(e.eval(null)).toOption.flatMap {
          // Try: a foldable-but-Unevaluable expression (current_date
          // family, replaced only later by the optimizer) must fall
          // through to the clear error below, not throw raw here
          case v: Long  => Some(v)
          case v: Int   => Some(v.toLong)
          case v: Short => Some(v.toLong)
          case v: Byte  => Some(v.toLong)
          case _        => None
        }
      val nItems: Long = args.lift(1) match {
        case None => 131072L
        case Some(e) => asLong(e).getOrElse(throw new IllegalArgumentException(
          "graft_bloom_agg: expected items as an integral literal, got " +
            e.sql))
      }
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(args(0))),
          Literal(nItems),
          Literal(nItems * 10L)) // ~1% false-positive rate
    }

  private[expressions] val mightContainBuilder: Seq[Expression] => Expression =
    { args =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        args(0),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(1))))
    }

  /** Idempotently register on a live session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier("graft_vec_sum")))
      VecSumAgg.register(spark)
  }

  /** Column API over the registered functions. */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def simHash32Native(hashes: Column): Column =
    call_function("graft_simhash32", hashes)
  def minHashBandsNative(shingleSet: Column): Column =
    call_function("graft_minhash_bands", shingleSet)
  def shingleSetNative(text: Column): Column =
    call_function("graft_shingle_set", text)
  def winnowNative(text: Column): Column = call_function("graft_winnow", text)
  def hyperplaneBandsNative(embedding: Column, normals: Column): Column =
    call_function("graft_hyperplane_bands", embedding, normals)
  def minHash1Native(shingleSet: Column, seed: Int): Column =
    call_function("graft_minhash1", shingleSet,
      org.apache.spark.sql.functions.lit(seed))
  def minHashAllNative(shingleSet: Column, nHashes: Int): Column =
    call_function("graft_minhash_all", shingleSet,
      org.apache.spark.sql.functions.lit(nHashes))
  /** Seed-A hash embed (the engine-wide hashEmbedEntry recipe:
    * md5 nibbles 1-4 → bucket, nibble 5 → sign). */
  def hashEmbed64Native(tokens: Column): Column =
    hashEmbed64NativeAt(tokens, 1, 5)
  /** Parameterized-recipe hash embed — 1-based md5-hex offsets (the
    * `substring` convention); the ranker scorecard's seed-B grade is
    * (6, 10). */
  def hashEmbed64NativeAt(tokens: Column, bucketStart: Int,
      signPos: Int): Column =
    call_function("graft_hash_embed64", tokens,
      org.apache.spark.sql.functions.lit(bucketStart),
      org.apache.spark.sql.functions.lit(signPos))
  def shinglesNative(text: Column, k: Int): Column =
    call_function("graft_shingles", text,
      org.apache.spark.sql.functions.lit(k))
  def shingleHashesNative(toks: Column, len: Int): Column =
    call_function("graft_shingle_hashes", toks,
      org.apache.spark.sql.functions.lit(len))
  def slidingChunksNative(text: Column, win: Int, stride: Int): Column =
    call_function("graft_sliding_chunks", text,
      org.apache.spark.sql.functions.lit(win),
      org.apache.spark.sql.functions.lit(stride))
  def langIdNative(text: Column): Column = call_function("graft_lang_id", text)
  def nearestCentroidNative(v: Column, centroids: Column): Column =
    call_function("graft_nearest_centroid", v, centroids)
}

/** `spark.sql.extensions=graft.expressions.GraftExtensions` — injects the
  * native functions at session build, the deployment-grade registration
  * (survives session cloning, no per-query registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash32"),
      (args: Seq[Expression]) => SimHash32(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandDigests].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) => MinHashBandDigests(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingle_set"),
      (args: Seq[Expression]) => ShingleSet(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (args: Seq[Expression]) => WinnowFingerprints(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName, "graft_hyperplane_bands"),
      (args: Seq[Expression]) => HyperplaneBands(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash1"),
      new ExpressionInfo(classOf[MinHashOne].getName, "graft_minhash1"),
      (args: Seq[Expression]) => MinHashOne(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash_all"),
      new ExpressionInfo(classOf[MinHashAll].getName, "graft_minhash_all"),
      (args: Seq[Expression]) => MinHashAll(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_hash_embed64"),
      new ExpressionInfo(classOf[HashEmbed64].getName, "graft_hash_embed64"),
      (args: Seq[Expression]) => HashEmbed64(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => Shingles(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName,
        "graft_shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_sliding_chunks"),
      new ExpressionInfo(classOf[SlidingChunks].getName, "graft_sliding_chunks"),
      (args: Seq[Expression]) => SlidingChunks(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[LangIdBest].getName, "graft_lang_id"),
      (args: Seq[Expression]) => LangIdBest(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(classOf[RepStats].getName, "graft_rep_stats"),
      (args: Seq[Expression]) => RepStats(args(0))))
    ext.injectFunction((FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid"),
      (args: Seq[Expression]) => NearestCentroid(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "graft_bloom_agg"),
      VectorExpressions.bloomAggBuilder))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "graft_might_contain"),
      VectorExpressions.mightContainBuilder))
  }
}
