package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions.{tokens, wordShingles}

/** Property tests pinning the native codegen kernels to their declarative
  * Spark-built-in references: any divergence (tokenization edge, rounding,
  * distinct order) fails here before it can silently skew a 100 TB run.
  */
class NativeKernelsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling in place of the scalatestplus bridge (not in
    * the offline dependency cache): N samples from fixed seeds.
    */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private val spacedText = for {
    ws <- Gen.listOf(word)
    sep <- Gen.oneOf(" ", "  ", " \t ")
  } yield ws.mkString(sep)

  test("ShingleSet.compute == declarative shingle pipeline (random texts)") {
    val texts = samples(spacedText, 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(ShingleSet.shingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).sorted.toList)
    val declarative = df.select(wordShingles(tokens(col("text")), 3).as("s"))
      .collect().map(_.getSeq[String](0).sorted.toList)
    assert(native.toSeq == declarative.toSeq)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val arr = Gen.listOf(word).map(_.distinct.sorted)
    val pairs = samples(Gen.zip(arr, arr), 300)
    val df = pairs.toDF("a", "b")
      // ShingleSet output order is UTF8String binary; alphanumeric ASCII
      // sorts identically under String and UTF8String, so .sorted above
      // satisfies the kernel's precondition
    val native = df.select(
      SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect().map(_.getInt(0)).toSeq
    val builtin = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(native == builtin)
  }

  test("SortedIntersectCount: empty arrays count 0; null input yields NULL") {
    val df = Seq(
      (Seq("a", "b"), Some(Seq.empty[String])),
      (Seq.empty[String], Some(Seq.empty[String])),
      (Seq("a", "b"), None)).toDF("a", "b")
    val got = df.select(
      SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got == Seq(Some(0), Some(0), None))
  }

  test("MinHashSig.compute == declarative explode+min(substring(md5)) pipeline") {
    val texts = samples(spacedText, 200).filter(_.trim.split("\\s+").count(_.nonEmpty) >= 3)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("doc_id"), ShingleSet.shingles(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val native = df
      .select(col("doc_id"), MinHashSig.minhashSig(col("shingles")).as("sig"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList))
    val aggs = (0 until MinHashSig.NumHashes).map { i =>
      val d = if (i < 6) md5(col("shingle")) else md5(concat(lit("x"), col("shingle")))
      min(substring(d, 1 + (i % 6) * MinHashSig.SliceLen, MinHashSig.SliceLen)).as(s"mh_$i")
    }
    val declarative = df
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), (1 to MinHashSig.NumHashes).map(r.getString).toList))
    assert(native.toSeq == declarative.toSeq)
  }

  test("MinHashSig skips null array elements like min() does") {
    import org.apache.spark.unsafe.types.UTF8String
    val withNull = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(UTF8String.fromString("a b c"), null, UTF8String.fromString("b c d")))
    val clean = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(UTF8String.fromString("a b c"), UTF8String.fromString("b c d")))
    val a = MinHashSig.compute(withNull).toArray[UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    val b = MinHashSig.compute(clean).toArray[UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(a == b)
    // no usable elements → NULL (min over no rows), never a sentinel
    // signature that would collide degenerate docs into one LSH cluster
    val allNull = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array[UTF8String](null, null))
    assert(MinHashSig.compute(allNull) == null)
    assert(MinHashSig.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[UTF8String])) == null)
  }

  test("MinHashSig interpreted eval == codegen result") {
    val shingles = Seq("a b c", "b c d", "c d e")
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      shingles.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    val e = MinHashSig(org.apache.spark.sql.catalyst.expressions.Literal(arr,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
    val interpreted = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toList
    val viaPlan = Seq(Tuple1(shingles)).toDF("shingles")
      .select(MinHashSig.minhashSig(col("shingles")).as("sig"))
      .collect()(0).getSeq[String](0).toList
    assert(interpreted == viaPlan)
    assert(interpreted.forall(s => s.length == 5 && s.forall("0123456789abcdef".contains(_))))
  }

  test("QuantizedDot == floor reference (random float vectors)") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-2.0f, 2.0f))
    val pairs = samples(Gen.zip(vec, vec), 100)
    val df = pairs.toDF("a", "b")
    val got = df.select(QuantizedDot.dotq6(col("a"), col("b"))).as[Long].collect()
    val expect = pairs.map { case (a, b) =>
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * 1e6).toLong * math.floor(y.toDouble * 1e6).toLong
      }.sum
    }
    assert(got.toSeq == expect)
  }

  test("QuantizedDot interpreted eval == codegen result") {
    // force the interpreted path through a context codegen can't help:
    // nullSafeEval called directly
    val a = Array(0.1f, -0.7f, 1.5f)
    val b = Array(2.0f, 0.3f, -0.25f)
    val toArrayData = (xs: Array[Float]) =>
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(xs)
    val e = QuantizedDot(
      org.apache.spark.sql.catalyst.expressions.Literal(toArrayData(a),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal(toArrayData(b),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Long]
    val viaPlan = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(QuantizedDot.dotq6(col("a"), col("b"))).as[Long].collect()(0)
    assert(interpreted == viaPlan)
  }

  test("mismatched lengths use the common prefix; empty arrays give 0") {
    val df = Seq((Seq(1.0f, 1.0f), Seq(1.0f))).toDF("a", "b")
    assert(df.select(QuantizedDot.dotq6(col("a"), col("b"))).as[Long].collect()(0)
      == 1000000000000L)
    val empty = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
    assert(empty.select(QuantizedDot.dotq6(col("a"), col("b"))).as[Long].collect()(0) == 0L)
  }

  test("TextStats == declarative HOF pipeline (random texts incl. ws edges)") {
    val stop = Seq("the", "a", "of")
    val lex = Seq(Seq("the", "is"), Seq("der", "und"))
    val edgy = Seq("", " ", "\t", "  x  ", "\tthe der a", "a  b\tc\n", "the the und")
    val texts = edgy ++ samples(spacedText, 150)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val tokHash = transform(toks,
      t => (instr(lit("0123456789abcdef"), substring(md5(t), 1, 1)) - 1) +
        (instr(lit("0123456789abcdef"), substring(md5(t), 2, 1)) - 1) * 16)
    val reference = df.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        aggregate(transform(toks, t => length(t)), lit(0L), (acc, x) => acc + x).as("sum_len"),
        size(filter(toks, t => t.isInCollection(stop))).as("n_stop"),
        array(lex.map(l => size(filter(toks, t => t.isInCollection(l)))): _*).as("lang_scores"),
        aggregate(tokHash, lit(0L),
          (acc, h) => pmod(acc * 31 + h.cast("long"), lit(2147483647L))).as("rolling_fp"))
      .orderBy("doc_id").collect()
    val native = df.select(col("doc_id"),
        TextStats.stats(col("text"), stop, lex, withFp = true).as("s"))
      .select("doc_id", "s.n_tokens", "s.n_distinct", "s.sum_len", "s.n_stop",
        "s.lang_scores", "s.rolling_fp")
      .orderBy("doc_id").collect()
    assert(native.map(_.toSeq).toSeq == reference.map(_.toSeq).toSeq)
  }

  test("LongArrayDot == zip-multiply-sum reference (random long vectors)") {
    val vec = Gen.listOfN(12, Gen.chooseNum(-2000000L, 2000000L))
    val pairs = samples(Gen.zip(vec, vec), 100)
    val df = pairs.toDF("a", "b")
    val got = df.select(LongArrayDot.dotLong(col("a"), col("b"))).as[Long].collect()
    val expect = pairs.map { case (a, b) => a.zip(b).map { case (x, y) => x * y }.sum }
    assert(got.toSeq == expect)
  }

  test("LongArrayDot: ragged lengths and null elements yield NULL, not a partial dot") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L)),       // ragged
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L)),          // null elem
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L))            // clean
    ).toDF("a", "b")
    val got = df.select(LongArrayDot.dotLong(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == Seq(None, None, Some(11L)))
  }

  test("LongArrayDot equals QuantizedDot on pre-quantized float inputs") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-2.0f, 2.0f))
    val pairs = samples(Gen.zip(vec, vec), 50)
    val df = pairs.toDF("a", "b")
    val quant = (c: org.apache.spark.sql.Column) =>
      transform(c, x => floor(x.cast("double") * 1e6).cast("long"))
    val viaLong = df.select(LongArrayDot.dotLong(quant(col("a")), quant(col("b"))))
      .as[Long].collect()
    val viaFloat = df.select(QuantizedDot.dotq6(col("a"), col("b"))).as[Long].collect()
    assert(viaLong.toSeq == viaFloat.toSeq)
  }
}
