package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernels (dedup hot path).
  *
  * The r1/early-r2 dedup pipelines built every 3-gram STRING via
  * interpreted HOF lambdas (`transform(sequence(...), i -> concat_ws(
  * ' ', slice(toks, i+1, 3)))`) and then exploded + exchanged them.
  * These expressions do the whole per-document pass in one tight
  * codegen'd loop over the UTF-8 bytes:
  *
  *  - shingles are SUBSTRINGS of the original text: with a single-space
  *    separator, `concat_ws(' ', slice(split(text,' '), i+1, 3))` is
  *    byte-identical to text[start(tok_i) .. end(tok_{i+2})] (split
  *    keeps empty tokens and concat_ws keeps empty strings, so runs of
  *    spaces round-trip). 0x20 never occurs inside a UTF-8 multibyte
  *    sequence, so byte scanning is safe.
  *  - hashing happens in place — no shingle string is ever
  *    materialized on the heap (beyond md5's digest input).
  */
object TextShingleHelpers {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Mod60 = 1152921504606846976L // 2^60

  /** Token start offsets (byte positions) for single-space splitting:
    * token i spans [starts(i), ends(i)). Mirrors split(text, " ") with
    * trailing empties kept.
    */
  private def tokenBounds(bytes: Array[Byte]): (Array[Int], Array[Int]) = {
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') n += 1; i += 1 }
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    (starts, ends)
  }

  /** Distinct xxhash64 (seed 42 — same as Spark's xxhash64 function) of
    * every word-3-gram substring; null-free array<long>, insertion
    * order. Join-key-only hashes: a 64-bit collision needs ~2^32
    * distinct shingles to become likely.
    */
  def shingleHashSet(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = tokenBounds(bytes)
    val n = starts.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (n - 2) * 2))
    val out = new java.util.ArrayList[java.lang.Long](n - 2)
    var i = 0
    while (i <= n - 3) {
      val from = starts(i)
      val len = ends(i + 2) - from
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, len, 42L)
      val boxed = java.lang.Long.valueOf(h)
      if (seen.add(boxed)) out.add(boxed)
      i += 1
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).longValue(); j += 1 }
    new GenericArrayData(arr)
  }

  /** k-value MinHash signature over the document's word-3-grams, or
    * null when the doc has < 3 tokens (no shingles — same exclusion the
    * relational groupBy form had).
    *
    * Parity-exact with the SQL spelling the oracle uses: per shingle,
    * h1/h2 are the two 60-bit halves of md5's hex digest
    * (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)` resp. chars 16..30)
    * and h_i = (h1 + i·h2) mod 2^60 (Kirsch–Mitzenmacher); the k mins
    * accumulate in one pass. min() is duplicate-insensitive, so no
    * shingle dedup is needed at all.
    */
  def minhashSig(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = tokenBounds(bytes)
    val n = starts.length
    if (n < 3) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val digest = md5.get()
    var i = 0
    while (i <= n - 3) {
      val from = starts(i)
      val len = ends(i + 2) - from
      digest.reset()
      digest.update(bytes, from, len)
      val d = digest.digest()
      // hex chars 1..15 = bytes 0..6 plus the high nibble of byte 7
      var h1 = 0L
      var b = 0
      while (b < 7) { h1 = (h1 << 8) | (d(b) & 0xffL); b += 1 }
      h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
      // hex chars 16..30 = low nibble of byte 7 plus bytes 8..14
      var h2 = d(7) & 0x0fL
      b = 8
      while (b < 15) { h2 = (h2 << 8) | (d(b) & 0xffL); b += 1 }
      // h_j = (h1 + j·h2) mod 2^60, computed incrementally: v_{j+1} =
      // (v_j + h2) mod 2^60 never exceeds 2^61, so the chain is exact
      // for ANY k (the closed form h1 + j·h2 overflows Long once j ≥ 8).
      var v = h1 % Mod60
      var j = 0
      while (j < k) {
        if (v < mins(j)) mins(j) = v
        v = (v + h2) % Mod60
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** ALL word-k-gram hashes in position order (index i = gram starting
    * at token i) — the front end of positional dup-span detection.
    * Join-key-only hashes (never output): same collision bound as
    * [[shingleHashSet]].
    */
  def gramHashSeq(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = tokenBounds(bytes)
    val n = starts.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val from = starts(i)
      val len = ends(i + k - 1) - from
      out(i) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, len, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document DSIR bucket HISTOGRAM in one byte-scan pass:
    * counts[b] = number of word unigrams + bigrams whose 60-bit md5
    * hash lands in bucket b (b = hash % nBuckets). Hash-exact with the
    * relational spelling `conv(substring(md5(g),1,15),16,10) % B` over
    * `explode(toks) UNION ALL explode(bigrams)`: a bigram substring
    * text[start(tok_i) .. end(tok_{i+1})) is byte-identical to
    * tok_i || ' ' || tok_{i+1} under the single-space separator (the
    * same round-trip argument as [[shingleHashSet]]'s scaladoc). This
    * is the front end that removes the per-gram explode + the
    * (doc, lang, bucket) count exchange from the DSIR pipeline — a
    * document's whole histogram lives in its own row.
    */
  def gramBucketHist(text: UTF8String, nBuckets: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = tokenBounds(bytes)
    val n = starts.length
    val h = new Array[Long](nBuckets)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      h(md5Bucket(digest, bytes, starts(i), ends(i) - starts(i), nBuckets)) += 1
      if (i < n - 1)
        h(md5Bucket(digest, bytes, starts(i), ends(i + 1) - starts(i), nBuckets)) += 1
      i += 1
    }
    new GenericArrayData(h.map(x => x: Any))
  }

  /** hash60(bytes[from, from+len)) % nBuckets — hex chars 1..15 of the
    * md5 digest as a 60-bit positive long (same extraction as
    * [[minhashSig]]'s h1), reduced mod the bucket count.
    */
  private def md5Bucket(digest: MessageDigest, bytes: Array[Byte],
      from: Int, len: Int, nBuckets: Int): Int = {
    digest.reset()
    digest.update(bytes, from, len)
    val d = digest.digest()
    var h1 = 0L
    var b = 0
    while (b < 7) { h1 = (h1 << 8) | (d(b) & 0xffL); b += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >> 4)
    (h1 % nBuckets).toInt
  }

  /** DISTINCT word-k-gram hashes ([[shingleHashSet]] generalized to
    * any k): the row-local dedup that replaces a corpus-wide
    * `.distinct()` exchange in per-doc gram-set operators.
    */
  /** Per-document word-k-gram TERM FREQUENCIES plus the squared L2
    * norm, in ONE byte-scan pass: struct(n2, array<struct(g, tf)>).
    * This is the row-local front end of the sparse-cosine pipeline —
    * it replaces a corpus-wide `groupBy(doc_id, gram)` tf exchange AND
    * the separate per-doc norm aggregation with per-row arithmetic
    * (a document's grams all live in its own row, so nothing about tf
    * or Σtf² needs a shuffle). Hash/collision notes as [[gramHashSeq]].
    */
  def gramTf(text: UTF8String, k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val (starts, ends) = tokenBounds(bytes)
    val n = starts.length
    val empty = new GenericArrayData(Array.empty[Any])
    if (n < k) return new GenericInternalRow(Array[Any](0L, empty))
    val m = new java.util.LinkedHashMap[java.lang.Long, Array[Int]](
      math.max(8, (n - k + 1) * 2))
    var i = 0
    while (i <= n - k) {
      val from = starts(i)
      val len = ends(i + k - 1) - from
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, len, 42L)
      val c = m.get(h)
      if (c == null) m.put(h, Array(1)) else c(0) += 1
      i += 1
    }
    var n2 = 0L
    val arr = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tf = e.getValue()(0).toLong
      n2 += tf * tf
      arr(j) = new GenericInternalRow(Array[Any](e.getKey.longValue(), tf))
      j += 1
    }
    new GenericInternalRow(Array[Any](n2, new GenericArrayData(arr)))
  }

  def gramHashSet(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, ends) = tokenBounds(bytes)
    val n = starts.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (n - k + 1) * 2))
    val out = new java.util.ArrayList[java.lang.Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val from = starts(i)
      val len = ends(i + k - 1) - from
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from, len, 42L)
      val boxed = java.lang.Long.valueOf(h)
      if (seen.add(boxed)) out.add(boxed)
      i += 1
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).longValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** shingle_hash_set(text) → array<long>: distinct 64-bit hashes of the
  * word-3-gram set. Codegen'd.
  */
case class ShingleHashSetExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hash_set expects string, got ${child.dataType}")
  override def nullSafeEval(t: Any): Any =
    TextShingleHelpers.shingleHashSet(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextShingleHelpers.shingleHashSet($t)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** gram_bucket_hist(text, nBuckets) → array<long> of length nBuckets:
  * per-document DSIR bucket histogram over word unigrams + bigrams
  * (md5-60-bit hash mod nBuckets). Codegen'd.
  */
case class GramBucketHistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_bucket_hist expects (string, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(t: Any, k: Any): Any =
    TextShingleHelpers.gramBucketHist(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.TextShingleHelpers.gramBucketHist($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** gram_hash_seq(text, k) → array<long>: ALL word-k-gram hashes in
  * position order (empty when the doc has < k tokens). Codegen'd.
  */
case class GramHashSeqExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hash_seq expects (string, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(t: Any, k: Any): Any =
    TextShingleHelpers.gramHashSeq(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.TextShingleHelpers.gramHashSeq($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** gram_hash_set(text, k) → array<long>: DISTINCT word-k-gram hashes
  * (empty when the doc has < k tokens). Codegen'd.
  */
case class GramHashSetExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hash_set expects (string, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(t: Any, k: Any): Any =
    TextShingleHelpers.gramHashSet(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.TextShingleHelpers.gramHashSet($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** gram_tf(text, k) → struct(n2: long, tfs: array<struct(g: long,
  * tf: long)>): per-doc k-gram term frequencies + squared L2 norm in
  * one pass (empty tfs / n2=0 when the doc has < k tokens). Codegen'd.
  */
case class GramTfExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("tfs", ArrayType(StructType(Seq(
      StructField("g", LongType, nullable = false),
      StructField("tf", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_tf expects (string, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(t: Any, k: Any): Any =
    TextShingleHelpers.gramTf(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.TextShingleHelpers.gramTf($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** minhash_sig(text, k) → array<long> of k MD5-double-hashed minhash
  * values, null when the document has no 3-gram (fewer than 3 tokens).
  * Codegen'd.
  */
case class MinHashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (string, int), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(t: Any, k: Any): Any =
    TextShingleHelpers.minhashSig(t.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"""
         |${ev.value} = graft.functions.TextShingleHelpers.minhashSig($t, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
