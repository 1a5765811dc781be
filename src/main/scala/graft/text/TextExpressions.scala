package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text-hashing primitives as native Catalyst expressions.
  *
  * Everything here is reproducible in plain ANSI SQL (the DuckDB oracle
  * re-derives the same values from `ascii()` codes with the same modular
  * arithmetic), which is what makes document fingerprinting / MinHash /
  * SimHash oracle-checkable instead of rows-only.
  *
  * All hashes are polynomial rolling hashes mod a prime that keeps every
  * intermediate inside a signed 64-bit integer (no overflow wrap, so SQL
  * engines that error on overflow — like DuckDB — agree with the JVM).
  */
object TextMath extends Serializable {
  val Mod: Long = 1000000007L
  val Mult: Long = 31L

  /** h := (h*31 + codepoint) mod p over the string's characters. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * Mult + str.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  // 16 fixed (a, b) pairs for the MinHash family h_j(x) = (a_j*x + b_j) mod p.
  // a_j*x with x < p stays < ~1e18 < Long.MaxValue.
  val MinHashA: Array[Long] = Array(
    914334133L, 439679993L, 285994243L, 186074407L,
    741294371L, 528849913L, 336849001L, 93470029L,
    671413337L, 407655551L, 242088271L, 154268393L,
    888441391L, 513370393L, 306541583L, 72935719L)
  val MinHashB: Array[Long] = Array(
    256203221L, 842859461L, 511570697L, 326813689L,
    104729551L, 675308941L, 391248823L, 218391409L,
    77232917L, 941083987L, 622970687L, 438395347L,
    135299221L, 715225741L, 472882049L, 291038917L)

  /** [[polyHash]] of EVERY character n-gram of `s`, O(len) by rolling:
    * h(i+1, n) = ((h(i, n) − c_i·31^{n−1}) · 31 + c_{i+n}) mod p — the
    * exact-substring-duplication primitive (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * 100-TB scan pays one multiply-add per character, not per
    * (character × n). Each output equals `polyHash` of the gram
    * (spec-asserted), so grams group with whole-string fingerprints. */
  def charNgramHashes(s: UTF8String, n: Int): Array[Long] = {
    val str = s.toString
    val len = str.length
    if (len < n) return Array.emptyLongArray
    var pow = 1L // 31^(n-1) mod p
    var i = 0
    while (i < n - 1) { pow = (pow * Mult) % Mod; i += 1 }
    val out = new Array[Long](len - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = (h * Mult + str.charAt(i).toLong) % Mod; i += 1 }
    out(0) = h
    var j = 1
    while (j <= len - n) {
      val drop = (str.charAt(j - 1).toLong * pow) % Mod
      // (h − drop + p) ≤ 2p ≈ 2·10⁹; ×31 + char stays far below 2⁶³
      h = ((h - drop + Mod) * Mult + str.charAt(j + n - 1).toLong) % Mod
      out(j) = h
      j += 1
    }
    out
  }

  def minHashSig(hashes: Array[Long]): Array[Long] = {
    val sig = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var j = 0
      while (j < 16) {
        val v = (MinHashA(j) * h + MinHashB(j)) % Mod
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Distinct word-k-gram shingles of a single-space tokenization —
    * the tight-loop replica of the Column formula it replaces
    * (`transform(sequence(0, n-k), i -> concat_ws(" ", slice(w, i+1, k)))`
    * + `array_distinct`), byte-for-byte:
    *  - tokens = split on the literal single space, EMPTY TOKENS KEPT
    *    (Spark's regex split with -1 limit);
    *  - fewer than k tokens → empty result;
    *  - shingle i = tokens[i..i+k-1] joined by one space (empty tokens
    *    contribute their empty string, as concat_ws does);
    *  - first-occurrence distinct. */
  def shingles(text: UTF8String, k: Int): Array[UTF8String] = {
    val words = text.toString.split(" ", -1)
    if (words.length < k) return new Array[UTF8String](0)
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    out
  }

  /** ALL word k-grams in order, duplicates kept — [[shingles]] without
    * the distinct pass; the form frequency-weighted statistics need
    * (a duplicated n-gram must count once per occurrence). */
  def ngrams(text: UTF8String, k: Int): Array[UTF8String] = {
    val words = text.toString.split(" ", -1)
    if (words.length < k) return new Array[UTF8String](0)
    val out = new Array[UTF8String](words.length - k + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    out
  }

  /** Unicode NFC (canonical composition). Copy-free when the input is
    * already normalized — `isNormalized` is a scan, not an allocation,
    * and ~all real text passes it. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** [[polyHash]] over every element of a string array (tight loop —
    * replaces an interpreted per-element `transform`). Fast no-null path. */
  def polyHashAll(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = polyHash(arr.getUTF8String(i)); i += 1 }
    out
  }

  /** [[polyHashAll]] for arrays whose type admits null elements: a null
    * element hashes to a null element, exactly as the per-element
    * `transform` with a null-intolerant hash did (boxed — only used when
    * the input type declares containsNull). */
  def polyHashAllNullable(arr: ArrayData): Array[Any] = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null else polyHash(arr.getUTF8String(i))
      i += 1
    }
    out
  }

  /** [[polyHash]] continued from a seed: equals `polyHash(prefix || s)`
    * when `seed = polyHash(prefix)` — salting without allocating the
    * concatenation. */
  def polyHashFrom(seed: Long, s: UTF8String): Long = {
    val str = s.toString
    var h = seed
    var i = 0
    while (i < str.length) {
      h = (h * Mult + str.charAt(i).toLong) % Mod
      i += 1
    }
    h
  }

  /** Salt prefixes for the four 16-bit blocks of [[simHash64]]; the
    * DuckDB oracle replicates block j as `poly_hash('shj:' || token)`. */
  val SimHash64Salts: Array[String] = Array("sh0:", "sh1:", "sh2:", "sh3:")
  private val simHash64Seeds: Array[Long] =
    SimHash64Salts.map(s => polyHash(UTF8String.fromString(s)))

  /** 64-bit SimHash over raw TOKENS — the production-width signature
    * (16-bit banding gives 65 536 buckets/band; see
    * `Dedup.simHashPairs64`). [[polyHash]] carries only ~30 bits of
    * entropy, so the four 16-bit blocks come from four SALTED hashes of
    * each token (seeded fold — no concatenation allocated), block j
    * using bits 0..15 of `polyHash(salt_j || token)`. Null tokens are
    * skipped. */
  def simHash64(tokens: ArrayData): Long = {
    val counts = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        var j = 0
        while (j < 4) {
          val h = polyHashFrom(simHash64Seeds(j), t)
          var b = 0
          while (b < 16) {
            counts(j * 16 + b) += 2L * ((h >> b) & 1L) - 1L
            b += 1
          }
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** 16-bit SimHash over pre-hashed tokens: bit b set iff
    * Σ_tokens (2*((h>>b)&1) − 1) > 0. */
  def simHash16(hashes: Array[Long]): Long = {
    val counts = new Array[Long](16)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var b = 0
      while (b < 16) {
        counts(b) += 2L * ((h >> b) & 1L) - 1L
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Unicode NFC normalization — canonical composition, the corpus-prep
  * pass that belongs BEFORE any content hashing: `e` + U+0301 and the
  * precomposed `é` are the same text to a reader but different bytes to
  * every digest/shingle/MinHash in the dedup family, so un-normalized
  * corpora under-deduplicate (web text mixes both forms freely). NFC
  * (not NFKC) because it is semantics-preserving AND replicable by the
  * DuckDB oracle's `nfc_normalize` — both sides implement the same
  * Unicode canonical composition. The already-normalized fast path
  * (isNormalized — the overwhelming majority of real text) returns the
  * input UTF8String without copying. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextMath.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$tm.nfc($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** Polynomial rolling hash of a string: reference-style document
  * fingerprint (SURVEY.md §2.7 F-class scalar function; rolling-hash
  * fingerprinting per the 100-TB extension mandate). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextMath.polyHash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$tm.polyHash($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "poly_hash"
}

/** Distinct word-k-gram shingles as ONE codegen'd expression. The Column
  * formula this replaces (`transform(sequence(...), ...)`) is a
  * higher-order function Spark evaluates interpreted, per element, with a
  * lambda invocation and boxing on every shingle — measurably dominant on
  * full-corpus scans (the same interpreted-HOF trap round 3 found in
  * q48's fixture). Semantics are byte-identical ([[TextMath.shingles]];
  * ShingleSpec asserts equivalence against the old formula). */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word_shingles: k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextMath.shingles(v.asInstanceOf[UTF8String], k)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    defineCodeGen(ctx, ev,
      c => s"new $gad((Object[]) $tm.shingles($c, $k))")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Rolling [[TextMath.polyHash]] of every character n-gram —
  * `char_ngram_hashes(text, n) -> ARRAY<BIGINT>` (n a plan-time literal
  * baked into codegen). One pass per row regardless of n. */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngram_hashes: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_hashes requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextMath.charNgramHashes(v.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    defineCodeGen(ctx, ev,
      c => s"new $gad($tm.charNgramHashes($c, $n))")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_ngram_hashes"
}

/** ALL word k-grams (duplicates kept, document order) as one codegen'd
  * expression — the multiplicity-preserving sibling of [[WordShingles]]
  * for frequency-weighted statistics (repetition counting, n-gram LM
  * scoring), where a duplicated n-gram must count once per occurrence. */
case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"word_ngrams: k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires STRING, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TextMath.ngrams(v.asInstanceOf[UTF8String], k).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    defineCodeGen(ctx, ev,
      c => s"new $gad((Object[]) $tm.ngrams($c, $k))")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_ngrams"
}

/** Element-wise [[PolyHash]] of an ARRAY<STRING> as one codegen'd
  * expression — `transform(arr, t -> poly_hash(t))` runs the lambda
  * interpreted per element; this is the tight-loop form feeding
  * MinHash/SimHash signatures. */
case class ArrayPolyHash(child: Expression) extends UnaryExpression {
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _               => false
  }

  // null elements propagate as null hashes (what transform + a
  // null-intolerant per-element hash produced); the unboxed fast path
  // runs whenever the input type rules nulls out
  override def dataType: DataType =
    ArrayType(LongType, containsNull = elemNullable)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_poly_hash requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (elemNullable) new GenericArrayData(TextMath.polyHashAllNullable(arr))
    else new GenericArrayData(TextMath.polyHashAll(arr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    val fn = if (elemNullable) "polyHashAllNullable" else "polyHashAll"
    defineCodeGen(ctx, ev, c => s"new $gad($tm.$fn($c))")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "array_poly_hash"
}

abstract class HashArrayExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.simpleString}")
  }
  protected def toLongArray(v: Any): Array[Long] =
    v.asInstanceOf[ArrayData].toLongArray()
}

/** 16-element MinHash signature over an array of token/shingle hashes. */
case class MinHashSig(child: Expression) extends HashArrayExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextMath.minHashSig(toLongArray(v)))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    val gad = classOf[GenericArrayData].getName
    defineCodeGen(ctx, ev, c => s"new $gad($tm.minHashSig($c.toLongArray()))")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash directly over an ARRAY<STRING> token column (four
  * salted 16-bit blocks — see [[TextMath.simHash64]]). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TextMath.simHash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$tm.simHash64($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** 16-bit SimHash over an array of token hashes. */
case class SimHash16(child: Expression) extends HashArrayExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = TextMath.simHash16(toLongArray(v))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tm = TextMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$tm.simHash16($c.toLongArray())")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash16"
}
