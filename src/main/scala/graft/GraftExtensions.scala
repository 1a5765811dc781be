package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.text.{ArrayPolyHash, CharNgramHashes, MinHashSig, NfcNormalize, PolyHash, SimHash16, SimHash64, WordNgrams, WordShingles}

/** Session-extension entry point: makes every graft expression available in
  * plain SQL on any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * idiomatic deployment path for a cluster (spark-defaults.conf), where
  * per-session `registerAll` calls aren't an option.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    inject("cosine_distance",
      "cosine_distance(a, b) - pgvector <=> analog over ARRAY<FLOAT>") {
      e => CosineDistance(e(0), e(1)) }
    inject("dot_product", "dot_product(a, b) over ARRAY<FLOAT>") {
      e => DotProduct(e(0), e(1)) }
    inject("l2_distance", "l2_distance(a, b) - pgvector <-> analog") {
      e => L2Distance(e(0), e(1)) }
    inject("poly_hash", "poly_hash(s) - rolling hash fingerprint") {
      e => PolyHash(e.head) }
    inject("nfc_normalize",
      "nfc_normalize(s) - Unicode canonical composition (pre-hash text prep)") {
      e => NfcNormalize(e.head) }
    inject("array_poly_hash",
      "array_poly_hash(arr) - poly_hash of every ARRAY<STRING> element") {
      e => ArrayPolyHash(e.head) }
    inject("word_shingles",
      "word_shingles(text, k) - distinct word k-gram shingles (k literal)")(
      functions.literalKBuilder("word_shingles")(WordShingles(_, _)))
    inject("word_ngrams",
      "word_ngrams(text, k) - ALL word k-grams, duplicates kept (k literal)")(
      functions.literalKBuilder("word_ngrams")(WordNgrams(_, _)))
    inject("minhash_sig", "minhash_sig(hashes) - 16-slot MinHash signature") {
      e => MinHashSig(e.head) }
    inject("simhash16", "simhash16(hashes) - 16-bit SimHash") {
      e => SimHash16(e.head) }
    inject("simhash64",
      "simhash64(tokens) - 64-bit SimHash over ARRAY<STRING> tokens") {
      e => SimHash64(e.head) }
    inject("hyperplane_bands",
      "hyperplane_bands(vec, bands, rowsPerBand, seed) - multi-band " +
        "random-hyperplane LSH signatures (parameters literal)")(
      functions.hyperplaneBandsBuilder)
    inject("char_ngram_hashes",
      "char_ngram_hashes(text, n) - rolling poly_hash of every char " +
        "n-gram (n literal)")(
      functions.literalKBuilder("char_ngram_hashes")(CharNgramHashes(_, _)))
    inject("fp16_encode", "fp16_encode(vec) - half-precision storage codec") {
      e => Fp16Encode(e.head) }
    inject("fp16_decode", "fp16_decode(bin) - half-precision read codec") {
      e => Fp16Decode(e.head) }
    inject("fp16_cosine_distance",
      "fp16_cosine_distance(bin, q) - cosine over half-encoded storage") {
      e => Fp16CosineDistance(e(0), e(1)) }
    inject("int8_encode",
      "int8_encode(vec) - symmetric per-vector int8 quantization codec") {
      e => Int8Encode(e.head) }
    inject("int8_decode", "int8_decode(bin) - dequantized ARRAY<DOUBLE>") {
      e => Int8Decode(e.head) }
    inject("int8_cosine_distance",
      "int8_cosine_distance(bin, q) - cosine in the int8-quantized domain") {
      e => Int8CosineDistance(e(0), e(1)) }
    // decode+cosine fusion: score encoded embeddings without widening
    ext.injectOptimizerRule(_ => FuseFp16Cosine)
  }
}
