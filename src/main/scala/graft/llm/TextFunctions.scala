package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-training-data pipeline
  * (builder brief: dedup, similarity, text analysis as first-class
  * engine components). Everything here is a pure, codegen'd column
  * expression — no UDFs, no Python boundary — so filters and
  * projections around these stay inside whole-stage codegen.
  *
  * Cross-engine determinism: the only hash primitive is [[hash60]]
  * (first 15 hex digits of md5 as a long), reproducible bit-for-bit in
  * DuckDB as `('0x' || substr(md5(x),1,15))::BIGINT` — md5 is a pure
  * function of the UTF-8 bytes in both engines. All derived hashing
  * (minhash, simhash, fingerprints, LSH band keys) stays below 2^62 so
  * no expression overflows under ANSI semantics in either engine.
  */
object TextFunctions {

  /** Modulus for the affine minhash family; < 2^30 so
    * `a*(h%P)+b < 2^60` never overflows a long.
    */
  val HashPrime: Long = 1000000007L

  /** 60-bit content hash: first 15 hex chars of md5, as a long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokenization (corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word w-shingles: ["a b", "b c", ...] for w=2. Empty array (not a
    * reversed sequence) when the doc has fewer than w tokens.
    */
  def wordShingles(toks: Column, w: Int = 2): Column = {
    require(w >= 2, "use tokens() for w=1")
    val sh = transform(
      sequence(lit(1), size(toks) - (w - 1)),
      i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*))
    when(size(toks) < w, array().cast("array<string>")).otherwise(sh)
  }

  /** Character n-grams of the raw text as rolling 60-bit hashes —
    * the basis of document fingerprinting. Caller guards length >= n.
    */
  def charGramHashes(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), length(text) - (n - 1)),
      i => hash60(text.substr(i, lit(n))))

  /** [[charGramHashes]] as the fused native expression
    * ([[graft.functions.CharGramHashes]]): one codegen'd pass instead
    * of an interpreted lambda + Column substring per gram. Same
    * values (WinnowFpsSpec); the HOF form above remains the
    * cross-checked specification.
    */
  def charGramHashesNative(text: Column, n: Int): Column =
    call_function("char_gram_hashes", text, lit(n))

  /** Character n-grams as strings (the features of the char-ngram
    * language-ID heuristic). Empty array below n chars — Spark's
    * sequence(1, len-2) turns DESCENDING for short strings, so the
    * guard is load-bearing.
    */
  def charGrams(text: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), length(text) - (n - 1)),
      i => text.substr(i, lit(n)))
    when(length(text) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Characteristic char-trigram profiles per language (toy-sized like
    * [[LangProfiles]]; the operator shape — per-row gram filter counts
    * + argmax — is what scales, not the profile quality). Alphabetic
    * scripts only: CJK char-ngram LID uses unigrams, a different n.
    */
  val LangTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "he ", " th"),
    "de" -> Seq("der", "und", "sch", "ein", "ich"),
    "es" -> Seq("que", "los", "ent", " el", "ado"),
    "fr" -> Seq("les", " le", "des", "une", "eur")
  )

  // ---- MinHash ----------------------------------------------------

  /** Signature width / LSH banding: k = bands × rowsPerBand. With
    * r=2, b=12 the S-curve threshold is (1/b)^(1/r) ≈ 0.29 — tuned
    * for the bigram-shingle near-dup band in the corpus (planted
    * near-dups have shingle-jaccard 0.3–1.0; background ≈ 0.03).
    */
  val MinHashK = 24
  val MinHashBands = 12
  val MinHashRows = 2

  /** LSH S-curve collision probability: P(candidate | jaccard = s)
    * for (b bands × r rows) banding = 1 − (1 − s^r)^b.
    */
  def lshCollisionProb(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** Choose (bands, rows) for a target jaccard threshold within a
    * signature budget k: among all exact factorizations b·r = k, pick
    * the one whose S-curve inflection (1/b)^(1/r) lands closest to
    * the target (ties → more rows, i.e. the steeper curve with fewer
    * false positives). This is the knob a 100 TB dedup run tunes
    * FIRST: bands multiply the candidate-join fan-out (each doc emits
    * b band keys), rows sharpen selectivity inside a band — the
    * Σ bucket² join cost follows directly from this choice.
    */
  def lshParams(threshold: Double, k: Int = MinHashK): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    require(k >= 1, s"k >= 1: $k")
    val opts = for (r <- 1 to k if k % r == 0) yield (k / r, r)
    opts.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - threshold), -r)
    }
  }

  /** Fixed affine family h_i(x) = (A(i)·(hash60(x) mod P) + B(i)) mod P.
    * Constants are shared verbatim with the DuckDB oracle SQL.
    */
  val MinHashA: IndexedSeq[Long] =
    (1 to MinHashK).map(i => (2654435761L * i) % HashPrime)
  val MinHashB: IndexedSeq[Long] =
    (1 to MinHashK).map(i => (40503L * i * i + 2654435769L) % HashPrime)

  /** Shingle array → 60-bit hashes mod P, computed ONCE per shingle.
    * Keep this a separate materialized column: inlining it into the k
    * signature mins would re-run md5 k× per shingle (a 24× slowdown
    * measured at sf0.1).
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, t => hash60(t) % HashPrime)

  /** k-wide minhash signature over pre-hashed shingles ([[shingleHashes]]):
    * k cheap affine-mod array_mins, no rehashing.
    */
  def minhashSigFromHashes(hs: Column): Column =
    array((0 until MinHashK).map { i =>
      array_min(transform(hs,
        h => (lit(MinHashA(i)) * h + lit(MinHashB(i))) % HashPrime))
    }: _*)

  /** k-wide minhash signature as ONE native codegen'd expression
    * ([[graft.functions.MinHashSig]], registered by GraftExtensions):
    * md5 once per shingle + all k affine mins in a single JVM pass,
    * replacing [[shingleHashes]]+[[minhashSigFromHashes]] in the hot
    * path. Bit-identical output (asserted in MinHashSigSpec); the HOF
    * forms remain as the cross-checked specification.
    */
  def minhashSig(shingles: Column): Column =
    call_function("minhash_sig", shingles)

  /** Fused text → signature ([[graft.functions.MinHashSigText]]):
    * tokenize, w-shingle and all k affine mins in ONE codegen'd pass
    * over the raw text. The composed `minhashSig(wordShingles(tokens))`
    * form carries higher-order functions, which are CodegenFallback in
    * Spark — the whole projection dropped out of WholeStageCodegen and
    * `split(text)` was re-evaluated inside the transform lambda per
    * element (O(tokens²) per doc). Bit-identical output (MinHashSigSpec).
    */
  def minhashSigText(text: Column, w: Int = 2): Column =
    call_function("minhash_sig_text", text, lit(w))

  /** LSH band key for band b: hash of the band's signature slice. */
  def bandKey(sig: Column, b: Int): Column =
    hash60(concat_ws(",",
      (0 until MinHashRows).map(r =>
        element_at(sig, b * MinHashRows + r + 1).cast("string")): _*))

  /** Count of equal positions between two k-wide signatures. */
  def sigMatches(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)

  // ---- SimHash ----------------------------------------------------

  val SimHashBits = 16

  /** 16-bit simhash over the token multiset (frequency-weighted: a
    * token occurring twice votes twice). Near-dup docs land at small
    * hamming distance; the high byte is a coarse blocking bucket.
    */
  def simhash(toks: Column): Column = simhashFromHashes(transform(toks, t => hash60(t)))

  /** Simhash over ALREADY-MATERIALIZED per-token hashes. Prefer this
    * with a separately-projected hash column: the 16 bit-votes below
    * each reference the array, and inlining a md5 transform here
    * re-hashes every token 16x (HOFs are interpreted — no
    * subexpression elimination across uses).
    */
  def simhashFromHashes(hs: Column): Column =
    (0 until SimHashBits).map { j =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ---- Language ID / quality --------------------------------------

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Real deployments would use larger lists;
    * the operator shape (array filter + argmax) is what scales.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "y", "en", "que"),
    "fr" -> Seq("le", "et", "les", "des", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在")
  )

  /** Count of tokens contained in a fixed word list. */
  def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** argmax over per-language score columns; ties break by profile
    * order (a when-chain: the first profile whose score is >= all
    * later ones wins — mirrored verbatim as a CASE chain in the
    * oracle). Pass ALREADY-MATERIALIZED score columns: each score is
    * referenced up to |langs| times here, and inlining a token-array
    * HOF that many times re-tokenizes per comparison.
    */
  def predictLangFromScores(scored: Seq[(String, Column)]): Column =
    scored.init.zipWithIndex.foldRight(lit(scored.last._1): Column) {
      case (((lang, score), i), rest) =>
        val later = scored.drop(i + 1).map(_._2)
        when(later.map(score >= _).reduce(_ && _), lang).otherwise(rest)
    }

  /** Convenience single-expression form (tests, small data). */
  def predictLang(toks: Column): Column =
    predictLangFromScores(LangProfiles.map { case (lang, words) => lang -> hits(toks, words) })
}
