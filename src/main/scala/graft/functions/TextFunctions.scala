package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis and dedup-sketch column functions for large-scale
  * training-data curation. Everything here is composed from built-in Catalyst
  * expressions (`functions._`) — codegen'd, no Scala/Python UDFs — so the hot
  * path stays inside whole-stage codegen at 100 TB.
  *
  * Scale notes per function are inline; the common theme: each sketch is a
  * narrow fixed-width column computed in one projection over the text column
  * (map-side only, no shuffle), and candidate generation joins on small keys
  * (band hashes, buckets) rather than on full text.
  */
object TextFunctions {

  /** Whitespace tokens (lowercased, empties dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Token count via the count-the-separators identity — O(len), no array. */
  def tokenCountFast(text: Column): Column =
    when(length(text) === 0, lit(0))
      .otherwise(length(text) - length(replace(text, lit(" "), lit(""))) + 1)

  /** BPE-ish subword-aware token estimate: words + digits runs + punctuation
    * runs (a cheap proxy for tokenizer length used in data curation). */
  def tokenCountBpeIsh(text: Column): Column =
    size(filter(split(text, "(?U)(?<=\\p{L})(?=[^\\p{L}])|(?<=[^\\p{L}\\s])(?=\\p{L})|\\s+"),
      t => length(t) > 0))

  /** Word k-shingles of the token array: positions 1..n-k+1, space-joined. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array())
      .otherwise(transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
  }

  /** MinHash signature (Broder 1997): for each of `numHashes` seeded hash
    * functions, the min over shingle hashes. One projection per row; the
    * signature is `numHashes` longs regardless of document size — this is the
    * column you persist/partition on at 100 TB, never the shingle sets. */
  def minhashSignature(text: Column, k: Int = 5, numHashes: Int = 32): Column = {
    val sh = shingles(text, k)
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => coalesce(array_min(transform(sh, s => xxhash64(h, s))), lit(Long.MaxValue)))
  }

  /** LSH band keys over a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature positions. Docs sharing any band key
    * are near-dup candidates → join on (band, key), never all-pairs. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(b, to_json(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))).as("key")))

  /** Estimated Jaccard similarity from two minhash signatures: fraction of
    * agreeing positions. */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact n-gram Jaccard between two texts (for verification of candidate
    * pairs — runs only on the LSH-candidate slice, never all pairs). */
  def ngramJaccard(a: Column, b: Column, k: Int = 3): Column = {
    val sa = array_distinct(shingles(a, k))
    val sb = array_distinct(shingles(b, k))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash (Charikar 2002) over whitespace tokens: per bit, the sign
    * of the sum of ±1 contributions of token hashes. Fixed 64-wide transform —
    * columnar, no UDF. Near-dups then compare by hamming distance on a long. */
  def simhash64(text: Column): Column = {
    val tokenHashes = transform(tokens(text), t => xxhash64(t))
    // bit positions unrolled at plan-build time (shift amounts must be
    // literals); the repeated tokenHashes subtree is shared by codegen's
    // common-subexpression elimination
    (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      val balance = aggregate(tokenHashes, lit(0L),
        (a, h) => a + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
      shiftleft(acc, 1).bitwiseOR(when(balance > 0, lit(1L)).otherwise(lit(0L)))
    }
  }

  /** Hamming distance between two simhash longs. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling-hash document fingerprint (winnowing-style): the `n` smallest
    * k-shingle hashes, sorted — a compact order-invariant sketch. */
  def fingerprint(text: Column, k: Int = 5, n: Int = 8): Column =
    slice(array_sort(transform(array_distinct(shingles(text, k)), s => xxhash64(s))), 1, n)

  // ---------- quality scoring (integer components — oracle-friendly) ----------

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  def letterCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "(?U)\\p{L}", ""))

  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "(?U)\\p{N}", ""))

  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "(?U)\\p{Lu}", ""))

  def stopwordCount(text: Column): Column = {
    import graft.operators.Segregate.Stopwords
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit): _*)))
  }

  /** Composite quality gate for training data: enough tokens, not digit- or
    * punctuation-dominated, has some stopwords (English-ish fluency proxy). */
  def qualityKeep(text: Column, minTokens: Int = 20): Column = {
    val nTok = tokenCountFast(text)
    (nTok >= minTokens) &&
      (digitCount(text) * 4 < length(text)) &&
      (punctCount(text) * 4 < length(text)) &&
      (stopwordCount(text) * 20 >= nTok)
  }

  // ---------- language id (n-gram / marker-word heuristic) ----------

  /** Marker words per language — tiny, embedded, deterministic. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "une", "pour"),
    "es" -> Seq("el", "la", "los", "es", "en", "que", "una", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** Best-scoring language by marker-hit count; "und" (undetermined) when no
    * marker hits. Pure column expression: one score per language, greatest-of. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = size(filter(toks, t => t.isin(markers.map(lit): _*)))
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best("score") > 0, best("lang")).otherwise(lit("und"))
  }

  // ---------- embeddings ----------

  /** Dot product of two float-array columns (zip_with + aggregate — codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSimilarity(a: Column, b: Column): Column = {
    val na = l2norm(a)
    val nb = l2norm(b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Signed-random-projection LSH bucket for cosine ANN: the sign pattern of
    * `planes` pseudo-random hyperplane dot products, packed into a long.
    * Plane component (p, i) is derived from xxhash64 — deterministic, no
    * stored plane matrix, identical on every executor. */
  def srpBucket(embedding: Column, planes: Int, dim: Int, seed: Long = 42L): Column = {
    require(planes <= 63, "bucket packs into a long")
    val signs = transform(sequence(lit(0), lit(planes - 1)), p => {
      val d = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0d),
        (acc, i) => acc +
          element_at(embedding, i + 1) *
            (pmod(xxhash64(lit(seed), p * dim + i), lit(2000001L)).cast("double") / 1000000.0d - 1.0d))
      when(d > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(signs, lit(0L), (acc, s) => shiftleft(acc, 1).bitwiseOR(s))
  }
}
