package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic column builders.
  *
  * Every primitive here has a textually-equivalent DuckDB SQL fragment in
  * [[graft.queries.Oracles]], so query outputs hash-match the driver's DuckDB
  * oracle bit-for-bit:
  *
  *   - integer arithmetic only for hashing (no murmur3/xxhash — those differ
  *     per engine),
  *   - quantised-integer dot products for vector math (no float accumulation
  *     order dependence),
  *   - exact DECIMAL accumulation for money/quantity sums, cast to double
  *     once at the end (one deterministic IEEE conversion in both engines).
  *
  * All functions are pure `Column` expressions (Catalyst higher-order
  * functions) — codegen-friendly, no UDFs, fully distributed.
  */
object CrossFns {

  /** Modulus for all polynomial hashes (fits products in int64: acc < P ~1e9,
    * acc*31 + 127 < 3.2e10; seed*h < 1e2 * 1e9 = 1e11). */
  val HashP = 1000000007L

  /** Polynomial rolling hash over codepoints:
    * fold h = (h*31 + ascii(c)) mod P, h0 = 0.
    * Fast path: the native codegen'd [[graft.expressions.CharHashExpr]]
    * (GraftFunctions.register runs lazily in Staging.tbl).
    * DuckDB equivalent: list_reduce over generate_series — see
    * [[graft.queries.Oracles]].
    */
  def charHash(s: Column): Column = call_function("graft_char_hash", s)

  /** Uniformised hash for sketching: charHash is polynomial (short strings
    * hash to small values — fine for equality/minhash, useless for order
    * statistics), so KMV-style sketches scramble it with a Knuth
    * multiplicative step: (h * 2654435761) mod P. h < P keeps the product
    * within int64. Same expression in the DuckDB oracles. */
  def scrambledHash(s: Column): Column =
    (charHash(s) * lit(2654435761L)) % HashP

  /** Reference implementation of [[charHash]] from built-in higher-order
    * functions only — differential-tested against the native expression. */
  def charHashHof(s: Column): Column = {
    val codes = transform(sequence(lit(1), length(s)), i => ascii(substr(s, i, lit(1))).cast("long"))
    val folded = aggregate(codes, lit(0L), (acc, x) => (acc * 31L + x) % HashP)
    when(s.isNull || length(s) === 0, lit(0L)).otherwise(folded)
  }

  /** Whitespace tokenisation with empty tokens dropped (leading/trailing
    * whitespace in the raw text would otherwise produce "" entries). */
  def tokens(s: Column): Column =
    filter(split(s, "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles (space-joined) from a token array; empty when the
    * doc has fewer than n tokens. Reference form for tests; the operators
    * use [[shingleHashes]] which never materialises the strings.
    *
    * PASS AN ATTRIBUTE, not an inline expression: `toks` is indexed inside
    * the per-gram lambda via element_at, and a lambda BODY re-evaluates
    * outer expressions on every invocation (HOF *arguments* evaluate once
    * per row, lambda-body captures do not) — `shingles(tokens(col), n)`
    * re-tokenises the document per gram, O(len·grams). Project the token
    * array first (`select(tokens(col).as("toks"))`), then shingle the
    * attribute — measured 4× on text_collocations. */
  def shingles(toks: Column, n: Int): Column = {
    require(n >= 1)
    val idx = sequence(lit(1), size(toks) - (n - 1))
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, (i + k).cast("int"))): _*)
    when(size(toks) >= n, transform(idx, i => gram(i))).otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle hashes for a document — the set MinHash/Jaccard
    * operate on. Native expression: hashes the n-gram windows directly off
    * the token array. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(call_function("graft_shingle_hashes", tokens(text), lit(n)))

  /** HOF reference implementation of [[shingleHashes]]. */
  def shingleHashesHof(text: Column, n: Int): Column =
    array_distinct(transform(shingles(tokens(text), n), sh => charHashHof(sh)))

  /** MinHash signature (array of NumHashes mins of the affine family
    * (31s+17)h + 97s+11 mod P) in one pass — no explode, no shuffle. */
  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    call_function("graft_minhash_sig", shingleHashes, lit(numHashes))

  /** Quantise a float/double array to integers: floor(x * 1e6).
    * float->double widening, *1e6, floor are all exact/deterministic IEEE
    * steps, identical in Spark and DuckDB — unlike decimal casts or float
    * sums. |x| <= ~1 in the embeddings table, so values fit comfortably:
    * 64-dim dot products stay < 1e14 << Long.Max. */
  def quantize(arr: Column): Column = call_function("graft_quantize", arr)

  /** HOF reference implementation of [[quantize]]. */
  def quantizeHof(arr: Column): Column =
    transform(arr, v => floor(v.cast("double") * lit(1000000.0d)).cast("long"))

  /** Integer dot product of two quantised vectors (native expression). */
  def qdot(a: Column, b: Column): Column = call_function("graft_dot_long", a, b)

  /** HOF reference implementation of [[qdot]]. */
  def qdotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity from quantised vectors: all inputs int64-exact, the
    * final expression is a fixed dag of double ops on identical operands in
    * both engines -> bit-identical result. Callers must filter zero norms. */
  def qcosine(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (sqrt(normA.cast("double")) * sqrt(normB.cast("double")))

  /** Exact money/quantity sum: accumulate as DECIMAL(18,2) (exact), convert
    * to double once. Matches `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`
    * in DuckDB. */
  def decSum2(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** As [[decSum2]] but scale 4 (for discount/tax factors). */
  def decSum4(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double")
}
