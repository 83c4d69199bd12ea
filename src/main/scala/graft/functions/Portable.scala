package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable building blocks for the LLM-data-pipeline operators
  * (dedup, similarity search, text analysis). Everything here is chosen
  * so the DuckDB oracle can reproduce results bit-for-bit:
  *
  *  - hashing is md5 (identical in both engines), with numeric hashes
  *    taken as a hex prefix: 15 hex chars = 60 bits, always positive,
  *    exactly representable in BIGINT on both sides;
  *  - floating point only ever enters as a final division/sqrt of
  *    exactly-computed integers (the same IEEE ops on the same operands
  *    are bit-identical everywhere), mirroring the cents/bps discipline
  *    of [[graft.operators.Relational]];
  *  - embeddings are quantised to milli-units (floor(x*1000)) so dot
  *    products and norms are exact BIGINT arithmetic.
  *
  * All helpers are row-local (no shuffle) and built from codegen-friendly
  * `org.apache.spark.sql.functions` — no UDFs.
  */
object Portable {

  /** Space-tokenised words with empties dropped — matches DuckDB
    * `list_filter(string_split(text, ' '), w -> w <> '')`.
    */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** 60-bit positive hash: first 15 hex chars of md5, as a long —
    * i.e. `conv(substring(md5(s), 1, 15), 16, 10)`, computed by the
    * native [[HashOps]] kernel (same value, no hex-string round trip).
    * DuckDB mirror: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    */
  def hash60(s: Column): Column = HashOps.md5_prefix60(s)

  /** 16-bit hash (first 4 hex chars of md5) for SimHash bit votes. */
  def hash16(s: Column): Column =
    conv(substring(md5(s), 1, 4), 16, 10).cast("int")

  /** The q157 integer lexical-diversity proxy over a word array:
    * `1000·|distinct| DIV |words|` — repetition-penalizing and
    * deterministic. ONE site shared by every quality-ranked consumer
    * (q157 token-budget fill, q165 keeper election) so retuning the
    * proxy can't decouple them. Caller guarantees `size(ws) > 0`.
    * The double divide + trunc ≡ integer DIV here (q173's idiv
    * argument: operands non-negative, numerator ≤ ~2·10^12 ≪ 2^53 is
    * exact in double, and the quotient can't round across an integer
    * because the gap to one is ≥ 1/2^31 ≫ half an ulp of 1000).
    * DuckDB: `(1000 * len(list_distinct(ws))) // len(ws)`.
    */
  def scoreMilli(ws: Column): Column =
    ((lit(1000L) * size(array_distinct(ws))) / size(ws)).cast("long")

  /** Word 3-gram shingles (with duplicates; wrap in array_distinct for
    * set semantics). TOTAL: arrays shorter than 3 words yield an empty
    * shingle list, matching the DuckDB mirror (`range(1, len-1)` is
    * empty there, but Spark's `sequence(1, size-2)` would DESCEND for
    * small sizes and index out of bounds / wrap negatively).
    * DuckDB: `list_transform(range(1, len(ws)-1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])`.
    */
  def wordShingles(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Milli-quantised embedding: array<long> of floor(x*1000). The
    * float→double widening is exact, so both engines floor the same
    * double. DuckDB: `list_transform(e, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))`.
    */
  def qvec(e: Column): Column =
    transform(e, x => floor(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantised vectors — native
    * codegen'd kernel (see [[ArrayOps.dot_long]]).
    */
  def dotq(a: Column, b: Column): Column = ArrayOps.dot_long(a, b)

  /** Exact integer squared L2 norm of a quantised vector. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0L), (acc, x) => acc + x * x)

  /** Cosine from exact integer dot/norms — one double division and one
    * sqrt over exactly-computed longs; bit-identical across engines.
    * Zero-norm vectors (all components quantise to 0) yield NULL on
    * both engines instead of an ANSI divide-by-zero error; oracle
    * mirror: [[sqlCosineq]].
    */
  def cosineq(dot: Column, n2a: Column, n2b: Column): Column =
    // each norm casts to double BEFORE the multiply: the long product
    // n2a*n2b overflows for large-norm/high-dim embeddings (ANSI mode
    // throws, non-ANSI wraps) while each factor is far below 2^63; the
    // oracle mirrors the same cast placement so rounding stays
    // bit-identical
    dot.cast("double") /
      sqrt(nullif(n2a.cast("double") * n2b.cast("double"), lit(0.0)))

  /** Attach a broadcast 1-row aggregate (a scalar, e.g. a corpus count)
    * to every row of `df` — the in-plan alternative to a driver-side
    * `count()` at query-build time. Plans as a BroadcastNestedLoopJoin
    * with an IdentityBroadcastMode build side of exactly one row (a
    * keyless aggregate) — the scalar-subquery shape, which
    * [[graft.PlanSpec]]'s NL-join guard recognises as bounded.
    */
  def withScalar(df: org.apache.spark.sql.DataFrame,
      scalar: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.crossJoin(broadcast(scalar))

  // ---- DuckDB oracle fragments (kept beside their Spark twins) ----

  /** DuckDB: words list from `text`. */
  val sqlWords = "list_filter(string_split(text, ' '), w -> w <> '')"

  /** DuckDB: 60-bit hash of expression `e`. */
  def sqlHash60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  def sqlHash16(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 4) AS INTEGER)"

  /** DuckDB: milli-quantised embedding list. */
  val sqlQvec =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  /** DuckDB: exact dot product of two BIGINT lists by position. */
  def sqlDotq(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])) AS BIGINT)"

  def sqlNorm2(a: String): String =
    s"CAST(list_sum(list_transform($a, x -> x*x)) AS BIGINT)"

  /** DuckDB: cosine with the same zero-norm → NULL guard as [[cosineq]]. */
  def sqlCosineq(dot: String, n2a: String, n2b: String): String =
    s"CAST($dot AS DOUBLE) / sqrt(nullif(CAST($n2a AS DOUBLE)" +
      s"*CAST($n2b AS DOUBLE), 0.0))"
}
