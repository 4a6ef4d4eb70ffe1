package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic arithmetic "randomness" shared between the Spark engine and
  * the DuckDB oracle. Everything here is pure integer arithmetic over row
  * keys, so the exact same value is computable in any SQL dialect — unlike
  * `rand(seed)` (partition-dependent) or engine-native hash functions
  * (murmur3 vs duckdb-hash never agree).
  *
  * Reference analogs: the seeded jitter in data_augmentation.py:32-53 and the
  * seeded shuffle in feature_extractor.py:146-169 use numpy/random state; the
  * engine replaces them with per-row LCG streams so results are reproducible
  * across partitionings and engines (SURVEY.md §7 "what's hard").
  */
object Hashing {
  /** Modulus for the polynomial string hash (large prime, fits sq. in i64). */
  val PolyMod: Long = 1000000007L
  val PolyBase: Long = 31L

  /** LCG constants (numerical-recipes flavor), applied mod 2^31. */
  val LcgA: Long = 1103515245L
  val LcgC: Long = 12345L
  val LcgM: Long = 2147483648L

  /** Per-row deterministic pseudo-random in [0, m): lcg(key + seed) % m. */
  def lcg(key: Column, seed: Long, m: Long): Column =
    pmod((key + lit(seed)) * lit(LcgA) + lit(LcgC), lit(LcgM)) % lit(m)

  /** DuckDB SQL text computing exactly [[lcg]] over column expression `k`. */
  def lcgSql(k: String, seed: Long, m: Long): String =
    s"(((CAST($k AS BIGINT) + $seed) * $LcgA + $LcgC) % $LcgM + $LcgM) % $LcgM % $m"

  /** Polynomial rolling hash of a string, h = (h*31 + codepoint) mod p.
    * Catalyst-native (see [[graft.functions.PolyHashExpr]]); ASCII-safe
    * cross-engine. Column form via the registered SQL function.
    */
  def polyHash(c: Column): Column = PolyHashExpr.column(c)

  /** DuckDB SQL computing exactly [[polyHash]] over string expression `s`. */
  def polyHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(split($s, ''), c -> CAST(ascii(c) AS BIGINT)))," +
      s" (a, b) -> (a * $PolyBase + b) % $PolyMod)"

  /** k-th MinHash permutation of an already-polyhashed shingle value:
    * (a_k * h + b_k) mod p, with a_k/b_k derived from k arithmetically.
    */
  def minhashPerm(h: Column, k: Int): Column =
    pmod(h * lit(permA(k)) + lit(permB(k)), lit(PolyMod))

  def minhashPermSql(h: String, k: Int): String =
    s"((($h * ${permA(k)} + ${permB(k)}) % $PolyMod) + $PolyMod) % $PolyMod"

  def permA(k: Int): Long = 2L * ((k.toLong * 7919L + 13L) % (PolyMod - 1)) + 1L
  def permB(k: Int): Long = (k.toLong * 104729L + 7L) % PolyMod
}
