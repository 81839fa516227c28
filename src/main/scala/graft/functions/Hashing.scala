package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic integer hashing shared by the dedup/fingerprint
  * operators. Everything is explicit mod-p polynomial arithmetic —
  * NOT Spark's hash()/xxhash64 — so the DuckDB oracle reproduces the
  * values bit-exactly. All intermediates stay below 2^63 (p ≈ 1e9,
  * a*h < 1e18), so no overflow on either engine.
  */
object Hashing {

  val P = 1000000007L
  val B = 31L

  /** SimHash widening: the per-word hash is mod P (< 2^30), so a
    * SimHash built from its bits alone is ~30 bits wide — at 500k
    * docs the hash space saturates and unrelated short docs collide
    * at Hamming ≤ 1 (birthday bound). The published SimHash standard
    * (Manku, Jain & Das Sarma, WWW'07 — 64-bit fingerprints) avoids
    * this; we widen to 60 bits by stacking a bijective Lehmer-style
    * rehash of the same word hash into the high 30 bits:
    *
    *   whx = ((wh·B2 + C2) mod P) · 2^30 + wh
    *
    * Bijective because gcd(B2, P) = 1 (P prime), so distinct word
    * hashes stay distinct and the high bits add ~30 fresh bits of
    * entropy. Max value (P−1)·(2^30+1) ≈ 1.07e18 < 2^63 — no
    * overflow on either engine.
    */
  val B2 = 48271L // MINSTD Lehmer multiplier
  val C2 = 11L
  val WideShift = 1073741824L // 2^30
  val SimhashBits = 60

  /** The widened 60-bit word hash, as a formula over a bound BIGINT
    * column/name — textually identical on the Spark (expr) and
    * DuckDB (SQL) sides so the two engines stay bit-lockstep.
    */
  def wideWordHash(wh: String): String =
    s"(($wh * $B2 + $C2) % $P) * $WideShift + $wh"

  /** MinHash permutation constants (k=24): h_j(x) = (a_j·x + b_j) mod p. */
  val NumPerms = 24
  val permA: Seq[Long] = (1 to NumPerms).map(j => (j.toLong * 104729L + 12345L) % P)
  val permB: Seq[Long] = (1 to NumPerms).map(j => (j.toLong * 7919L + 54321L) % P)

  /** LSH banding: 4 bands × 6 rows (catches Jaccard ≳ 0.5 pairs with
    * high probability while keeping false candidates ~J^6 ≈ 0).
    */
  val NumBands = 4
  val RowsPerBand = 6

  // ═══════ Spark side (native Catalyst expressions — see HashExprs) ═══════

  /** Per-word polynomial hashes of trim(lower(text)), with multiplicity. */
  def wordHashes(text: Column): Column = HashExprs.token_hashes(text)

  /** Distinct word-3-gram shingle hashes of a text column. */
  def shingleHashes(text: Column): Column = HashExprs.shingle_hashes(text)

  /** Word-bigram hashes (with multiplicity) over a token-hash array. */
  def bigramHashes(wh: Column): Column = HashExprs.bigram_hashes(wh)

  /** Invertible word-bigram packs (prev·P + cur) over a token-hash
    * array — prev = pack div P, cur = pack mod P on both engines.
    */
  def bigramPacks(wh: Column): Column = HashExprs.bigram_packs(wh)

  /** All k MinHash values as one array column. */
  def minhashSig(text: Column): Column =
    HashExprs.minhash_sig(HashExprs.shingle_hashes(text))

  /** Whole-string polynomial fold (document fingerprint). */
  def charFold(c: Column): Column = HashExprs.poly_hash(c)

  /** LSH band key b (fold of the band's MinHash values). */
  def bandKey(mh: Seq[Column], b: Int): Column =
    (0 until RowsPerBand).map(r => mh(b * RowsPerBand + r))
      .foldLeft(lit(0L))((acc, m) => (acc * B + m) % P)

  // ═══════ DuckDB side ═══════

  /** Polynomial char fold (list_reduce with a prepended 0 as the seed). */
  def charFoldSql(e: String): String =
    s"list_reduce(list_concat([CAST(0 AS BIGINT)], " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * $B + b) % $P)"

  def wordHashesSql(textE: String): String =
    s"list_transform(string_split_regex(trim(lower($textE)), '\\s+'), w -> ${charFoldSql("w")})"

  /** Shingle hashes; `wh` must be a bound column name. DuckDB lambda
    * index is 1-based, so wh[i+1]/wh[i+2] align with Spark's i+2/i+3
    * over a slice starting at 1.
    */
  def shingleHashesSql(wh: String): String =
    s"list_distinct(list_transform(list_slice($wh, 1, greatest(len($wh) - 2, 0)), " +
      s"(x, i) -> (((x * $B + $wh[i + 1]) % $P) * $B + $wh[i + 2]) % $P))"

  /** Bigram hashes with multiplicity; `wh` must be a bound column name. */
  def bigramHashesSql(wh: String): String =
    s"list_transform(list_slice($wh, 1, greatest(len($wh) - 1, 0)), " +
      s"(x, i) -> (x * $B + $wh[i + 1]) % $P)"

  /** Bigram packs with multiplicity; `wh` must be a bound column name. */
  def bigramPacksSql(wh: String): String =
    s"list_transform(list_slice($wh, 1, greatest(len($wh) - 1, 0)), " +
      s"(x, i) -> x * $P + $wh[i + 1])"

  def minHashSql(shinglesE: String, j: Int): String =
    s"list_min(list_transform($shinglesE, s -> (${permA(j)} * s + ${permB(j)}) % $P))"

  def bandKeySql(mhNames: Seq[String], b: Int): String =
    (0 until RowsPerBand).map(r => mhNames(b * RowsPerBand + r))
      .foldLeft(s"CAST(0 AS BIGINT)")((acc, m) => s"(($acc) * $B + $m) % $P")
}
