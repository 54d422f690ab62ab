package graft

/** Generators for the DuckDB-side oracle SQL that replays the engine's
  * xxhash64-based sketch functions bit-for-bit.
  *
  * The engine's text sketches (token_hashes / shingle_hashes ->
  * simhash64 / minhash_signature, TextExpressions.scala) all bottom out
  * in xxhash64 with seed 42 — Spark's own hash (catalyst XXH64). DuckDB
  * has no xxhash64, so the oracle replays the full algorithm (public
  * xxHash spec: 32-byte stripe accumulators, 8/4/1-byte tails,
  * avalanche) in SQL: all arithmetic is HUGEINT with explicit mod-2^64,
  * and 64x64-bit multiplies are split at 32 bits so intermediates stay
  * under 2^97 (HUGEINT caps at 2^127-1). The generated chain is big
  * (~25 KB of SQL) but mechanical — built here from the same small
  * combinators a reader can check against the spec, exactly like the
  * FNV-1a replay in q45's oracle, and validated against Spark's
  * `xxhash64` output over empty/ascii/unicode/1..100-byte strings
  * including the >=32-byte stripe path.
  *
  * This turns the sketch operators — previously `no_oracle` by design —
  * into hash-checked battery entries (q71/q72): any drift in
  * tokenization, hashing, bit-voting, or permutation-mixing
  * hash-mismatches against DuckDB.
  */
object OracleSql {
  private val M  = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val H  = "4294967296"           // 2^32

  /** (a*b) mod 2^64 via 32-bit split of a: a_lo*b + ((a_hi*b_lo) mod
    * 2^32)<<32, every intermediate < 2^97. */
  private def mul(a: String, b: String): String =
    s"(((($a) % $H) * ($b) + (((($a) // $H) * (($b) % $H)) % $H) * $H) % $M)"

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${1L << r} + ($x) // ${BigInt(1) << (64 - r)}) % $M)"

  private def xorm(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  /** xxh64 round: rotl(acc + lane*P2, 31) * P1. */
  private def rnd(acc: String, lane: String): String =
    mul(rotl(s"((($acc) + ${mul(lane, P2)}) % $M)", 31), P1)

  /** Little-endian 8-byte load from the 1-based HUGEINT byte list `b`
    * at 0-based offset expression `off`. */
  private def le8(off: String): String =
    (0 until 8).map(j => s"b[($off) + ${j + 1}] * ${1L << (8 * j)}").mkString("(", " + ", ")")

  private def le4(off: String): String =
    (0 until 4).map(j => s"b[($off) + ${j + 1}] * ${1L << (8 * j)}").mkString("(", " + ", ")")

  private def merge(h: String, v: String): String =
    s"((${mul(xorm(h, rnd("0", v)), P1)} + $P4) % $M)"

  private def vinit(i: Int): String = {
    val m = BigInt(1) << 64
    val v = i match {
      case 1 => (BigInt(42) + BigInt(P1) + BigInt(P2)) mod m
      case 2 => BigInt(42) + BigInt(P2)
      case 3 => BigInt(42)
      case 4 => (BigInt(42) - BigInt(P1)) mod m
    }
    s"CAST('$v' AS HUGEINT)"
  }

  /** Stripe accumulator v_i folded over the 32-byte blocks. */
  private def vreduce(i: Int): String = {
    val lane = le8(s"s * 32 + ${8 * (i - 1)}")
    s"CASE WHEN ns > 0 THEN list_reduce(list_prepend(${vinit(i)}, " +
      s"list_transform(range(0, ns), s -> $lane)), (acc, lane) -> ${rnd("acc", "lane")}) " +
      "ELSE CAST(0 AS HUGEINT) END"
  }

  /** CTE chain from relation `src(idCols..., strCol)` to
    * `<p>hashed(idCols..., hfin)` where hfin = unsigned xxhash64(seed
    * 42) of strCol's UTF-8 bytes, as HUGEINT in [0, 2^64). Merge rounds
    * are one CTE column each — nesting them textually explodes 2^4x.
    * `p` prefixes every CTE name so one query can hash two different
    * relations (e.g. shingles, then band strings). */
  private def xxhChain(src: String, idCols: Seq[String], strCol: String, p: String = "x"): String = {
    val ids = idCols.mkString(", ")
    val hsum = s"((${rotl("v1", 1)} + ${rotl("v2", 7)} + ${rotl("v3", 12)} + ${rotl("v4", 18)}) % $M)"
    val tail8Body = s"((${mul(rotl(xorm("acc", rnd("0", "lane")), 27), P1)} + $P4) % $M)"
    val tail4 =
      s"CASE WHEN n - off4 >= 4 THEN ((${mul(rotl(xorm("h2", mul(le4("off4"), P1)), 23), P2)} + $P3) % $M) ELSE h2 END"
    val tail1Body = mul(rotl(xorm("acc", s"(lane * $P5) % $M"), 11), P1)
    val seedP5 = (BigInt(42) + BigInt(P5)) mod (BigInt(1) << 64)
    s"""${p}b AS (
       |  SELECT $ids, octet_length(encode($strCol)) AS n, octet_length(encode($strCol)) // 32 AS ns,
       |    list_transform(range(1, octet_length(encode($strCol)) + 1), i ->
       |      CAST((strpos('0123456789ABCDEF', substr(hex(encode($strCol)), 2 * i - 1, 1)) - 1) * 16
       |         + (strpos('0123456789ABCDEF', substr(hex(encode($strCol)), 2 * i, 1)) - 1) AS HUGEINT)) AS b
       |  FROM $src
       |), ${p}v AS (
       |  SELECT *, ${vreduce(1)} AS v1, ${vreduce(2)} AS v2, ${vreduce(3)} AS v3, ${vreduce(4)} AS v4 FROM ${p}b
       |), ${p}h AS (
       |  SELECT *, $hsum AS hs FROM ${p}v
       |), ${p}m1 AS (SELECT *, ${merge("hs", "v1")} AS m1 FROM ${p}h
       |), ${p}m2 AS (SELECT *, ${merge("m1", "v2")} AS m2 FROM ${p}m1
       |), ${p}m3 AS (SELECT *, ${merge("m2", "v3")} AS m3 FROM ${p}m2
       |), ${p}m4 AS (
       |  SELECT *, (CASE WHEN n >= 32 THEN ${merge("m3", "v4")}
       |                  ELSE CAST('$seedP5' AS HUGEINT) END + n) % $M AS h1
       |  FROM ${p}m3
       |), ${p}8 AS (
       |  SELECT *, list_reduce(list_prepend(h1,
       |      list_transform(range(ns * 32, ns * 32 + ((n - ns * 32) // 8) * 8, 8), o -> ${le8("o")})),
       |      (acc, lane) -> $tail8Body) AS h2,
       |    ns * 32 + ((n - ns * 32) // 8) * 8 AS off4
       |  FROM ${p}m4
       |), ${p}4 AS (
       |  SELECT *, $tail4 AS h3, off4 + CASE WHEN n - off4 >= 4 THEN 4 ELSE 0 END AS off1
       |  FROM ${p}8
       |), ${p}1 AS (
       |  SELECT *, list_reduce(list_prepend(h3,
       |      list_transform(range(off1, n), o -> b[o + 1])),
       |      (acc, lane) -> $tail1Body) AS h4
       |  FROM ${p}4
       |), ${p}a1 AS (SELECT *, ${mul(xorm("h4", s"h4 // ${1L << 33}"), P2)} AS a1 FROM ${p}1
       |), ${p}a2 AS (SELECT *, ${mul(xorm("a1", s"a1 // ${1L << 29}"), P3)} AS a2 FROM ${p}a1
       |), ${p}hashed AS (
       |  SELECT $ids, ${xorm("a2", s"a2 // ${1L << 32}")} AS hfin FROM ${p}a2
       |)""".stripMargin
  }

  /** Unsigned HUGEINT in [0, 2^64) -> two's-complement BIGINT. */
  private def signed(u: String): String =
    s"CASE WHEN $u >= CAST('9223372036854775808' AS HUGEINT) " +
      s"THEN CAST($u - CAST('$M' AS HUGEINT) AS BIGINT) ELSE CAST($u AS BIGINT) END"

  /** Shared simhash CTEs: documents -> `sim(doc_id, simhash)` —
    * tokenize, xxhash64 each token, +-1 vote per bit, sign -> bit;
    * token-less docs are absent from `sim` (the engine's NULL). */
  private def simhashCtes: String =
    s"""tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS toks
       |  FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(toks) AS t FROM tk
       |), ${xxhChain("tok", Seq("doc_id", "t"), "t")},
       |bits AS (
       |  SELECT doc_id, bit,
       |         sum(CASE WHEN (CAST(hfin AS UBIGINT) >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS tally
       |  FROM xhashed CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) bb
       |  GROUP BY doc_id, bit
       |), sim AS MATERIALIZED (
       |  -- pair oracles reference sim 3x; one evaluation of the
       |  -- per-token xxhash64 + bit-vote chain, not three
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN tally > 0 THEN
       |               CASE WHEN bit = 63 THEN CAST('-9223372036854775808' AS BIGINT)
       |                    ELSE CAST(1 AS BIGINT) << bit END
       |             ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |)""".stripMargin

  /** q71 oracle: simhash64(token_hashes(text)) per document. */
  def simhashSql: String =
    s"""WITH $simhashCtes
       |SELECT d.doc_id, s.simhash
       |FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q48 oracle: the FULL SimHash pairing (Dedup.simHashPairs) replayed —
    * sketches from [[simhashCtes]], pigeonhole bands ((maxHamming+1)
    * width-(64/nBands) slices; arithmetic-shift fill bits die under the
    * band mask exactly as in Spark's `shiftright(sh, b*width) & mask`),
    * bucket-cap blocking, distinct pairs, exact Hamming filter. */
  def simhashPairsSql(maxHamming: Int, maxBucketSize: Int): String = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val mask = (1L << width) - 1
    s"""WITH $simhashCtes,
       |bnd AS (
       |  SELECT doc_id, bi AS band, (simhash >> (bi * $width)) & $mask AS bits
       |  FROM sim CROSS JOIN (SELECT unnest(range(0, $nBands)) AS bi) bb
       |), ok AS (
       |  SELECT band, bits FROM bnd GROUP BY band, bits
       |  HAVING count(*) BETWEEN 2 AND $maxBucketSize
       |), pr AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM bnd l
       |  JOIN bnd r ON l.band = r.band AND l.bits = r.bits AND l.doc_id < r.doc_id
       |  JOIN ok o ON o.band = l.band AND o.bits = l.bits
       |), ham AS (
       |  SELECT p.id_a, p.id_b,
       |    -- per-bit compare on the SIGNED value: arithmetic-shift fill
       |    -- never reaches `& 1` (DuckDB refuses negative->UBIGINT casts)
       |    CAST(list_sum(list_transform(range(0, 64), bit ->
       |      CASE WHEN ((a.simhash >> bit) & 1) <> ((b.simhash >> bit) & 1)
       |           THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
       |  FROM pr p
       |  JOIN sim a ON a.doc_id = p.id_a
       |  JOIN sim b ON b.doc_id = p.id_b
       |)
       |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val Gold = "11400714819323198485" // 0x9E3779B97F4A7C15
  private val Mx1  = "13787848793156543929" // 0xBF58476D1CE4E5B9 (SplitMix64)
  private val Mx2  = "10723151780598845931" // 0x94D049BB133111EB

  /** The shared MinHash signature CTEs: documents -> `sg(doc_id, sig)`
    * where sig is the k-element signed signature list (w-token shingles,
    * whole text if < w tokens; xxhash64 each; per permutation j the min
    * of SplitMix64(h + (j+1)*golden) under SIGNED Long ordering — the
    * engine compares permuted hashes as signed longs. Duplicate shingles
    * don't affect a min, so the engine's first-occurrence dedup needs no
    * replay). */
  private def sigCtes(k: Int, w: Int): String = {
    val z0 = s"((hfin + (j + 1) * $Gold) % $M)"
    s"""tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS toks
       |  FROM documents
       |), shl AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) >= $w
       |      THEN list_transform(range(1, len(toks) - $w + 2), i -> array_to_string(toks[i:i+${w - 1}], ' '))
       |      ELSE [array_to_string(toks, ' ')] END AS shingles
       |  FROM tk
       |), tok AS (
       |  SELECT doc_id, unnest(shingles) AS t FROM shl
       |), ${xxhChain("tok", Seq("doc_id", "t"), "t")},
       |perm AS (
       |  SELECT doc_id, j, $z0 AS z0
       |  FROM xhashed CROSS JOIN (SELECT unnest(range(0, $k)) AS j) jj
       |), mx1 AS (SELECT doc_id, j, ${mul(xorm("z0", s"z0 // ${1L << 30}"), Mx1)} AS z1 FROM perm
       |), mx2 AS (SELECT doc_id, j, ${mul(xorm("z1", s"z1 // ${1L << 27}"), Mx2)} AS z2 FROM mx1
       |), mx3 AS (
       |  SELECT doc_id, j, ${signed(xorm("z2", s"z2 // ${1L << 31}"))} AS z3 FROM mx2
       |), mn AS (
       |  SELECT doc_id, j, min(z3) AS mh FROM mx3 GROUP BY doc_id, j
       |), sg AS MATERIALIZED (
       |  -- candidate oracles reference sg 3x (banding + both scoring
       |  -- joins); one evaluation of the shingle/SplitMix64 chain
       |  SELECT doc_id, list(mh ORDER BY j) AS sig FROM mn GROUP BY doc_id
       |)""".stripMargin
  }

  /** q72 oracle: minhash_signature(shingle_hashes(text, w), k) per doc.
    * The signature list is serialized comma-joined (matching the Spark
    * side's concat_ws) so the driver's scalar comparator can hash it. */
  def minhashSigSql(k: Int, w: Int): String =
    s"""WITH ${sigCtes(k, w)}
       |SELECT doc_id, array_to_string(sig, ',') AS sig FROM sg ORDER BY doc_id""".stripMargin

  /** Packed hyperplane bucket of `vec` against the row-major plane list
    * `pl` (columns `p` = plane count and `dim` in scope): bit j set iff
    * the j-th dot product is strictly positive — HyperplaneBucket's
    * semantics, same sequential float->double accumulation order. */
  private def bucketExpr(vec: String, pl: String): String =
    s"""list_sum(list_transform(range(0, p), j ->
       |      CASE WHEN list_sum(list_transform(range(1, dim + 1), ii ->
       |                   CAST($vec[ii] AS DOUBLE) * $pl[j * dim + ii])) > 0
       |           THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END))""".stripMargin

  /** q51 oracle: the FULL multi-table multi-probe LSH ANN query
    * (SimilaritySearch.annTopK) replayed exactly. Everything is
    * deterministic: hyperplanes come from a SplitMix64 stream
    * (makePlanes: value i of table t = mix(42 + 7919t + i*golden),
    * signed, /Long.MaxValue), buckets are strict-positive dot-product
    * sign bits, probes are the query bucket plus its 1-bit flips per
    * table, and the final top-k is the exact-cosine scan over the
    * probed union (q50's machinery). Plane count replays autoPlanes:
    * floor(ln(n/8k)/ln 2) clamped to [1,24] — bit-identical here
    * because n/target sits nowhere near a power-of-2 boundary at the
    * test scales. */
  /** Shared plane-generation CTEs: given `np(p)` and `dm(dim)` CTEs,
    * emits `pls(t, pl)` — the row-major hyperplane list per hash table,
    * replaying makePlanes' SplitMix64 stream exactly. */
  private def planeCtes(nTables: Int, seedBase: Long): String =
    s"""pli AS (
       |  SELECT t, unnest(range(1, p * dim + 1)) AS i, p, dim
       |  FROM (SELECT unnest(range(0, $nTables)) AS t) tt, np, dm
       |), pl0 AS (
       |  SELECT t, i, (($seedBase + 7919 * t + i * $Gold) % $M) AS z0 FROM pli
       |), pl1 AS (SELECT t, i, ${mul(xorm("z0", s"z0 // ${1L << 30}"), Mx1)} AS z1 FROM pl0
       |), pl2 AS (SELECT t, i, ${mul(xorm("z1", s"z1 // ${1L << 27}"), Mx2)} AS z2 FROM pl1
       |), pl3 AS (
       |  SELECT t, i,
       |    CAST(${signed(xorm("z2", s"z2 // ${1L << 31}"))} AS DOUBLE) / 9223372036854775807.0 AS plane
       |  FROM pl2
       |), pls AS (
       |  SELECT t, list(plane ORDER BY i) AS pl FROM pl3 GROUP BY t
       |)""".stripMargin

  /** q53 oracle: the FULL banded-LSH embedding near-dup pipeline
    * (SimilaritySearch.embeddingDupPairs, non-exact path) replayed —
    * single hyperplane table (t = 0, seed 42, the same SplitMix64
    * stream as [[annLshSql]]), strict-positive sign-bit buckets, the
    * bucket cut into nBands band slices, capped blocking, exact cosine
    * over the candidate pairs, threshold. The blocking itself is part
    * of the replay, so the oracle checks recall-relevant drift (a
    * dropped band, a wrong mask) — not just the cosine math the q64
    * exact twin already pins. */
  def embeddingDupPairsSql(threshold: Double, nPlanes: Int = 10,
                           nBands: Int = 2, maxBucketSize: Int = 500): String = {
    val width = nPlanes / nBands
    val mask = (1 << width) - 1
    s"""WITH dm AS (
       |  SELECT len(embedding) AS dim FROM embeddings WHERE len(embedding) > 0 LIMIT 1
       |), np AS (
       |  SELECT $nPlanes AS p
       |), ${planeCtes(1, 42L)},
       |cb AS MATERIALIZED (
       |  SELECT e.vec_id AS id, ${bucketExpr("e.embedding", "pls.pl")} AS bucket
       |  FROM embeddings e, pls, np, dm
       |), bnd AS (
       |  SELECT id, bi AS band, (bucket >> (bi * $width)) & $mask AS bits
       |  FROM cb CROSS JOIN (SELECT unnest(range(0, $nBands)) AS bi) bb
       |), ok AS (
       |  SELECT band, bits FROM bnd GROUP BY band, bits
       |  HAVING count(*) BETWEEN 2 AND $maxBucketSize
       |), pr AS (
       |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
       |  FROM bnd l
       |  JOIN bnd r ON l.band = r.band AND l.bits = r.bits AND l.id < r.id
       |  JOIN ok o ON o.band = l.band AND o.bits = l.bits
       |), sims AS (
       |  SELECT p.id_a, p.id_b,
       |    list_sum(list_transform(range(1, len(a.embedding) + 1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM pr p
       |  JOIN embeddings a ON a.vec_id = p.id_a
       |  JOIN embeddings b ON b.vec_id = p.id_b
       |)
       |SELECT id_a, id_b, dot / (sqrt(na) * sqrt(nb)) AS cosine
       |FROM sims WHERE dot / (sqrt(na) * sqrt(nb)) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** autoPlanes replay: floor(ln(n/8k)/ln 2) clamped to [1,24]. */
  private def autoPlanesCte(k: Int): String =
    s"""np AS (
       |  SELECT greatest(1, least(24, CAST(floor(ln(count(*) / ${8.0 * k}) / ln(2)) AS INTEGER))) AS p
       |  FROM embeddings
       |)""".stripMargin

  def annLshSql(k: Int, nTables: Int = 4, seedBase: Long = 42L): String = {
    s"""WITH q AS (
       |  SELECT embedding AS qe, len(embedding) AS dim FROM embeddings WHERE vec_id = 0
       |), dm AS (
       |  SELECT dim FROM q
       |), ${autoPlanesCte(k)}, ${planeCtes(nTables, seedBase)}, qb AS (
       |  SELECT t, pl, ${bucketExpr("qe", "pl")} AS qbucket FROM pls, q, np
       |), pr AS (
       |  SELECT t, pl,
       |    list_prepend(qbucket, list_transform(range(0, p), b2 -> xor(qbucket, CAST(1 AS BIGINT) << b2))) AS probes
       |  FROM qb, np
       |), cand AS (
       |  SELECT DISTINCT e.vec_id
       |  FROM embeddings e, pr, np, q
       |  WHERE list_contains(pr.probes, ${bucketExpr("e.embedding", "pr.pl")})
       |), sims AS (
       |  SELECT e.vec_id,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id, q
       |)
       |SELECT vec_id, dot / (sqrt(na) * sqrt(nb)) AS cosine
       |FROM sims ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin
  }

  /** q52 oracle: the multi-table multi-probe k-NN JOIN
    * (SimilaritySearch.knnJoin) replayed exactly — same plane streams
    * and bucket bits as [[annLshSql]], per-query 1-bit-flip probes, the
    * maxBucketSize hot-bucket drop, exact interleaved-accumulator
    * cosine (per-accumulator order is sequential either way), and
    * row_number ranking tie-broken by neighbor_id. */
  def knnJoinSql(k: Int, maxQueryId: Long, nTables: Int = 4, seedBase: Long = 42L,
                 maxBucketSize: Int = 10000): String = {
    s"""WITH dm AS (
       |  SELECT len(embedding) AS dim FROM embeddings WHERE len(embedding) > 0 LIMIT 1
       |), ${autoPlanesCte(k)}, ${planeCtes(nTables, seedBase)},
       |cb AS (
       |  SELECT e.vec_id AS neighbor_id, pls.t, ${bucketExpr("e.embedding", "pls.pl")} AS bucket
       |  FROM embeddings e, pls, np, dm
       |), ok AS (
       |  SELECT t, bucket FROM cb GROUP BY t, bucket HAVING count(*) <= $maxBucketSize
       |), qbk AS (
       |  SELECT e.vec_id AS query_id, pls.t, ${bucketExpr("e.embedding", "pls.pl")} AS bucket
       |  FROM embeddings e, pls, np, dm WHERE e.vec_id < $maxQueryId
       |), probes AS (
       |  SELECT query_id, t,
       |    unnest(list_prepend(bucket, list_transform(range(0, p), b2 -> xor(bucket, CAST(1 AS BIGINT) << b2)))) AS bucket
       |  FROM qbk, np
       |), cand AS (
       |  SELECT DISTINCT pr.query_id, cb.neighbor_id
       |  FROM probes pr
       |  JOIN cb ON cb.t = pr.t AND cb.bucket = pr.bucket
       |  JOIN ok ON ok.t = cb.t AND ok.bucket = cb.bucket
       |), sc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    list_sum(list_transform(range(1, len(nv.embedding) + 1),
       |      i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(nv.embedding[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(qv.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(nv.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM cand c
       |  JOIN embeddings qv ON qv.vec_id = c.query_id
       |  JOIN embeddings nv ON nv.vec_id = c.neighbor_id
       |  WHERE c.query_id != c.neighbor_id
       |), cs AS (
       |  SELECT query_id, neighbor_id,
       |         CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot / (sqrt(na) * sqrt(nb)) END AS cosine
       |  FROM sc
       |), rk AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS "rank"
       |  FROM cs WHERE cosine IS NOT NULL
       |)
       |SELECT query_id, neighbor_id, cosine, "rank" FROM rk
       |WHERE "rank" <= $k ORDER BY query_id, "rank"""".stripMargin
  }

  /** q91 oracle: hybrid RRF retrieval replayed exactly. Lexical branch
    * = q42's tokenization replay + (overlap DESC, tf DESC, id) ranking;
    * vector branch = q56's cosine replay + (cosine DESC, id) ranking;
    * fusion = COALESCE'd 1/(rrfK+rank) terms summed lex-then-vec — RRF
    * uses only integer ranks and fixed-order double division, which is
    * why this hybrid is hash-checkable while BM25+cosine score mixing
    * (transcendental idf) would not be. */
  def hybridTopKSql(queryTokens: Seq[String], k: Int, nPerList: Int, rrfK: Int): String = {
    val qlist = queryTokens.map(_.toLowerCase).distinct
      .map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH lexall AS (
       |  SELECT doc_id AS id,
       |    CAST(len(list_distinct(list_filter(toks, t -> list_contains($qlist, t)))) AS BIGINT) AS overlap,
       |    CAST(len(list_filter(toks, t -> list_contains($qlist, t))) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                                   x -> len(x) > 0) AS toks
       |        FROM documents)
       |), lex AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY overlap DESC, tf DESC, id) AS BIGINT) AS lex_rank
       |  FROM lexall WHERE overlap > 0
       |  ORDER BY overlap DESC, tf DESC, id LIMIT $nPerList
       |), q AS (
       |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
       |), sims AS (
       |  SELECT e.vec_id,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM embeddings e, q
       |), vec AS (
       |  SELECT vec_id AS id,
       |    CAST(row_number() OVER (ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS BIGINT) AS vec_rank
       |  FROM sims WHERE na <> 0 AND nb <> 0
       |  ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id LIMIT $nPerList
       |), fused AS (
       |  SELECT COALESCE(lex.id, vec.id) AS id,
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + lex_rank), 0) +
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + vec_rank), 0) AS rrf_score,
       |    lex_rank, vec_rank
       |  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
       |)
       |SELECT id, rrf_score, lex_rank, vec_rank FROM fused
       |ORDER BY rrf_score DESC, id LIMIT $k""".stripMargin
  }

  /** q140/q146 oracle: quantized BM25 top-k replayed over documents.
    * Shared by the scan path (q140) and the inverted-index path (q146)
    * — a hash match on q146 therefore proves the whole
    * write-index → prune → probe round trip returns exactly the
    * scan-path answer. */
  /** The quantized-BM25 scoring CTE chain (`tk`/`base`/`stats`/`tf`/
    * `dfc`/`scored`) — ONE definition shared by q140/q146's top-k and
    * q143's hybrid, mirroring the Scala side's shared `bm25ContribU`:
    * the oracles can no more drift apart than the operators can. */
  private def bm25ScoredCtes(qlist: String): String =
    s"""tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS t
       |  FROM documents
       |), base AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |         list_filter(t, x -> list_contains($qlist, x)) AS m
       |  FROM tk
       |), stats AS (
       |  SELECT sum(dl) AS sumdl, count(*) AS ndocs FROM base
       |), tf AS (
       |  SELECT doc_id, dl, token, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(m) AS token FROM base)
       |  GROUP BY 1, 2, 3
       |), dfc AS (
       |  SELECT token, count(*) AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT tf.doc_id, tf.token,
       |    CAST(round(
       |      CAST(CAST(round(ln((ndocs - df + 0.5) / (df + 0.5) + 1) * 1000000) AS BIGINT) AS DOUBLE)
       |      * ((CAST(tf AS DOUBLE) * 2.25)
       |         / (CAST(tf AS DOUBLE)
       |            + 1.25 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
       |                                     / (CAST(sumdl AS DOUBLE) / CAST(ndocs AS DOUBLE))))))
       |    ) AS BIGINT) AS cu
       |  FROM tf JOIN dfc USING (token) CROSS JOIN stats
       |)""".stripMargin

  private def sq(t: String): String = t.replace("'", "''")

  private def tokenList(queryTokens: Seq[String]): String =
    queryTokens.map(_.toLowerCase).distinct.map(t => s"'${sq(t)}'").mkString("[", ", ", "]")

  def bm25TopKSql(queryTokens: Seq[String], k: Int): String =
    s"""WITH ${bm25ScoredCtes(tokenList(queryTokens))}
       |SELECT doc_id, CAST(sum(cu) AS DOUBLE) / 1000000.0 AS bm25
       |FROM scored GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin

  /** q154 oracle: batch BM25 — the scoring chain runs once over the
    * union of all query tokens (df is query-independent), contributions
    * fan out to (qid, doc) through the literal query-token table, each
    * query ranks its own top-k. */
  def bm25MultiTopKSql(queries: Seq[(Long, String)], k: Int): String = {
    val allTokens = queries.flatMap(_._2.toLowerCase.trim.split("\\s+"))
      .filter(_.nonEmpty).distinct
    val qvals = queries.flatMap { case (qid, text) =>
      text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct
        .map(t => s"($qid, '${sq(t)}')")
    }.mkString(", ")
    s"""WITH ${bm25ScoredCtes(tokenList(allTokens))}, qt(qid, token) AS (
       |  VALUES $qvals
       |), per AS (
       |  SELECT qt.qid, scored.doc_id, sum(cu) AS su
       |  FROM scored JOIN qt USING (token) GROUP BY 1, 2
       |), ranked AS (
       |  SELECT qid, doc_id, CAST(su AS DOUBLE) / 1000000.0 AS bm25,
       |         CAST(row_number() OVER (PARTITION BY qid
       |           ORDER BY CAST(su AS DOUBLE) / 1000000.0 DESC, doc_id) AS BIGINT) AS "rank"
       |  FROM per
       |)
       |SELECT qid, doc_id, bm25, "rank" FROM ranked WHERE "rank" <= $k
       |ORDER BY qid, "rank"""".stripMargin
  }

  /** q143 oracle: hybrid RRF with the TRUE-BM25 lexical arm (the
    * mixing this file's q91 comment once ruled out — the q137/q140
    * quantization made the idf replayable). Lexical branch = q140's
    * quantized BM25 CTE ranked (bm25 DESC, id); vector branch and
    * fusion identical to [[hybridTopKSql]]. k1=1.25 / b=0.75 appear as
    * the exact binary literals 2.25 / 1.25 / 0.25 / 0.75. */
  def hybridBm25TopKSql(queryTokens: Seq[String], k: Int, nPerList: Int, rrfK: Int): String = {
    s"""WITH ${bm25ScoredCtes(tokenList(queryTokens))}, bm AS (
       |  SELECT doc_id AS id, CAST(sum(cu) AS DOUBLE) / 1000000.0 AS bm25
       |  FROM scored GROUP BY doc_id
       |), lex AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY bm25 DESC, id) AS BIGINT) AS lex_rank
       |  FROM bm ORDER BY bm25 DESC, id LIMIT $nPerList
       |), q AS (
       |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
       |), sims AS (
       |  SELECT e.vec_id,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM embeddings e, q
       |), vec AS (
       |  SELECT vec_id AS id,
       |    CAST(row_number() OVER (ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS BIGINT) AS vec_rank
       |  FROM sims WHERE na <> 0 AND nb <> 0
       |  ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id LIMIT $nPerList
       |), fused AS (
       |  SELECT COALESCE(lex.id, vec.id) AS id,
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + lex_rank), 0) +
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + vec_rank), 0) AS rrf_score,
       |    lex_rank, vec_rank
       |  FROM lex FULL OUTER JOIN vec ON lex.id = vec.id
       |)
       |SELECT id, rrf_score, lex_rank, vec_rank FROM fused
       |ORDER BY rrf_score DESC, id LIMIT $k""".stripMargin
  }

  /** q144 oracle: deterministic JL random projection replayed — the
    * coefficient matrix is RE-DERIVED from the HUGEINT FNV machinery
    * over the same `salt:j:i` strings (no trusted literals), and each
    * output dimension folds `v_i · c(j,i)` left-to-right with a 0.0
    * init, matching Spark's `aggregate` bracketing exactly. */
  def randomProjectionSql(outDim: Int, inDim: Int, salt: String): String = {
    val fnvFold = s"(${mul(xorm("h", "y"), FnvPrime)})"
    val rCols = (0 until outDim)
      .map(j => s"max(CASE WHEN j = $j THEN r END) AS r$j")
      .mkString(",\n       ")
    s"""WITH grid AS (
       |  SELECT t1.j, t2.i,
       |         '$salt:' || CAST(t1.j AS VARCHAR) || ':' || CAST(t2.i AS VARCHAR) AS s
       |  FROM range(0, $outDim) t1(j) CROSS JOIN range(0, $inDim) t2(i)
       |), fp AS (
       |  SELECT j, i, list_reduce(list_prepend($FnvBasis,
       |    list_transform(range(1, octet_length(encode(s)) + 1), k ->
       |      CAST((strpos('0123456789ABCDEF', substr(hex(encode(s)), 2 * k - 1, 1)) - 1) * 16
       |         + (strpos('0123456789ABCDEF', substr(hex(encode(s)), 2 * k, 1)) - 1) AS HUGEINT))),
       |    (h, y) -> $fnvFold) AS u
       |  FROM grid
       |), coef AS (
       |  SELECT j, i,
       |    CAST(((${signed("u")}) % 2001 + 2001) % 2001 - 1000 AS DOUBLE) / 1000.0 AS c
       |  FROM fp
       |), cl AS (
       |  SELECT j, list(c ORDER BY i) AS cl FROM coef GROUP BY j
       |), proj AS (
       |  SELECT e.vec_id, cl.j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, $inDim + 1), i -> CAST(e.embedding[i] AS DOUBLE) * cl.cl[i])),
       |      (a, b) -> a + b) AS r
       |  FROM embeddings e CROSS JOIN cl
       |)
       |SELECT vec_id,
       |       $rCols
       |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** q54 oracle: the multimodal decode aggregate replayed. The corpus
    * payloads are document text — none parse as image/audio/video — so
    * every asset takes the DETERMINISTIC STUB path, whose metadata is
    * FNV-1a-derived from the raw payload bytes (width = 64 + h mod 512,
    * height = 64 + (h >>> 16) mod 512, frames = 1 + (h >>> 32) mod 120
    * for video). Replaying it pins the whole mapPartitions plumbing
    * (kind cycle, schema, stub contract) through the correctness gate. */
  def stubDecodeSql: String = {
    val fnvFold = s"(${mul(xorm("h", "y"), FnvPrime)})"
    s"""WITH fp AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    list_reduce(list_prepend($FnvBasis,
       |      list_transform(range(1, octet_length(encode(text)) + 1), i ->
       |        CAST((strpos('0123456789ABCDEF', substr(hex(encode(text)), 2 * i - 1, 1)) - 1) * 16
       |           + (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2 * i, 1)) - 1) AS HUGEINT))),
       |      (h, y) -> $fnvFold) AS u
       |  FROM documents
       |), meta AS (
       |  SELECT kind,
       |    64 + CAST(u % 512 AS BIGINT) AS width,
       |    CASE WHEN kind = 'video' THEN 1 + CAST((u // ${1L << 32}) % 120 AS BIGINT) ELSE 1 END AS n_frames
       |  FROM fp
       |)
       |SELECT kind, count(*) AS n, max(width) AS max_w, max(n_frames) AS max_frames
       |FROM meta GROUP BY kind ORDER BY kind""".stripMargin
  }

  /** q57 oracle: IVF ANN top-k replayed exactly. Centroids are the
    * deterministic hash-ordered corpus sample (xxhash64 of vec_id — the
    * 8-byte closed form, signed ascending — limit nCells), L2-normalized
    * in sequential order; the query ranks cells by centroid dot
    * (DESC, j) and probes the best nProbe; vectors assign to the
    * first-max-wins argmax cell; exact cosine top-k over the probed
    * union. */
  def ivfTopKSql(k: Int, nCells: Int, nProbe: Int): String =
    ivfTopKSqlFrom(k, nCells, nProbe, source = "embeddings", extraCte = "")

  /** q88 oracle: the same IVF replay over the int8-DEQUANTIZED corpus —
    * the `deq` CTE replays quantize (q84's bit-exact math) then
    * dequantize ((code + 128) * scale + min, cast FLOAT, matching
    * `dequantizeEmbeddings`); the query vector stays full-precision. */
  def ivfTopKQuantizedSql(k: Int, nCells: Int, nProbe: Int): String = {
    val deq =
      """deq AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(
        |    (CAST(CAST(round((CAST(x AS DOUBLE) - mn) / sc) - 128 AS TINYINT) AS DOUBLE) + 128)
        |      * sc + mn AS FLOAT)) AS embedding
        |  FROM (
        |    SELECT vec_id, embedding,
        |      CAST(list_min(embedding) AS DOUBLE) AS mn,
        |      CASE WHEN CAST(list_max(embedding) AS DOUBLE) > CAST(list_min(embedding) AS DOUBLE)
        |           THEN (CAST(list_max(embedding) AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE)) / 255.0
        |           ELSE 1.0 END AS sc
        |    FROM embeddings)
        |), """.stripMargin
    ivfTopKSqlFrom(k, nCells, nProbe, source = "deq", extraCte = deq)
  }

  private def ivfTopKSqlFrom(k: Int, nCells: Int, nProbe: Int,
                             source: String, extraCte: String): String = {
    // xxhash64(long, seed 42) closed form: h0 = seed + P5 + 8, one
    // 8-byte tail round, avalanche
    val h0 = (BigInt(42) + BigInt(P5) + 8) mod (BigInt(1) << 64)
    s"""WITH ${extraCte}q AS (
       |  SELECT embedding AS qe, len(embedding) AS dim FROM embeddings WHERE vec_id = 0
       |), hu AS (
       |  SELECT embedding,
       |    CASE WHEN vec_id < 0 THEN CAST(vec_id AS HUGEINT) + CAST('$M' AS HUGEINT)
       |         ELSE CAST(vec_id AS HUGEINT) END AS u
       |  FROM $source WHERE len(embedding) > 0
       |), hx AS (
       |  SELECT embedding, ((${mul(rotl(xorm(s"CAST('$h0' AS HUGEINT)", rnd("0", "u")), 27), P1)} + $P4) % $M) AS h2 FROM hu
       |), ha1 AS (SELECT embedding, ${mul(xorm("h2", s"h2 // ${1L << 33}"), P2)} AS a1 FROM hx
       |), ha2 AS (SELECT embedding, ${mul(xorm("a1", s"a1 // ${1L << 29}"), P3)} AS a2 FROM ha1
       |), hf AS (
       |  SELECT embedding, ${signed(xorm("a2", s"a2 // ${1L << 32}"))} AS hsig FROM ha2
       |), cent AS (
       |  SELECT row_number() OVER (ORDER BY hsig) - 1 AS j, embedding
       |  FROM hf ORDER BY hsig LIMIT $nCells
       |), cn AS (
       |  SELECT j, list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm, embedding
       |  FROM cent
       |), cnorm AS (
       |  SELECT j, list_transform(embedding, x ->
       |    CAST(x AS DOUBLE) * CASE WHEN nrm = 0 THEN 0 ELSE 1 / sqrt(nrm) END) AS c
       |  FROM cn
       |), cl AS (
       |  SELECT list(c ORDER BY j) AS cl, count(*) AS kc FROM cnorm
       |), qd AS (
       |  SELECT j, list_sum(list_transform(range(1, dim + 1), i -> CAST(qe[i] AS DOUBLE) * c[i])) AS dot
       |  FROM cnorm, q
       |), probes AS (
       |  SELECT j FROM qd ORDER BY dot DESC, j LIMIT $nProbe
       |), dl AS (
       |  SELECT e.vec_id, e.embedding,
       |    list_transform(range(0, CAST(kc AS INTEGER)), j2 ->
       |      list_sum(list_transform(range(1, dim + 1), ii -> CAST(e.embedding[ii] AS DOUBLE) * cl[j2 + 1][ii]))) AS dl,
       |    kc
       |  FROM $source e, cl, q
       |), cells AS (
       |  SELECT vec_id, embedding,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, kc)),
       |      (pp, qq) -> CASE WHEN dl[qq + 1] > dl[pp + 1] THEN qq ELSE pp END) AS cell
       |  FROM dl
       |), sims AS (
       |  SELECT e.vec_id,
       |    list_sum(list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM cells e, q
       |  WHERE e.cell IN (SELECT j FROM probes)
       |), nn AS (
       |  SELECT vec_id, CASE WHEN na = 0 OR nb = 0 THEN NULL ELSE dot / (sqrt(na) * sqrt(nb)) END AS cosine
       |  FROM sims
       |)
       |SELECT vec_id, cosine FROM nn WHERE cosine IS NOT NULL
       |ORDER BY cosine DESC, vec_id LIMIT $k""".stripMargin
  }

  /** q90 oracle: PQ-ADC top-k replayed exactly. Codebook = q57's
    * deterministic hash-ordered sample idiom (xxhash64(vec_id) closed
    * form, ascending, limit nCodes) kept RAW (PQ approximates raw
    * subvectors, no normalization); each row's m codes are
    * ascending-scan argmins of subvector L2 distance (strict `<`,
    * first-min-wins — PqEncode's rule); the score replays PqAdcScore's
    * exact double grouping: per-subspace inner sums, ascending-s outer
    * sum, `qn * sqrt(n2)` denominator, flat query norm. */
  def pqTopKSql(k: Int, nCodes: Int, m: Int): String = {
    val h0 = (BigInt(42) + BigInt(P5) + 8) mod (BigInt(1) << 64)
    s"""WITH q AS (
       |  SELECT embedding AS qe, len(embedding) // $m AS dsub
       |  FROM embeddings WHERE vec_id = 0
       |), hu AS (
       |  SELECT embedding,
       |    CASE WHEN vec_id < 0 THEN CAST(vec_id AS HUGEINT) + CAST('$M' AS HUGEINT)
       |         ELSE CAST(vec_id AS HUGEINT) END AS u
       |  FROM embeddings WHERE len(embedding) > 0
       |), hx AS (
       |  SELECT embedding, ((${mul(rotl(xorm(s"CAST('$h0' AS HUGEINT)", rnd("0", "u")), 27), P1)} + $P4) % $M) AS h2 FROM hu
       |), ha1 AS (SELECT embedding, ${mul(xorm("h2", s"h2 // ${1L << 33}"), P2)} AS a1 FROM hx
       |), ha2 AS (SELECT embedding, ${mul(xorm("a1", s"a1 // ${1L << 29}"), P3)} AS a2 FROM ha1
       |), hf AS (
       |  SELECT embedding, ${signed(xorm("a2", s"a2 // ${1L << 32}"))} AS hsig FROM ha2
       |), cbk AS (
       |  SELECT row_number() OVER (ORDER BY hsig) - 1 AS j, embedding
       |  FROM hf ORDER BY hsig LIMIT $nCodes
       |), cbl AS (
       |  SELECT list(embedding ORDER BY j) AS cw, count(*) AS nc FROM cbk
       |), dst AS (
       |  SELECT e.vec_id, nc, dsub,
       |    list_transform(range(0, $m * nc), t ->
       |      list_sum(list_transform(range(1, dsub + 1), i ->
       |        (CAST(e.embedding[(t // nc) * dsub + i] AS DOUBLE) - CAST(cw[t % nc + 1][(t // nc) * dsub + i] AS DOUBLE))
       |      * (CAST(e.embedding[(t // nc) * dsub + i] AS DOUBLE) - CAST(cw[t % nc + 1][(t // nc) * dsub + i] AS DOUBLE))))) AS d
       |  FROM embeddings e, cbl, q
       |), enc AS (
       |  SELECT vec_id,
       |    list_transform(range(0, $m), s ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, nc)),
       |        (pp, qq) -> CASE WHEN d[s * nc + qq + 1] < d[s * nc + pp + 1] THEN qq ELSE pp END)) AS codes
       |  FROM dst
       |), adc AS (
       |  SELECT vec_id,
       |    list_sum(list_transform(range(0, $m), s ->
       |      list_sum(list_transform(range(1, dsub + 1), i ->
       |        CAST(qe[s * dsub + i] AS DOUBLE) * CAST(cw[codes[s + 1] + 1][s * dsub + i] AS DOUBLE))))) AS ip,
       |    list_sum(list_transform(range(0, $m), s ->
       |      list_sum(list_transform(range(1, dsub + 1), i ->
       |        CAST(cw[codes[s + 1] + 1][s * dsub + i] AS DOUBLE) * CAST(cw[codes[s + 1] + 1][s * dsub + i] AS DOUBLE))))) AS n2,
       |    sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
       |  FROM enc, cbl, q
       |)
       |SELECT vec_id, ip / (qn * sqrt(n2)) AS adc_cosine
       |FROM adc WHERE qn <> 0 AND n2 <> 0
       |ORDER BY adc_cosine DESC, vec_id LIMIT $k""".stripMargin
  }

  /** q55 oracle: Multimodal frame sampling replayed — video assets are
    * doc_id % 3 == 2 (assetsFromDocuments' kind cycle), frames are
    * every-4th 64-byte chunk, and the checked aggregate is per-asset
    * frame count + sampled-byte total. */
  def sampleFramesSql(chunkBytes: Int = 64, everyNth: Int = 4): String =
    s"""WITH assets AS (
       |  SELECT doc_id AS asset_id, encode(text) AS bytes
       |  FROM documents WHERE doc_id % 3 = 2
       |), fr AS (
       |  SELECT asset_id, bytes,
       |    unnest(range(0, greatest(CAST(ceil(octet_length(bytes) / ${chunkBytes}.0) AS BIGINT) - 1, 0) + 1, $everyNth)) AS idx
       |  FROM assets
       |)
       |SELECT asset_id, count(*) AS n_frames,
       |       -- frame length arithmetically: min(chunk, remaining); the
       |       -- empty-payload single frame contributes 0
       |       CAST(sum(greatest(least($chunkBytes, octet_length(bytes) - idx * $chunkBytes), 0)) AS BIGINT) AS bytes_sampled
       |FROM fr GROUP BY asset_id ORDER BY asset_id""".stripMargin

  private val FnvBasis = "CAST('14695981039346656037' AS HUGEINT)" // 0xcbf29ce484222325
  private val FnvPrime = "1099511628211"                           // 0x100000001b3

  /** q73 oracle: winnow(text, k, window) — Schleimer et al. robust
    * winnowing, replayed exactly. Normalization (lower, whitespace runs
    * -> single space, trimmed), FNV-1a over each k-CHAR gram (the engine
    * hashes `char & 0xFF`, which equals UTF-8 bytes on this all-ASCII
    * corpus — asserted in the battery's data), then per window the
    * RIGHTMOST minimum gram position under signed-Long order. The
    * engine's emit-on-position-change scan equals "distinct selected
    * positions, ascending" because the rightmost-min position sequence
    * is non-decreasing (a later equal value always wins the tie, so a
    * position right of the current min can only take over, never a
    * position left of it). Texts shorter than k fingerprint as one
    * whole-text FNV hash. */
  def winnowSql(k: Int, window: Int): String =
    s"""WITH ${winnowCtes(k, window)}
       |SELECT doc_id,
       |       array_to_string(
       |         list_transform(list_sort(list_distinct(wins)), p -> grams[p + 1]), ',') AS fps
       |FROM win ORDER BY doc_id""".stripMargin

  /** q59 oracle: winnowing-overlap pairs (Dedup.winnowOverlapPairs)
    * replayed — per-doc DISTINCT fingerprints from [[winnowCtes]], a
    * DF-capped inverted index, per-fingerprint pair multiplicity summed
    * to `shared_fps` (the engine's `blockPairs(dedup = false)` +
    * count), threshold filter. */
  def winnowPairsSql(k: Int, window: Int, minShared: Int, maxDf: Int): String =
    s"""WITH ${winnowCtes(k, window)},
       |fpl AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(list_sort(list_distinct(wins)), p -> grams[p + 1])) AS fps
       |  FROM win
       |), inv AS MATERIALIZED (
       |  -- referenced 3x below; materialize so the per-char FNV gram
       |  -- chain above runs ONCE, not once per reference
       |  SELECT doc_id, unnest(fps) AS fp FROM fpl
       |), ok AS (
       |  SELECT fp FROM inv GROUP BY fp HAVING count(*) BETWEEN 2 AND $maxDf
       |), pr AS (
       |  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS shared_fps
       |  FROM inv l
       |  JOIN inv r ON l.fp = r.fp AND l.doc_id < r.doc_id
       |  JOIN ok o ON o.fp = l.fp
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, CAST(shared_fps AS BIGINT) AS shared_fps FROM pr
       |WHERE shared_fps >= $minShared ORDER BY id_a, id_b""".stripMargin

  /** Shared winnowing CTEs: documents -> `win(doc_id, grams, wins)` —
    * normalized text, FNV-1a k-char grams, rightmost-min window
    * positions (see [[winnowSql]]'s scaladoc for the equivalence
    * argument). */
  private def winnowCtes(k: Int, window: Int): String = {
    val fnvFold = s"(${mul(xorm("h", "y"), FnvPrime)})"
    val gram = signed(s"list_reduce(list_prepend($FnvBasis, b[i + 1 : i + $k]), (h, y) -> $fnvFold)")
    val whole = signed(s"list_reduce(list_prepend($FnvBasis, b), (h, y) -> $fnvFold)")
    s"""nrm AS (
       |  SELECT doc_id, trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS s
       |  FROM documents
       |), byt AS (
       |  SELECT doc_id, octet_length(encode(s)) AS nb,
       |    list_transform(range(1, octet_length(encode(s)) + 1), i ->
       |      CAST((strpos('0123456789ABCDEF', substr(hex(encode(s)), 2 * i - 1, 1)) - 1) * 16
       |         + (strpos('0123456789ABCDEF', substr(hex(encode(s)), 2 * i, 1)) - 1) AS HUGEINT)) AS b
       |  FROM nrm
       |), grm AS (
       |  SELECT doc_id, nb, nb - $k + 1 AS ng,
       |    CASE WHEN nb >= $k
       |      THEN list_transform(range(0, nb - $k + 1), i -> $gram)
       |      ELSE [$whole] END AS grams
       |  FROM byt
       |), win AS (
       |  SELECT doc_id, grams,
       |    CASE WHEN nb < $k THEN [CAST(0 AS BIGINT)]
       |      ELSE list_transform(range(0, greatest(ng - $window + 1, 1)), i ->
       |        list_reduce(list_prepend(i, range(i + 1, least(i + $window, ng))),
       |          (p, q) -> CASE WHEN grams[q + 1] <= grams[p + 1] THEN q ELSE p END))
       |      END AS wins
       |  FROM grm
       |)""".stripMargin
  }

  /** q46/q74 oracle: the FULL MinHash LSH candidate pipeline
    * (Dedup.minHashCandidates) replayed exactly — signatures, band
    * strings (comma-joined signature slice + band index, exactly
    * Spark's `concat_ws`), xxhash64 band buckets, bucket-cap pair
    * blocking, signature-agreement scoring, threshold. */
  def minhashCandidatesSql(numHashes: Int, bands: Int, w: Int,
                           maxBucketSize: Int, threshold: Double): String =
    s"""WITH ${candidateCtes(numHashes, bands, w, maxBucketSize)}
       |SELECT id_a, id_b, est_jaccard FROM scored
       |WHERE est_jaccard >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** q47 oracle: MinHash dedup survivor count (Dedup.minHashDedup) —
    * every doc with a smaller-id candidate at est_jaccard >= threshold
    * is dropped; survivors counted. */
  def minhashDedupCountSql(numHashes: Int, bands: Int, w: Int,
                           maxBucketSize: Int, threshold: Double): String =
    s"""WITH ${candidateCtes(numHashes, bands, w, maxBucketSize)},
       |dup AS (
       |  SELECT DISTINCT id_b FROM scored WHERE est_jaccard >= $threshold
       |)
       |SELECT (SELECT count(*) FROM documents) - (SELECT count(*) FROM dup) AS n_kept""".stripMargin

  /** q61 oracle: near-dup cluster-size histogram
    * (Dedup.nearDupClusters -> size counts) — the candidate set from
    * [[candidateCtes]] closed transitively with a recursive CTE (min
    * reachable id per node == the engine's star-contraction fixpoint,
    * same closure as q70), singletons their own cluster, then the
    * cluster-size histogram. */
  def minhashClustersSql(numHashes: Int, bands: Int, w: Int,
                         maxBucketSize: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${candidateCtes(numHashes, bands, w, maxBucketSize)},
       |cand AS (
       |  SELECT id_a, id_b FROM scored WHERE est_jaccard >= $threshold
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM cand
       |  UNION SELECT id_b, id_a FROM cand
       |), reach AS (
       |  SELECT src AS id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
       |), memb AS (
       |  SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
       |), asg AS (
       |  SELECT d.doc_id, coalesce(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN memb m ON d.doc_id = m.id
       |), cs AS (
       |  SELECT cluster, count(*) AS csize FROM asg GROUP BY cluster
       |)
       |SELECT CAST(csize AS BIGINT) AS size, count(*) AS n_clusters
       |FROM cs GROUP BY csize ORDER BY size""".stripMargin

  /** q170 oracle: cleaned corpus after MinHash near-dup removal
    * (Dedup.minHashCandidates -> threshold -> removeNearDups, the HTTP
    * dedup_apply composite) — candidates closed transitively
    * (min-reachable-id, as q61), a doc survives iff it is outside every
    * cluster or is its cluster's minimum id. */
  def minhashRemoveNearDupsSql(numHashes: Int, bands: Int, w: Int,
                               maxBucketSize: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${candidateCtes(numHashes, bands, w, maxBucketSize)},
       |cand AS (
       |  SELECT id_a, id_b FROM scored WHERE est_jaccard >= $threshold
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM cand
       |  UNION SELECT id_b, id_a FROM cand
       |), reach AS (
       |  SELECT src AS id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
       |), memb AS (
       |  SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
       |)
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d LEFT JOIN memb m ON d.doc_id = m.id
       |WHERE m.cluster IS NULL OR m.cluster = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q132 oracle: leakage-safe split report (Dedup.leakageSafeSplit) —
    * the minhash candidate set thresholded, closed transitively
    * (min-reachable-id, as q61/q70), every doc keyed by its cluster
    * representative, the representative FNV-1a-hashed with the salt
    * prefix onto the 10k ring (q66's machinery over the cluster id
    * string), labels by cumulative cut points, then per-split doc /
    * cluster / id-sum counts. */
  def leakageSafeSplitSql(numHashes: Int, bands: Int, w: Int, maxBucketSize: Int,
                          threshold: Double, salt: String,
                          splits: Seq[(String, Double)]): String = {
    require(!salt.contains("'"), "salt must not contain quotes")
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 10000)).dropRight(1)
    val caseExpr =
      if (cuts.isEmpty) s"'${splits.head._1}'"
      else splits.map(_._1).zip(cuts)
        .map { case (n, c) => s"WHEN bucket < $c THEN '$n'" }
        .mkString("CASE ", " ", s" ELSE '${splits.last._1}' END")
    val fnvFold = s"(${mul(xorm("h", "y"), FnvPrime)})"
    s"""WITH RECURSIVE ${candidateCtes(numHashes, bands, w, maxBucketSize)},
       |cand AS (
       |  SELECT id_a, id_b FROM scored WHERE est_jaccard >= $threshold
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM cand
       |  UNION SELECT id_b, id_a FROM cand
       |), reach AS (
       |  SELECT src AS id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
       |), memb AS (
       |  SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
       |), asg AS (
       |  SELECT d.doc_id, coalesce(m.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN memb m ON d.doc_id = m.id
       |), hxc AS (
       |  SELECT doc_id, cluster, hex(encode('$salt' || CAST(cluster AS VARCHAR))) AS hx
       |  FROM asg
       |), fpc AS (
       |  SELECT doc_id, cluster, list_reduce(
       |    list_prepend($FnvBasis,
       |      list_transform(range(1, len(hx) // 2 + 1), i ->
       |        CAST((strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
       |           + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS HUGEINT))),
       |    (h, y) -> $fnvFold) AS u
       |  FROM hxc
       |), sgn AS (
       |  SELECT doc_id, cluster, ${signed("u")} AS fp FROM fpc
       |), rng AS (
       |  SELECT doc_id, cluster, ((fp % 10000) + 10000) % 10000 AS bucket FROM sgn
       |), lbl AS (
       |  SELECT doc_id, cluster, $caseExpr AS split FROM rng
       |)
       |SELECT split, count(*) AS n_docs,
       |       CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Shared MinHash LSH candidate CTEs: documents -> `scored(id_a,
    * id_b, est_jaccard)` (UNthresholded — callers filter). */
  private def candidateCtes(numHashes: Int, bands: Int, w: Int,
                            maxBucketSize: Int): String = {
    val rpb = numHashes / bands
    s"""${sigCtes(numHashes, w)},
       |bnd AS (
       |  -- bi, not b: the hash chain's byte-list column is named b
       |  SELECT doc_id, bi,
       |         array_to_string(sig[bi * $rpb + 1 : bi * $rpb + $rpb], ',') || ',' || CAST(bi AS VARCHAR) AS t
       |  FROM sg CROSS JOIN (SELECT unnest(range(0, $bands)) AS bi) bb
       |), ${xxhChain("bnd", Seq("doc_id", "bi"), "t", "bx")},
       |bkt AS MATERIALIZED (
       |  SELECT doc_id, bi AS band, hfin AS bucket FROM bxhashed
       |), ok AS (
       |  SELECT band, bucket FROM bkt GROUP BY band, bucket
       |  HAVING count(*) BETWEEN 2 AND $maxBucketSize
       |), pairs AS (
       |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |  FROM bkt l
       |  JOIN bkt r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
       |  JOIN ok o ON o.band = l.band AND o.bucket = l.bucket
       |), scored AS (
       |  SELECT p.id_a, p.id_b,
       |         CAST(len(list_filter(range(1, $numHashes + 1), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
       |           / $numHashes AS est_jaccard
       |  FROM pairs p
       |  JOIN sg sa ON sa.doc_id = p.id_a
       |  JOIN sg sb ON sb.doc_id = p.id_b
       |)""".stripMargin
  }

  /** Shared k-means CTE chain for q96/q97: init centroids = q57's
    * hash-ordered sample idiom (xxhash64(vec_id) closed form,
    * normalized) as `cl0`, then per Lloyd iteration t: assignment
    * `asg{t}` under `cl{t-1}` (first-max-wins argmax, the
    * NearestCentroid rule), component sums as DECIMAL(38,12) — the
    * exact order-free addition matching the Spark side — mean =
    * CAST(s AS DOUBLE)/n, renormalize, empty cells inherit the
    * previous centroid. `asg{iters+1}` is the final assignment.
    * Requires corpus >= k rows (as does the operator). */
  private def kMeansCtes(k: Int, iters: Int): String = {
    val h0 = (BigInt(42) + BigInt(P5) + 8) mod (BigInt(1) << 64)
    val init =
      s"""hu AS (
         |  SELECT vec_id, embedding,
         |    CASE WHEN vec_id < 0 THEN CAST(vec_id AS HUGEINT) + CAST('$M' AS HUGEINT)
         |         ELSE CAST(vec_id AS HUGEINT) END AS u
         |  FROM embeddings WHERE len(embedding) > 0
         |), hx AS (
         |  SELECT embedding, ((${mul(rotl(xorm(s"CAST('$h0' AS HUGEINT)", rnd("0", "u")), 27), P1)} + $P4) % $M) AS h2 FROM hu
         |), ha1 AS (SELECT embedding, ${mul(xorm("h2", s"h2 // ${1L << 33}"), P2)} AS a1 FROM hx
         |), ha2 AS (SELECT embedding, ${mul(xorm("a1", s"a1 // ${1L << 29}"), P3)} AS a2 FROM ha1
         |), hf AS (
         |  SELECT embedding, ${signed(xorm("a2", s"a2 // ${1L << 32}"))} AS hsig FROM ha2
         |), cent AS (
         |  SELECT row_number() OVER (ORDER BY hsig) - 1 AS j, embedding
         |  FROM hf ORDER BY hsig LIMIT $k
         |), cn0 AS (
         |  SELECT j, list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm, embedding
         |  FROM cent
         |), cnorm AS (
         |  SELECT j, list_transform(embedding, x ->
         |    CAST(x AS DOUBLE) * CASE WHEN nrm = 0 THEN 0 ELSE 1 / sqrt(nrm) END) AS c
         |  FROM cn0
         |), cl0 AS (
         |  SELECT list(c ORDER BY j) AS cl, count(*) AS kc FROM cnorm
         |)""".stripMargin
    def asg(t: Int, from: String): String =
      s"""asg$t AS (
         |  SELECT vec_id, embedding,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, kc)),
         |      (pp, qq) -> CASE WHEN dl[qq + 1] > dl[pp + 1] THEN qq ELSE pp END) AS cell
         |  FROM (
         |    SELECT e.vec_id, e.embedding,
         |      list_transform(range(0, CAST(kc AS INTEGER)), j2 ->
         |        list_sum(list_transform(range(1, len(e.embedding) + 1), ii ->
         |          CAST(e.embedding[ii] AS DOUBLE) * cl[j2 + 1][ii]))) AS dl, kc
         |    FROM embeddings e, $from WHERE len(e.embedding) > 0) t$t
         |)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""${asg(t, s"cl${t - 1}")}, ex$t AS (
         |  SELECT cell, unnest(range(1, len(embedding) + 1)) AS i, unnest(embedding) AS x
         |  FROM asg$t
         |), sm$t AS (
         |  SELECT cell, i, sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS s, count(*) AS n
         |  FROM ex$t GROUP BY 1, 2
         |), mv$t AS (
         |  SELECT cell, list(CAST(s AS DOUBLE) / n ORDER BY i) AS mv FROM sm$t GROUP BY cell
         |), nv$t AS (
         |  SELECT cell, list_transform(mv, x ->
         |    x * (CASE WHEN nrm = 0 THEN 0 ELSE 1 / sqrt(nrm) END)) AS c
         |  FROM (SELECT cell, mv, list_sum(list_transform(mv, x -> x * x)) AS nrm FROM mv$t) z$t
         |), cl$t AS (
         |  SELECT list(c2 ORDER BY j) AS cl, count(*) AS kc FROM (
         |    SELECT r.j, CASE WHEN nv.cell IS NULL THEN p.cl[CAST(r.j AS INTEGER) + 1] ELSE nv.c END AS c2
         |    FROM range(0, $k) r(j) CROSS JOIN cl${t - 1} p LEFT JOIN nv$t nv ON nv.cell = r.j) y$t
         |)""".stripMargin
    }.mkString(", ")
    s"$init, $rounds, ${asg(iters + 1, s"cl$iters")}"
  }

  /** q96 oracle: spherical Lloyd k-means cluster assignment replayed
    * exactly — integer output (vec_id, cell), so the hash compare is
    * bit-exact end-to-end through two full Lloyd rounds. */
  def kMeansAssignSql(k: Int, iters: Int): String =
    s"""WITH ${kMeansCtes(k, iters)}
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell
       |FROM asg${iters + 1} ORDER BY vec_id""".stripMargin

  /** q97 oracle: SemDeDup replayed exactly — k-means cells (q96
    * machinery), within-cell exact-cosine pairs over cells sized
    * [2, cap] (the blockPairs guard), duplicate groups closed by the
    * q70 recursive min-label closure, keep = group minimum. */
  def semanticDedupSql(k: Int, iters: Int, threshold: Double, cap: Int): String = {
    val f = iters + 1
    s"""WITH RECURSIVE ${kMeansCtes(k, iters)}, cz AS (
       |  SELECT cell, count(*) AS csz FROM asg$f GROUP BY cell
       |), pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |    list_sum(list_transform(range(1, len(a.embedding) + 1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) AS dot,
       |    list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS na,
       |    list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nb
       |  FROM asg$f a JOIN asg$f b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN cz ON cz.cell = a.cell
       |  WHERE cz.csz BETWEEN 2 AND $cap
       |), pairs AS (
       |  -- zero-norm guard mirrors cosine_sim's NULL (a bare division
       |  -- would yield NaN, which DuckDB sorts greatest, so NaN >= t
       |  -- would KEEP a degenerate pair the engine drops)
       |  SELECT id_a, id_b FROM pr
       |  WHERE (CASE WHEN na = 0 OR nb = 0 THEN NULL
       |              ELSE dot / (sqrt(na) * sqrt(nb)) END) >= $threshold
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs
       |), reach AS (
       |  SELECT src AS id, src AS lbl FROM edges
       |  UNION
       |  SELECT e.src AS id, r.lbl FROM edges e JOIN reach r ON r.id = e.dst
       |), grp AS (
       |  SELECT id, min(lbl) AS cluster FROM reach GROUP BY id
       |), dropped AS (
       |  SELECT id FROM grp WHERE id <> cluster
       |)
       |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM asg$f
       |WHERE vec_id NOT IN (SELECT id FROM dropped)
       |ORDER BY vec_id""".stripMargin
  }

  // ------------------------------------------------- r17 parameterized
  // exact-overlap + chunking oracles for the operator-parameter fuzzer
  // (OpFuzz): the q49/q135/q77 inline oracles generalized over the
  // operator's full parameter space, so a seeded sweep can
  // differentially check Dedup.ngramJaccardPairs / containmentPairs /
  // TextAnalysis.chunkDocuments at ANY (width, threshold, minShared,
  // maxDf) / (chunkSize, overlap) — not just the fixed battery values.

  /** Shared shingle-pair CTEs: documents -> `pairs(id_a, id_b, shared,
    * na, nb)` over DISTINCT w-token shingle STRINGS (whole text if
    * < w tokens), with the operator's lossless-by-construction prunes
    * replayed: grams in exactly one doc pair with nothing (`>= 2`), and
    * grams in more than `maxDf` docs are dropped (the 100 TB
    * stop-phrase cap) — equal to the hash-based Spark result because
    * 64-bit shingle-hash collisions are negligible at test scale
    * (same argument as q49's scaladoc). */
  private def shinglePairCtes(w: Int, maxDf: Int): String =
    s"""tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS t
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) >= $w
       |      THEN list_distinct(list_transform(range(1, len(t) - ${w - 2}), i -> array_to_string(t[i:i + ${w - 1}], ' ')))
       |      ELSE [array_to_string(t, ' ')] END AS s
       |  FROM tk
       |), ex AS MATERIALIZED (
       |  SELECT doc_id, unnest(s) AS g FROM sh
       |), ok AS (
       |  SELECT g FROM ex GROUP BY g HAVING count(*) BETWEEN 2 AND $maxDf
       |), cp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
       |  JOIN ok o ON o.g = a.g
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT id_a, id_b, shared, len(sa.s) AS na, len(sb.s) AS nb
       |  FROM cp JOIN sh sa ON cp.id_a = sa.doc_id JOIN sh sb ON cp.id_b = sb.doc_id
       |)""".stripMargin

  /** Parameterized q49 oracle: Dedup.ngramJaccardPairs at any
    * (shingleWidth, threshold, minShared, maxDf). */
  def jaccardPairsSql(w: Int, threshold: Double, minShared: Int, maxDf: Int): String =
    s"""WITH ${shinglePairCtes(w, maxDf)}
       |SELECT id_a, id_b, CAST(shared AS DOUBLE) / (na + nb - shared) AS jaccard
       |FROM pairs
       |WHERE shared >= $minShared AND CAST(shared AS DOUBLE) / (na + nb - shared) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** Parameterized q135 oracle: Dedup.containmentPairs at any
    * (shingleWidth, threshold, minShared, maxDf). */
  def containmentPairsSql(w: Int, threshold: Double, minShared: Int, maxDf: Int): String =
    s"""WITH ${shinglePairCtes(w, maxDf)}
       |SELECT id_a, id_b,
       |  CAST(shared AS DOUBLE) / na AS containment_a,
       |  CAST(shared AS DOUBLE) / nb AS containment_b,
       |  greatest(CAST(shared AS DOUBLE) / na, CAST(shared AS DOUBLE) / nb) AS containment
       |FROM pairs
       |WHERE shared >= $minShared
       |  AND greatest(CAST(shared AS DOUBLE) / na, CAST(shared AS DOUBLE) / nb) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** Parameterized q77 oracle: TextAnalysis.chunkDocuments at any
    * (chunkSize, overlap) — start grid stepped by chunkSize-overlap,
    * tail starts that would emit a fully-contained suffix dropped
    * (`s = 0 OR s < n - overlap`, replaying the operator's filter
    * exactly), chunks sliced to chunkSize tokens. */
  def chunkDocumentsSql(chunkSize: Int, overlap: Int): String = {
    val step = chunkSize - overlap
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                             x -> len(x) > 0) AS toks
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, toks, len(toks) AS n FROM t
       |), st AS (
       |  SELECT doc_id, toks,
       |         unnest(list_filter(generate_series(0, greatest(n - 1, 0), $step),
       |                            s -> s = 0 OR s < n - $overlap)) AS start
       |  FROM s
       |)
       |SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS BIGINT) AS chunk_idx,
       |  array_to_string(toks[start + 1 : start + $chunkSize], ' ') AS chunk_text,
       |  CAST(len(toks[start + 1 : start + $chunkSize]) AS BIGINT) AS n_chunk_tokens
       |FROM st ORDER BY doc_id, chunk_idx""".stripMargin
  }

  // ------------------------------------------------- r18 parameterized
  // oracles for the DESTRUCTIVE / composite operator families (OpFuzz
  // round 2): the operators that excise or reassign user data — span
  // removal, sequence packing, token-budget sharding, as-of matching —
  // are exactly where a parameter-dependent bug silently loses corpus,
  // so their fixed battery oracles (q86/q89/q85/q81/q112–q114)
  // generalize here over the operators' full parameter spaces.
  // (removeNearDups / leakageSafeSplit were already parameterized:
  // minhashRemoveNearDupsSql / leakageSafeSplitSql above.)

  /** Shared salted-FNV document-fingerprint CTEs (the q79/q81/q85
    * deterministic-shuffle key): documents -> `sgn(doc_id, text, fp)`
    * where fp = signed FNV-1a of `salt || doc_id`. */
  private def docFnvCtes(salt: String): String = {
    require(!salt.contains("'"), "salt must not contain quotes")
    val fnvFold = s"(${mul(xorm("h", "y"), FnvPrime)})"
    s"""hx AS (
       |  SELECT doc_id, text, hex(encode('$salt' || CAST(doc_id AS VARCHAR))) AS hx FROM documents
       |), fpc AS (
       |  SELECT doc_id, text, list_reduce(
       |    list_prepend($FnvBasis,
       |      list_transform(range(1, len(hx) // 2 + 1), i ->
       |        CAST((strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
       |           + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1) AS HUGEINT))),
       |    (h, y) -> $fnvFold) AS f
       |  FROM hx
       |), sgn AS (
       |  SELECT doc_id, text, ${signed("f")} AS fp FROM fpc
       |)""".stripMargin
  }

  /** Parameterized q81 oracle: TextAnalysis.shardByTokenBudget at any
    * (tokensPerShard, salt, numBuckets) — salted FNV key, bucketed,
    * shard_idx = exclusive-prefix-sum // budget within the bucket. */
  def shardByTokenBudgetSql(tokensPerShard: Long, salt: String, numBuckets: Int): String =
    s"""WITH ${docFnvCtes(salt)}, tok AS (
       |  SELECT doc_id, fp, ((fp % $numBuckets) + $numBuckets) % $numBuckets AS shard_bucket,
       |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                         x -> len(x) > 0)) AS BIGINT) AS n_tokens
       |  FROM sgn
       |)
       |SELECT doc_id, shard_bucket,
       |  CAST((sum(n_tokens) OVER (PARTITION BY shard_bucket ORDER BY fp, doc_id
       |                            ROWS UNBOUNDED PRECEDING) - n_tokens) // $tokensPerShard AS BIGINT) AS shard_idx,
       |  n_tokens
       |FROM tok ORDER BY doc_id""".stripMargin

  /** Parameterized q85 oracle: TextAnalysis.packSequences at any
    * (tokensPerSequence, salt, numBuckets) — greedy next-fit-decreasing
    * per salted FNV bucket, the sequential walk replayed as a recursive
    * CTE (one frontier row per bucket per step — the recursion IS the
    * spec, packing is sequential per bucket by construction). */
  def packSequencesSql(tokensPerSequence: Long, salt: String, numBuckets: Int): String =
    s"""WITH RECURSIVE ${docFnvCtes(salt)}, items AS (
       |  SELECT doc_id, ((fp % $numBuckets) + $numBuckets) % $numBuckets AS pack_bucket,
       |    CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                         x -> len(x) > 0)) AS BIGINT) AS n_tokens,
       |    row_number() OVER (
       |      PARTITION BY ((fp % $numBuckets) + $numBuckets) % $numBuckets
       |      ORDER BY CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |                                    x -> len(x) > 0)) AS BIGINT) DESC, doc_id) AS rn
       |  FROM sgn
       |), walk AS (
       |  SELECT pack_bucket, rn, doc_id, n_tokens,
       |         CAST(0 AS BIGINT) AS seq_idx, n_tokens AS fill
       |  FROM items WHERE rn = 1
       |  UNION ALL
       |  SELECT i.pack_bucket, i.rn, i.doc_id, i.n_tokens,
       |    CASE WHEN w.fill + i.n_tokens > $tokensPerSequence THEN w.seq_idx + 1 ELSE w.seq_idx END,
       |    CASE WHEN w.fill + i.n_tokens > $tokensPerSequence THEN i.n_tokens ELSE w.fill + i.n_tokens END
       |  FROM walk w JOIN items i
       |    ON i.pack_bucket = w.pack_bucket AND i.rn = w.rn + 1
       |)
       |SELECT doc_id, n_tokens, pack_bucket, seq_idx
       |FROM walk ORDER BY doc_id""".stripMargin

  /** Parameterized q86/q89 oracle: Dedup.removeDuplicatedSpans
    * (keepFirst = false) / removeDuplicatedSpansKeepFirst (true) at any
    * (k, minCount) — gram STRINGS stand in for the engine's 128-bit
    * double hashes (collision-free at test scale), duplicated starts
    * explode to covered positions, survivors anti-join and re-join in
    * position order. keepFirst spares each duplicated gram's minimum
    * (doc_id, position) occurrence. */
  def removeDuplicatedSpansSql(k: Int, minCount: Int, keepFirst: Boolean): String = {
    require(k >= 2, s"the SQL replay's slice arithmetic needs k >= 2, got $k")
    val cov =
      if (keepFirst)
        s"""marked AS (
           |  SELECT doc_id, i,
           |         count(*) OVER (PARTITION BY gram) AS total,
           |         row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
           |  FROM st
           |), cov AS (
           |  SELECT DISTINCT doc_id, unnest(range(i, i + $k)) AS j
           |  FROM marked WHERE total >= $minCount AND rn > 1
           |)""".stripMargin
      else
        s"""tot AS (
           |  SELECT gram, count(*) AS total FROM st GROUP BY 1
           |), cov AS (
           |  SELECT DISTINCT st.doc_id, unnest(range(st.i, st.i + $k)) AS j
           |  FROM st JOIN tot USING (gram) WHERE tot.total >= $minCount
           |)""".stripMargin
    s"""WITH tk AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> len(t) > 0) AS t
       |  FROM documents
       |), st0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${k - 2}),
       |    i -> struct_pack(i := i, gram := array_to_string(t[i:i + ${k - 1}], ' ')))) AS s
       |  FROM tk WHERE len(t) >= $k
       |), st AS (
       |  SELECT doc_id, s.i AS i, s.gram AS gram FROM st0
       |), $cov, tr0 AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
       |    j -> struct_pack(j := j, tok := t[j]))) AS s
       |  FROM tk WHERE len(t) >= 1
       |), tr AS (
       |  SELECT doc_id, s.j AS j, s.tok AS tok FROM tr0
       |), keep AS (
       |  SELECT tr.doc_id, tr.j, tr.tok
       |  FROM tr LEFT JOIN cov ON tr.doc_id = cov.doc_id AND tr.j = cov.j
       |  WHERE cov.j IS NULL
       |), agg AS (
       |  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
       |         count(*) AS n_kept
       |  FROM keep GROUP BY 1
       |)
       |SELECT tk.doc_id,
       |       coalesce(agg.clean_text, '') AS clean_text,
       |       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       |       CAST(len(tk.t) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
       |FROM tk LEFT JOIN agg USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Parameterized q36/q112–q114 oracle: AsofJoin.asof over the events
    * clicks-vs-errors fixture at any (direction, toleranceMicros).
    * Tolerance replays as an epoch_us post-filter of DuckDB's ASOF
    * match — exact, because the directional nearest match IS the
    * nearest row overall on that side. `nearest` composes both
    * directional ASOF joins and replays the operator's delta
    * comparison (bOk/fOk guards, ties to backward) literally. */
  def asofClicksErrorsSql(direction: String, toleranceMicros: Option[Long]): String = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward/forward/nearest, got $direction")
    def tolOk(delta: String): String =
      toleranceMicros.map(t => s"$delta <= $t").getOrElse("TRUE")
    direction match {
      case "backward" | "forward" =>
        val (op, delta) =
          if (direction == "backward")
            (">=", "(epoch_us(c.ts) - epoch_us(e.ts))")
          else ("<=", "(epoch_us(e.ts) - epoch_us(c.ts))")
        s"""SELECT c.event_id, c.user_id,
           |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           |       CASE WHEN e.ts IS NOT NULL AND ${tolOk(delta)}
           |            THEN strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') END AS err_ts,
           |       CASE WHEN e.ts IS NOT NULL AND ${tolOk(delta)}
           |            THEN e.value END AS err_value
           |FROM (SELECT * FROM events WHERE event_type = 'click') c
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
           |  ON c.user_id = e.user_id AND c.ts $op e.ts
           |ORDER BY c.event_id""".stripMargin
      case _ =>
        val bOk = s"(bts IS NOT NULL AND ${tolOk("(epoch_us(c.ts) - epoch_us(bts))")})"
        val fOk = s"(fts IS NOT NULL AND ${tolOk("(epoch_us(fts) - epoch_us(c.ts))")})"
        val pickB = s"$bOk AND (NOT $fOk OR " +
          "(epoch_us(c.ts) - epoch_us(bts)) <= (epoch_us(fts) - epoch_us(c.ts)))"
        s"""WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error'),
           |b AS (SELECT c.event_id, e.ts AS bts, e.value AS bval
           |      FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts),
           |f AS (SELECT c.event_id, e.ts AS fts, e.value AS fval
           |      FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts <= e.ts)
           |SELECT c.event_id, c.user_id,
           |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           |       CASE WHEN $pickB THEN strftime(bts, '%Y-%m-%d %H:%M:%S.%f')
           |            WHEN $fOk THEN strftime(fts, '%Y-%m-%d %H:%M:%S.%f') END AS err_ts,
           |       CASE WHEN $pickB THEN bval
           |            WHEN $fOk THEN fval END AS err_value
           |FROM c JOIN b USING (event_id) JOIN f USING (event_id)
           |ORDER BY c.event_id""".stripMargin
    }
  }

  // ------------------------------------------------------- r18 round 3:
  // parameterized replays for the EVENT-ANALYTICS surface — the
  // generators generalizing the fixed q94/q98/q120/q121/q125/q127/q128
  // oracles so OpFuzz can sweep their parameter spaces.

  /** Parameterized q94/q98 oracle: ordered funnel over the events
    * stream at any step sequence, optionally time-boxed to
    * `withinSeconds` of the chain's step-0 anchor (the q98 max-anchor
    * recurrence). Both variants replay EventAnalytics.funnel /
    * funnelWithin's stacked-window recurrence literally — the
    * completion-time min for the open funnel, the integer-epoch-micros
    * anchor max for the boxed one — so the (users, rate) rows
    * hash-check bit-exact. */
  def funnelSql(steps: Seq[String], withinSeconds: Option[Long]): String = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    val n = steps.size
    val win =
      """  WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin
    val chain = withinSeconds match {
      case None =>
        val w0 =
          s"""WITH w0 AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         CASE WHEN event_type = '${sq(steps.head)}' THEN ts END AS q0
             |  FROM events
             |)""".stripMargin
        val rest = (1 until n).map { k =>
          s""" w$k AS (
             |  SELECT *, CASE WHEN event_type = '${sq(steps(k))}'
             |      AND min(q${k - 1}) OVER pw IS NOT NULL THEN ts END AS q$k
             |  FROM w${k - 1}
             |$win
             |)""".stripMargin
        }
        (w0 +: rest).mkString(",")
      case Some(secs) =>
        val tUs = math.multiplyExact(secs, 1000000L)
        val e0 =
          s"""WITH w0 AS (
             |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS tsu,
             |         CASE WHEN event_type = '${sq(steps.head)}' THEN epoch_us(ts) END AS q0
             |  FROM events
             |)""".stripMargin
        val rest = (1 until n).map { k =>
          s""" w$k AS (
             |  SELECT *, CASE WHEN event_type = '${sq(steps(k))}' AND max(q${k - 1}) OVER pw IS NOT NULL
             |      AND tsu - max(q${k - 1}) OVER pw <= $tUs THEN max(q${k - 1}) OVER pw END AS q$k
             |  FROM w${k - 1}
             |$win
             |)""".stripMargin
        }
        (e0 +: rest).mkString(",")
    }
    val rCols = (0 until n).map(k =>
      s"         max(CASE WHEN q$k IS NOT NULL THEN 1 ELSE 0 END) AS r$k").mkString(",\n")
    val uCols = (0 until n).map(k => s"sum(r$k) AS u$k").mkString(", ")
    val stRows = (s"  SELECT 0 AS step_idx, '${sq(steps.head)}' AS step, u0 AS users FROM tot" +:
      (1 until n).map(k => s"  UNION ALL SELECT $k, '${sq(steps(k))}', u$k FROM tot")).mkString("\n")
    s"""$chain, pu AS (
       |  SELECT user_id,
       |$rCols
       |  FROM w${n - 1} GROUP BY user_id
       |), tot AS (
       |  SELECT $uCols FROM pu
       |), st AS (
       |$stRows
       |)
       |SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
       |       CAST(users AS BIGINT) AS users,
       |       CASE WHEN first_value(users) OVER w = 0 THEN 0.0
       |            ELSE CAST(users AS DOUBLE) /
       |                 CAST(first_value(users) OVER w AS DOUBLE) END AS rate
       |FROM st
       |WINDOW w AS (ORDER BY step_idx
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |ORDER BY step_idx""".stripMargin
  }

  /** Parameterized q121 oracle: EventAnalytics.topPaths at any
    * (pathLen, k) — each user's first `pathLen` events as a '>'-joined
    * string, counted, top-k under the total (n_users DESC, path)
    * order so the cut is deterministic on both engines. */
  def topPathsSql(pathLen: Int, k: Int): String =
    s"""WITH p AS (
       |  SELECT user_id,
       |         array_to_string((list(event_type ORDER BY ts, event_id))[1:$pathLen], '>') AS path,
       |         len((list(event_type ORDER BY ts, event_id))[1:$pathLen]) AS path_len
       |  FROM events GROUP BY 1
       |)
       |SELECT path, path_len, count(*) AS n_users FROM p GROUP BY 1, 2
       |ORDER BY n_users DESC, path LIMIT $k""".stripMargin

  /** Parameterized q120 oracle: first-order transition matrix over the
    * per-user event stream RESTRICTED to `types` — adjacency is
    * computed after the filter (the lag skips excluded events),
    * identically to filtering the DataFrame before
    * EventAnalytics.transitions. */
  def transitionsSql(types: Seq[String]): String = {
    val inList = types.map(t => s"'${sq(t)}'").mkString(", ")
    s"""WITH t AS (
       |  SELECT user_id, event_type,
       |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events WHERE event_type IN ($inList)
       |)
       |SELECT prev AS from_type, event_type AS to_type,
       |       count(*) AS n_transitions
       |FROM t WHERE prev IS NOT NULL
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Parameterized q125 oracle: OHLC downsampling at any date_trunc
    * `bucket` unit over the user_id % mod = rem slice of the stream.
    * open/close replay min_by/max_by's zero-padded
    * (epoch micros, event_id) composite ordering via arg_min/arg_max
    * over the same byte-comparable string. */
  def ohlcSql(bucket: String, mod: Int, rem: Int): String =
    s"""SELECT CAST(date_trunc('$bucket', ts) AS TIMESTAMP) AS bucket, event_type,
       |       arg_min(value, printf('%020d%020d', epoch_us(ts), event_id)) AS open,
       |       arg_max(value, printf('%020d%020d', epoch_us(ts), event_id)) AS close,
       |       min(value) AS low, max(value) AS high, count(*) AS n
       |FROM events WHERE user_id % $mod = $rem
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Parameterized q127 oracle: volume anomalies at any (bucket unit,
    * trailing window, z threshold). The z-score formula is the same
    * correctly-rounded IEEE op chain over exact integer window sums on
    * both engines (q127's scaladoc carries the bit-exactness
    * argument), so it hash-checks at ANY parameter point. */
  def anomaliesSql(bucket: String, trailing: Int, zThreshold: Double): String =
    s"""WITH b AS (
       |  SELECT event_type, CAST(date_trunc('$bucket', ts) AS TIMESTAMP) AS bucket,
       |         count(*) AS n
       |  FROM events GROUP BY 1, 2
       |), w AS (
       |  SELECT *,
       |    sum(n)   OVER tw AS s,
       |    sum(n*n) OVER tw AS ss,
       |    count(n) OVER tw AS c
       |  FROM b
       |  WINDOW tw AS (PARTITION BY event_type ORDER BY bucket
       |                ROWS BETWEEN $trailing PRECEDING AND 1 PRECEDING)
       |), m AS (
       |  SELECT *, CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/c AS m2
       |  FROM w WHERE c = $trailing
       |), z AS (
       |  SELECT event_type, bucket, n,
       |    (CAST(n AS DOUBLE) - CAST(s AS DOUBLE)/c) / sqrt(m2/(c-1)) AS zscore
       |  FROM m WHERE m2 > 0
       |)
       |SELECT event_type, bucket, n, zscore FROM z
       |WHERE abs(zscore) >= $zThreshold
       |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- r18 round 4:
  // parameterized replays for the MERGE-STORE surface (StoreFuzz) —
  // generalizing the fixed q122/q123/q129/q133/q148/q150 oracles.

  /** Parameterized q122/q133/q150 oracle: latest-wins merge over a base
    * part plus `nUpserts` upsert parts (part k re-emits the
    * `user_id % upsertMod = (k-1) % upsertMod` slice at version k+1
    * with value shifted by `delta * k`), optionally followed by a
    * tombstone part deleting the `user_id % tm = tr` slice at the top
    * version. The replay unions the logical parts and takes the
    * row_number-latest per event_id — so a lost upsert, a resurrected
    * tombstone, or a compaction that changed anything observable all
    * hash-mismatch. Compaction does NOT appear in the SQL: the whole
    * point is that compacted and raw stores must replay identically. */
  def latestStoreSql(upsertMod: Int, nUpserts: Int, delta: Int,
                     tomb: Option[(Int, Int)]): String = {
    val withDel = tomb.isDefined
    val delBase = if (withDel) ", FALSE AS deleted" else ""
    val base =
      s"""  SELECT event_id, user_id, event_type,
         |         CAST(value AS DECIMAL(18,2)) AS value$delBase, 1 AS version
         |  FROM events""".stripMargin
    val upserts = (1 to nUpserts).map { k =>
      val delK = if (withDel) ", FALSE" else ""
      s"""  UNION ALL
         |  SELECT event_id, user_id, event_type,
         |         CAST(CAST(value AS DECIMAL(18,2)) + ${delta * k} AS DECIMAL(18,2))$delK, ${k + 1}
         |  FROM events WHERE user_id % $upsertMod = ${(k - 1) % upsertMod}""".stripMargin
    }
    val tombPart = tomb.map { case (tm, tr) =>
      s"""  UNION ALL
         |  SELECT event_id, user_id, event_type,
         |         CAST(NULL AS DECIMAL(18,2)), TRUE, ${nUpserts + 2}
         |  FROM events WHERE user_id % $tm = $tr""".stripMargin
    }.toSeq
    val aliveFilter = if (withDel) " AND NOT deleted" else ""
    s"""WITH parts AS (
       |${(base +: upserts ++: tombPart).mkString("\n")}
       |), merged AS (
       |  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY version DESC) AS rn
       |  FROM parts
       |)
       |SELECT event_type, count(*) AS n,
       |       CAST(sum(version) AS BIGINT) AS version_sum,
       |       CAST(sum(value) AS DOUBLE) AS value_sum
       |FROM merged WHERE rn = 1$aliveFilter
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Parameterized q123 oracle: the summing store replay is a PLAIN
    * group-by over all events at the bucket `unit` — deliberately
    * independent of how the fuzzer split the stream into parts,
    * because any disjoint split must merge back to the from-scratch
    * aggregate. */
  def summingStoreSql(unit: String): String =
    s"""SELECT CAST(date_trunc('$unit', ts) AS TIMESTAMP) AS day, event_type,
       |       count(*) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Parameterized q148 oracle: the quantile store's binned replay at
    * any (quantile set, scale). Mirrors `readQuantiles` exactly —
    * nulls excluded before binning, round-half-up binning, rank test
    * in integer micro-units — and is independent of the part split for
    * the same reason as [[summingStoreSql]]. */
  def quantileStoreSql(qs: Seq[Double], scale: Int): String = {
    def label(q: Double): String = {
      val c = q * 100
      if ((c - c.round).abs < 1e-9) s"p${c.round}" else s"p$c".replace('.', '_')
    }
    val qCols = qs.map { q =>
      val qMicro = math.round(q * 1000000L)
      s"  CAST(min(CASE WHEN cum * 1000000 >= $qMicro * tot THEN vb END) AS DOUBLE) / $scale AS ${label(q)}"
    }.mkString(",\n")
    s"""WITH b AS (
       |  SELECT event_type, CAST(round(value * $scale) AS BIGINT) AS vb, count(*) AS cnt
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
       |), c AS (
       |  SELECT event_type, vb,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY vb) AS cum,
       |         sum(cnt) OVER (PARTITION BY event_type) AS tot
       |  FROM b
       |)
       |SELECT event_type,
       |$qCols
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Parameterized q129 oracle: SCD2 validity intervals over the
    * `event_id % sampleMod = 0` changelog sample — the lead window
    * replayed with the operator's exact (ts, event_id) ordering. */
  def scd2Sql(sampleMod: Int): String =
    s"""SELECT user_id, event_id AS change_id, event_type, ts AS valid_from,
       |       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       |       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
       |FROM events WHERE event_id % $sampleMod = 0
       |ORDER BY user_id, valid_from, change_id""".stripMargin

  // ------------------------------------------------------- r18 round 5:
  // parameterized replays for the STRUCTURED-STREAMING surface
  // (StreamFuzz) — generalizing the fixed q139/q69/q118 oracles. The
  // streaming side runs the real machinery (staged files, watermarks,
  // AvailableNow, append-mode emission); the replay is the equivalent
  // BATCH query, which is exactly the guarantee a streaming MV sells.

  /** Parameterized q139 oracle: gap-based sessions at any gap. A
    * session breaks when the intra-user gap is >= `gapMinutes` (Spark
    * session_window semantics: the window extends while events arrive
    * STRICTLY inside the gap), and session_end = last event + gap. */
  def sessionCountsSql(gapMinutes: Long): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH d AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= $gapUs
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), g AS (
       |  SELECT user_id, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM d
       |)
       |SELECT user_id,
       |       min(ts) AS session_start,
       |       max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |       count(*) AS n_events
       |FROM g GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin
  }

  /** Parameterized q69 oracle: tumbling event-time windows at any
    * width. Spark's `window()` aligns tumbling windows to the UNIX
    * epoch, so the replay floors epoch-microseconds to the width —
    * identical to date_trunc only for calendar-aligned widths, correct
    * for ALL widths. */
  def windowedCountsSql(widthUs: Long): String =
    s"""SELECT make_timestamp((epoch_us(ts) // $widthUs) * $widthUs) AS window_start,
       |       event_type,
       |       count(*) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Parameterized q118 oracle: stream-stream interval join at any
    * (type pair, before, after, join type) — inclusive bounds on both
    * edges, matching StreamingIngest.intervalJoin's predicate
    * literally. `left_outer` replays as a LEFT JOIN with
    * count(right) (an unmatched left emits once with n_matches = 0
    * and a NULL sum — exactly the streamed outer row the watermark
    * eventually releases). */
  def intervalJoinSql(leftType: String, rightType: String,
                      beforeMinutes: Long, afterMinutes: Long,
                      joinType: String = "inner"): String = {
    val jt = if (joinType == "inner") "JOIN" else "LEFT JOIN"
    s"""SELECT l.event_id AS left_id, count(r.event_id) AS n_matches,
       |       CAST(sum(r.event_id) AS BIGINT) AS right_id_sum
       |FROM (SELECT * FROM events WHERE event_type = '${sq(leftType)}') l
       |$jt (SELECT * FROM events WHERE event_type = '${sq(rightType)}') r
       |  ON l.user_id = r.user_id
       | AND r.ts >= l.ts - INTERVAL $beforeMinutes MINUTE
       | AND r.ts <= l.ts + INTERVAL $afterMinutes MINUTE
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** LATE-DATA window semantics oracle: the stream arrives as two
    * micro-batches split by event_id parity — batch 1 (even ids) spans
    * the whole time range, so after it commits the watermark sits at
    * `max(even ts) − delay` (Spark tracks event-time stats in
    * MILLISECONDS, so the max is ms-floored), and batch 2's odd rows
    * are LATE: Spark drops exactly those whose window has already
    * closed (window_end ≤ watermark — state evicted, row filtered),
    * and absorbs the rest into still-open windows. The replay keeps an
    * odd row iff its window end is strictly past the watermark. This
    * is the semantic every monotone-staged streaming test structurally
    * cannot observe. */
  def lateWindowSql(widthUs: Long, delayMinutes: Long): String =
    s"""WITH wm AS (
       |  SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
       |         - INTERVAL $delayMinutes MINUTE AS w
       |  FROM events WHERE event_id % 2 = 0
       |)
       |SELECT make_timestamp((epoch_us(ts) // $widthUs) * $widthUs) AS window_start,
       |       event_type,
       |       count(*) AS n,
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM events, wm
       |WHERE event_id % 2 = 0
       |   OR make_timestamp((epoch_us(ts) // $widthUs) * $widthUs + $widthUs) > wm.w
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** LATE-DATA session semantics oracle — [[lateWindowSql]]'s sibling
    * for gap sessions, where streaming and batch GENUINELY diverge:
    * once the watermark (max even-id ts, ms-floored, − delay) passes a
    * session's end, Spark evicts and emits it; a late row landing just
    * after that session's last event starts a NEW session — the batch
    * engine would have merged them, so the streamed output can contain
    * overlapping sessions batch sessionization cannot produce. The
    * replay reproduces the streaming semantics exactly:
    * (1) sessions over the even (on-time) half; those ending ≤ wm are
    * EVICTED as-is; (2) rows of surviving even sessions plus late odd
    * rows whose own window end (ts + gap) clears wm re-sessionize
    * from scratch; (3) union. */
  def lateSessionSql(gapMinutes: Long, delayMinutes: Long): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH wm AS (
       |  SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000)
       |         - INTERVAL $delayMinutes MINUTE AS w
       |  FROM events WHERE event_id % 2 = 0
       |), even AS (
       |  SELECT user_id, ts FROM events WHERE event_id % 2 = 0
       |), ed AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= $gapUs
       |         THEN 1 ELSE 0 END AS brk
       |  FROM even WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), eg AS (
       |  SELECT user_id, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM ed
       |), es AS (
       |  SELECT user_id, sid, min(ts) AS session_start,
       |         max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |         count(*) AS n_events
       |  FROM eg GROUP BY 1, 2
       |), evicted AS (
       |  SELECT user_id, session_start, session_end, n_events
       |  FROM es, wm WHERE session_end <= wm.w
       |), keep AS (
       |  SELECT g.user_id, g.ts
       |  FROM eg g JOIN es s USING (user_id, sid) CROSS JOIN wm
       |  WHERE s.session_end > wm.w
       |  UNION ALL
       |  SELECT user_id, ts FROM events, wm
       |  WHERE event_id % 2 = 1 AND ts + INTERVAL $gapMinutes MINUTE > wm.w
       |), fd AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= $gapUs
       |         THEN 1 ELSE 0 END AS brk
       |  FROM keep WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), fg AS (
       |  SELECT user_id, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM fd
       |), fs AS (
       |  SELECT user_id, min(ts) AS session_start,
       |         max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |         count(*) AS n_events
       |  FROM fg GROUP BY user_id, sid
       |)
       |SELECT user_id, session_start, session_end, n_events FROM evicted
       |UNION ALL
       |SELECT user_id, session_start, session_end, n_events FROM fs
       |ORDER BY user_id, session_start, session_end""".stripMargin
  }

  /** StreamFuzz `sdedup` oracle: first-occurrence dedup through the
    * `mapGroupsWithState` custom-state path replayed as a batch
    * row_number. The stream arrives as `nBatches` micro-batches split
    * by `event_id % nBatches`, each pre-reduced to one winning row per
    * (key, batch) — min (ts, event_id) — so the streamed survivor per
    * key is the winner of the EARLIEST batch containing the key:
    * exactly `row_number() OVER (PARTITION BY key ORDER BY batch, ts,
    * event_id) = 1`. `keyExpr` arrives as a SQL fragment from the
    * fixed [[StreamFuzz.sdedupKeyExprs]] alphabet (not user input). */
  def firstOccurrenceSql(keyExpr: String, nBatches: Int): String =
    s"""WITH ranked AS (
       |  SELECT $keyExpr AS k,
       |         event_type || '#' || CAST(event_id AS VARCHAR) AS payload,
       |         row_number() OVER (PARTITION BY $keyExpr
       |           ORDER BY event_id % $nBatches, ts, event_id) AS rn
       |  FROM events
       |)
       |SELECT k, payload FROM ranked WHERE rn = 1 ORDER BY k""".stripMargin

  /** StreamFuzz `ssum` oracle: the streaming summing-MV
    * ([[graft.streaming.StreamingIngest.maintainSummingParts]]) at any
    * key shape — event_type, a date_trunc bucket, or both. Deliberately
    * INDEPENDENT of the epoch split: any disjoint split of the stream
    * into epoch parts must merge back to this from-scratch GROUP BY
    * (DECIMAL sums + integer counts make that bit-exact). */
  def streamSummingSql(keyMode: String, grain: String): String = {
    require(Seq("hour", "day").contains(grain), s"grain must be hour/day, got $grain")
    val keys = keyMode match {
      case "type"       => Seq("event_type")
      case "grain"      => Seq(s"CAST(date_trunc('$grain', ts) AS TIMESTAMP) AS bucket")
      case "type_grain" =>
        Seq("event_type", s"CAST(date_trunc('$grain', ts) AS TIMESTAMP) AS bucket")
      case other        => sys.error(s"unknown keyMode $other")
    }
    val positions = (1 to keys.size).mkString(", ")
    s"""SELECT ${keys.mkString(", ")},
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       |       count(*) AS n
       |FROM events
       |GROUP BY $positions ORDER BY $positions""".stripMargin
  }

  /** Parameterized q128 oracle: gap filling of the sparse
    * (event_id % mod = 0) per-type series at any grid `unit`
    * (hour/day) — the grid rebuilt with generate_series, the forward
    * fill replayed as a running last_value IGNORE NULLS. */
  def gapFillSql(mod: Int, unit: String): String = {
    require(Seq("hour", "day").contains(unit), s"unit must be hour/day, got $unit")
    s"""WITH sparse AS (
       |  SELECT event_type, CAST(date_trunc('$unit', ts) AS TIMESTAMP) AS bucket,
       |         count(*) AS n
       |  FROM events WHERE event_id % $mod = 0 GROUP BY 1, 2
       |), spans AS (
       |  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
       |  FROM sparse GROUP BY 1
       |), grid AS (
       |  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 ${unit.toUpperCase})) AS bucket
       |  FROM spans
       |), j AS (
       |  SELECT g.event_type, g.bucket, s.n FROM grid g
       |  LEFT JOIN sparse s ON g.event_type = s.event_type AND g.bucket = s.bucket
       |)
       |SELECT event_type, bucket,
       |       last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
       |       n IS NULL AS filled
       |FROM j ORDER BY 1, 2""".stripMargin
  }
}
