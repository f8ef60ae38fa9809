package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting can't apply (e.g. aggregations keyed on a hot
  * value, or joins below AQE's skew thresholds that still straggle).
  *
  * The big (skewed) side gets a random-but-deterministic salt in
  * [0, salts); the small side is replicated once per salt value. The
  * join key becomes (key, salt), spreading each hot key over `salts`
  * reducers. Replication cost: small side x salts rows — keep `salts`
  * modest (8-32) and the small side genuinely small.
  */
object SaltedJoin {
  def join(big: DataFrame, small: DataFrame, key: String, salts: Int = 16,
           joinType: String = "inner", saltOn: Option[Column] = None): DataFrame = {
    require(salts > 0)
    // right/full outer would emit every unmatched small-side row once
    // PER SALT REPLICA — only big-side-preserving join types are sound
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase),
      s"salted join supports big-side-preserving join types only, got $joinType")
    // deterministic salt so retried tasks salt identically; saltOn (a
    // cheap id column) spares hashing wide rows — and rows carrying a
    // MapType, which xxhash64 rejects outright — same escape hatch as
    // joinByPopulation
    val basis = saltOn.getOrElse(struct(big.columns.map(col): _*))
    val salted = big.withColumn("__salt", pmod(xxhash64(basis), lit(salts)))
    val replicated = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Population-adaptive salted equi-join for LOW-CARDINALITY skewed
    * keys (shard / cluster ids): the salt count per key value is sized
    * from the big side's population — saltc = ceil(n_key /
    * maxRowsPerTask) — so every join task carries at most
    * ~maxRowsPerTask big-side rows REGARDLESS of how skewed the key
    * populations are. This is [[graft.dedup.Dedup.adaptiveSalts]]'s
    * per-cluster discipline applied to a two-sided join: a uniform
    * salt sized for the hot key replicates every balanced key's probe
    * rows that many times too; the adaptive table concentrates
    * replication exactly where the skew is (balanced keys keep
    * saltc = 1).
    *
    * Mechanics: the big side partitions by a deterministic row hash
    * mod its key's saltc; `other` replicates per key to all salt
    * values; the join keys on (key, salt). The salt table is one
    * count-agg over the big side, broadcast — key cardinality must be
    * broadcast-small (shard counts are). Result-invariant: every
    * (big, other) row pair matching on `key` meets in exactly one
    * (key, salt) task. `other` may be a STREAMING frame (the
    * replication explode is a projection after a broadcast join, and
    * the final join is stream-static) — the hook
    * `StreamingSearch.scoreIvf(maxRowsPerTask = …)` threads through
    * here.
    *
    * WHEN TO REACH FOR THIS vs AQE: for a plain batch shuffle join,
    * AQE's own skew-split (`spark.sql.adaptive.skewJoin`) already
    * chops an oversized join partition into byte-bounded splits —
    * measured on a planted 50%-hot shard it beats this salt (no salt
    * columns, finer splits). The salt earns its keep where AQE cannot
    * run or cannot split: STREAM-STATIC joins (no AQE in streaming —
    * ScaleSmoke measures the straggler at ~3x the salted time there),
    * joins whose output partitioning a parent operator pins, and
    * engines/configs with skew-split off. `saltOn`: pass a CHEAP
    * deterministic per-row column (an id) — the default hashes the
    * whole row, which for wide rows (embedding arrays) is measurable
    * overhead; retried tasks must salt identically, so never pass a
    * nondeterministic expression.
    */
  def joinByPopulation(big: DataFrame, other: DataFrame, key: String,
                       maxRowsPerTask: Long, joinType: String = "inner",
                       saltOn: Option[Column] = None,
                       precomputedSalts: Option[DataFrame] = None): DataFrame = {
    require(maxRowsPerTask > 0, s"maxRowsPerTask must be positive, got $maxRowsPerTask")
    val allowed = Set("inner", "cross", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase),
      s"salted join supports big-side-preserving join types only, got $joinType")
    // `precomputedSalts`: the salt table is a count-agg over the big
    // side, re-derived on EVERY execution of the returned plan — fine
    // for a one-shot batch join, a per-tick corpus-side job for a
    // stream serving micro-batches. A long-lived caller materializes
    // [[populationSalts]] once per stream and passes it here (the
    // populations are a property of the static side; re-derive after
    // mass ingest).
    val salts = precomputedSalts.getOrElse(populationSalts(big, key, maxRowsPerTask))
    val basis = saltOn.getOrElse(struct(big.columns.map(col): _*))
    // NULL-SAFE lookup of the salt count: null keys form their own
    // group in `salts` (groupBy keeps a null group), but a plain
    // equi-join would drop them from the big side — silently violating
    // the big-side-preserving contract for left/leftouter/leftanti
    // (rows a plain join keeps would vanish). `<=>` matches the null
    // group; the coalesce covers only the unreachable no-match case
    // (the salt table is derived from `big` itself). Null-key rows
    // still match nothing in the final equi-join — exactly a plain
    // join's semantics.
    val salted = big.join(broadcast(salts), col(key) <=> col("__jk"), "left")
      .drop("__jk")
      .withColumn("__salt", pmod(xxhash64(basis), coalesce(col("__saltc"), lit(1L))))
      .drop("__saltc")
    // the SAME null-safe left join as the big side — deliberately:
    // both broadcasts of `salts` then carry an identical
    // HashedRelationBroadcastMode, so ReuseExchange serves the second
    // join from the first's broadcast instead of re-running the salts
    // aggregate (measured 2x on vdb_knn_join_ivf when this side used
    // a plain === against the big side's <=>). LEFT + coalesce(1),
    // not inner: with `precomputedSalts` a key can be absent from the
    // salt table (a shard populated after the table was materialized)
    // — an inner join would emit no replica and silently drop every
    // pair for that key, where the big side's coalesce keeps its rows
    // salted 0; one replica at salt 0 preserves them. Null-key other
    // rows would match the salt table's null group and explode
    // __saltc times — the group most likely to be hot — only for the
    // final null-unsafe equi-join to drop every replica; the sequence
    // bound caps them at ONE replica instead (same row count a plain
    // join would carry to the join before dropping it).
    val replicated = other.join(broadcast(salts), col(key) <=> col("__jk"), "left")
      .drop("__jk")
      .withColumn("__salt", explode(sequence(lit(0L),
        when(col(key).isNull, lit(0L))
          .otherwise(coalesce(col("__saltc"), lit(1L)) - 1))))
      .drop("__saltc")
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** The per-key salt-count table [[joinByPopulation]] derives from
    * its big side — exposed so a caller serving MANY joins against the
    * same static side (a query stream's micro-batches) can materialize
    * it once (`.localCheckpoint(true)`) instead of re-aggregating the
    * corpus per execution. Schema (__jk, __saltc), broadcast-small by
    * the key-cardinality contract.
    */
  def populationSalts(big: DataFrame, key: String,
                      maxRowsPerTask: Long): DataFrame =
    big.groupBy(key).agg(count(lit(1)).as("__n"))
      .select(col(key).as("__jk"), greatest(lit(1L),
        ceil(col("__n") / maxRowsPerTask.toDouble).cast("long")).as("__saltc"))
}
