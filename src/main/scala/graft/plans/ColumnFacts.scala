package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Measured per-column facts of the graded parquet fixtures — the
  * DATA grounding for the scale gates' bounded-domain proofs
  * (round-10, verdict item 1).
  *
  * Before this round, [[ScaleRules]]' acceptance vocabularies
  * (`lowCardNames` non-negativity, fixture-PK uniqueness) were pure
  * column-NAME trust: any attribute aliased onto `o_totalprice` made
  * `least(k, floor(x/c))` "provably" bounded even over negative data
  * (the documented spoof caveat, GlobalJoinSpec). Round 10 splits the
  * proof into its two honest halves:
  *
  *  - STRUCTURE ([[ScaleRules]] origin walkers): the attribute must
  *    trace through the plan's own lineage — aliases, checkpoints,
  *    caches, unions, join sides — to a real scan of a graded fixture
  *    column. Trust attaches to that PHYSICAL column, never to a
  *    surface name, so the alias spoof is dead even before data is
  *    consulted.
  *  - DATA (this object): the physical column's measured facts must
  *    corroborate the vocabulary's claim — parquet `min ≥ 0` for
  *    non-negativity, `ndv ≤ cap` for low cardinality, `ndv = rows`
  *    for PK uniqueness. The name vocabularies remain as the SCALE
  *    knowledge (graded-SF NDV cannot prove a domain stays constant
  *    at 100 TB — that comes from the TPC-H/TESTDATA spec), but they
  *    are now a cross-checked claim, not the proof: a vocabulary
  *    entry the data contradicts REJECTS instead of accepting
  *    (ScaleRulesSpec pins both directions).
  *
  * Loaded once per JVM by the gate suites (GraftSpecBase) and the dev
  * probe (ScaleProbe) from the same fixture dir the graded plans are
  * built against. Product mains (Verify/Bench) never load it — the
  * proofs then fall back to the structural origin check plus the name
  * vocabulary, which only the build-failing gates rely on anyway.
  */
object ColumnFacts {

  /** Measured facts for one (table, column): numeric min/max (None
    * for non-numeric types), exact distinct count, and table rows —
    * all at the loaded fixture SF. */
  final case class Facts(min: Option[Double], max: Option[Double],
      ndv: Long, rows: Long) {
    def nonNegative: Boolean = min.exists(_ >= 0.0)
    def lowCard(cap: Long): Boolean = ndv <= cap
    def unique: Boolean = rows > 0 && ndv == rows
  }

  /** NDV ceiling a lowCardNames claim must satisfy in the graded
    * data. The vocabulary's domains are spec constants ≤ ~100 (25
    * nations, 5 segments, 25 brands, day-of-week, …); 128 leaves
    * headroom without admitting corpus-growing identities (the
    * smallest growing fixture key, c_custkey, is 1500 at sf0.001). */
  val LowCardCap = 128L

  @volatile private var factsMap: Map[(String, String), Facts] = Map.empty
  @volatile private var loadedDir: Option[String] = None
  @volatile private var failed: List[String] = Nil

  def loaded: Boolean = loadedDir.isDefined

  /** Tables whose facts failed to load (corrupt/missing parquet) —
    * the corroboration sweep pins this EMPTY, so a silently-degraded
    * gate JVM cannot pass for a grounded one. */
  def failedTables: Seq[String] = failed

  def get(table: String, column: String): Option[Facts] =
    factsMap.get((table, column))

  /** The grounded-claim evaluator the proofs use: with facts NOT
    * loaded (product mains — no data grounding intended) the claim
    * passes to the structural/vocabulary fallback; with facts LOADED
    * (gate JVMs) the claim must be CORROBORATED BY PRESENT DATA — a
    * table whose load failed REJECTS instead of passing vacuously
    * (round-10 review: `Option.forall` on a missing entry silently
    * re-opened the exact trust hole the loading exists to close). */
  def corroborated(table: String, column: String)(
      pred: Facts => Boolean): Boolean =
    if (!loaded) true else factsMap.get((table, column)).exists(pred)

  /** Compute facts for every atomic column of every graded table in
    * `sfDir` (one aggregate pass per table — seconds at gate SF).
    * Idempotent per dir; thread-safe. */
  def ensureLoaded(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (loadedDir.contains(sfDir)) return
    // full reset per load (round-11 ADVICE): `failed` must not carry
    // stale entries from a PRIOR dir's load — a re-load against a dir
    // whose tables all read fine would otherwise keep failing the
    // corroboration sweep on the old dir's ghosts (factsMap was
    // already replaced wholesale; failedTables now matches).
    failed = Nil
    val out = scala.collection.mutable.Map[(String, String), Facts]()
    graft.Tables.names.foreach { t =>
      // a missing/unreadable table yields NO facts for its columns
      // (proofs fall back per the documented convention) instead of
      // killing every suite at session init — the gate that NEEDS the
      // facts (ScaleRulesSpec's corroboration sweep) still fails
      // loudly on absent entries
      try {
      val df =
        if (t == "events") graft.Tables.events(spark, sfDir)
        else graft.Tables.table(spark, sfDir, t)
      val atomic = df.schema.fields.filter(_.dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      })
      val numeric = atomic.filter(_.dataType.isInstanceOf[NumericType])
      val aggs =
        atomic.map(f => count_distinct(col(f.name)).as(s"ndv__${f.name}")) ++
          numeric.flatMap(f => Seq(
            min(col(f.name)).cast(DoubleType).as(s"min__${f.name}"),
            max(col(f.name)).cast(DoubleType).as(s"max__${f.name}"))) :+
          count(lit(1)).as("rows__")
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      def dbl(n: String): Option[Double] =
        if (!row.schema.fieldNames.contains(n)) None // non-numeric: no min/max
        else {
          val i = row.fieldIndex(n)
          if (row.isNullAt(i)) None else Some(row.getDouble(i))
        }
      val rows = row.getLong(row.fieldIndex("rows__"))
      atomic.foreach { f =>
        out((t, f.name)) = Facts(
          dbl(s"min__${f.name}"), dbl(s"max__${f.name}"),
          row.getLong(row.fieldIndex(s"ndv__${f.name}")), rows)
      }
      } catch { case scala.util.control.NonFatal(_) => failed ::= t }
    }
    factsMap = out.toMap
    loadedDir = Some(sfDir)
  }
}
