package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Cardinality sketches — the one-pass, constant-state summaries a 100 TB
  * profiling pass runs where exact `COUNT(DISTINCT)` is infeasible. The
  * sketch family here complements the engine's existing ones: Misra-Gries
  * (heavy hitters, StreamingText), Bloom (membership, decontaminateBloom),
  * MinHash/SimHash (similarity, TextPipeline).
  *
  * HyperLogLog (Flajolet-Fusy-Gandouet-Meunier, AofA'07): hash each item,
  * use the first byte as a register index (m=256) and the position of the
  * leading 1-bit in the next 56 bits as the register value; the harmonic
  * mean of 2^-M_j estimates the distinct count with sigma = 1.04/sqrt(m)
  * ~ 6.5%. Spark ships approx_count_distinct (its own HLL++), but its
  * registers are private and its hash engine-specific — this
  * implementation derives registers from md5 STRINGS, so the DuckDB
  * oracle replays the sketch REGISTER-FOR-REGISTER and the estimate is
  * bit-identical across engines (the same reason the LSH family hashes
  * with md5).
  *
  * Scale shape: tokenize once; the (lang, register) aggregation is
  * map-side combined, so each partition contributes at most m rows per
  * language to the shuffle regardless of row count — the whole sketch
  * moves #langs x 256 longs. The register sum uses exact DECIMAL
  * arithmetic on integer-scaled powers of two (2^(57-rho)), so the
  * reduction is order-independent — no float-summation drift between
  * engines or between runs.
  */
object Sketches {

  private val M = 256 // registers: first 2 hex chars of md5
  private val TailHex = 14 // next 14 hex chars = 56 bits for rho
  /** 2^57 — the integer scale that makes every register term
    * 2^(57-rho) an exact long (rho in 1..57).
    */
  private val Scale = 1L << 57

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** rho = position of the first 1-bit in the 56-bit tail (1-based), 57
    * when the tail is all zeros — computed on the hex STRING (leading
    * zero hex digits, then a CASE on the first significant nibble), so
    * the oracle's replay is textually parallel.
    */
  private def rho(h: Column): Column = {
    val tail = substring(h, 3, TailHex)
    val sig = ltrim(tail, "0")
    val hexZeros = lit(TailHex) - length(sig)
    val nib = conv(substring(sig, 1, 1), 16, 10).cast("int")
    val nibZeros = when(nib >= 8, 0).when(nib >= 4, 1)
      .when(nib >= 2, 2).otherwise(3)
    when(length(sig) === 0, lit(57))
      .otherwise(hexZeros * 4 + nibZeros + lit(1))
      .cast("int")
  }

  /** Per-language HLL distinct-token estimate, with the exact count and
    * relative error alongside — the calibration columns a profiling run
    * reports at small SF (at 100 TB the exact column is the one you can
    * no longer afford; the sketch is the product). Estimator: alpha_m *
    * m^2 / sum_j 2^-M_j with untouched registers contributing 2^0, and
    * the standard small-range correction m*ln(m/V) when the raw estimate
    * is under 2.5m and V registers are untouched.
    */
  def hllDistinctTokens(spark: SparkSession, sfDir: String): DataFrame =
    hllDistinctTokensFrom(docs(spark, sfDir))

  def hllDistinctTokensFrom(corpus: DataFrame): DataFrame = {
    val tok = corpus
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val h = md5(col("token"))
    val reg = conv(substring(h, 1, 2), 16, 10).cast("long")
    // (lang, register) -> max rho: map-side combine caps each partition's
    // shuffle contribution at m rows per language
    val registers = tok
      .select(col("lang"), reg.as("register"), rho(h).as("r"))
      .groupBy("lang", "register")
      .agg(max(col("r")).as("rho"))
    // exact-integer register sum: 2^(57-rho) as DECIMAL(38,0); untouched
    // registers contribute 2^57 each (2^-0 scaled)
    val summed = registers.groupBy("lang")
      .agg(sum(expr("shiftleft(1L, 57 - rho)")
          .cast("decimal(38,0)")).as("s_present"),
        count(lit(1)).as("present"))
      .withColumn("s_total",
        col("s_present") + (lit(M) - col("present")).cast("decimal(38,0)")
          * lit(Scale).cast("decimal(38,0)"))
      .withColumn("v_zero", lit(M) - col("present"))
    // the raw estimate and small-range correction, spelled as the same
    // IEEE expression the oracle uses (literal-for-literal)
    val estRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(Scale.toDouble) / col("s_total").cast("double")
    val est = when(estRaw <= lit(640.0) && col("v_zero") > 0,
      lit(256.0) * log(lit(256.0) / col("v_zero").cast("double")))
      .otherwise(estRaw)
    val exact = tok.groupBy("lang")
      .agg(countDistinct(col("token")).as("exact_distinct"))
    summed
      .join(exact, Seq("lang"))
      .select(col("lang"), col("present").cast("long").as("n_registers"),
        round(est, 4).as("hll_distinct"), col("exact_distinct"),
        round(abs(est - col("exact_distinct").cast("double"))
          / col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy("lang")
  }
}
