package graft

import org.apache.spark.sql.functions._

import graft.operators.Boost

/**
 * Boost scorer parse + decay semantics against the reference
 * (usecases/traverser/boost_scorer.go): Go-duration strings, invalid-scale
 * conditions, and the weight-denominator contract for invalid conditions.
 */
class BoostSpec extends SparkSpecBase {
  import spark.implicits._

  test("parseNumericOrDuration: d/h/m/s/ms pattern, Go compounds, plain floats — all in ns") {
    assert(Boost.parseNumericOrDuration("2d") == 2 * 24 * 3600e9)
    assert(Boost.parseNumericOrDuration("1.5h") == 1.5 * 3600e9)
    assert(Boost.parseNumericOrDuration("250ms") == 2.5e8)
    // time.ParseDuration fallback (boost_scorer.go:646-648)
    assert(Boost.parseNumericOrDuration("1h30m") == 5.4e12)
    assert(Boost.parseNumericOrDuration("100ns") == 100.0)
    assert(Boost.parseNumericOrDuration("-1.5h") == -5.4e12)
    assert(Boost.parseNumericOrDuration("2us") == 2e3)
    assert(Boost.parseNumericOrDuration("1h30m45s") == 5.4e12 + 45e9)
    // plain number last (strconv.ParseFloat)
    assert(Boost.parseNumericOrDuration("42.5") == 42.5)
    assert(Boost.parseNumericOrDuration("") == 0.0)
    intercept[NumberFormatException](Boost.parseNumericOrDuration("abc"))
    intercept[NumberFormatException](Boost.parseNumericOrDuration("1h30x"))
  }

  test("decayScore: scale <= 0 invalidates the condition — uniform 0, even at distance 0") {
    // parseDecayParams returns parsedDecay{} → computeDecayForResult 0
    // (boost_scorer.go:485-487,529-531); substituting scale=1 would instead
    // rescale the pool
    val df = Seq(0.0, 1.0, 5.0).toDF("d")
    val zeroScale = df.select(Boost.decayScore(col("d"), 0.0, 0.0, "exp", 0.5).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(zeroScale == Seq(0.0, 0.0, 0.0))
    val negScale = df.select(Boost.decayScore(col("d"), 0.0, -3.0, "gauss", 0.5).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(negScale == Seq(0.0, 0.0, 0.0))
    // sanity: a valid scale still decays from 1.0 at d=0
    val valid = df.select(Boost.decayScore(col("d"), 0.0, 5.0, "exp", 0.5).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(valid.head == 1.0 && valid(1) > valid(2))
  }

  test("applyBoost: an invalid condition scores 0 but its |weight| stays in the denominator") {
    // scoreResult (boost_scorer.go:172-211): Σ wᵢ·sᵢ / Σ|wᵢ| over ALL
    // conditions — an invalid decay halves a matching filter's contribution
    val pool = Seq(("a", 2.0), ("b", 1.0)).toDF("id", "score")
    val conds = Seq(
      (lit(1.0), 1.0),                                        // filter matches everything
      (Boost.decayScore(lit(3.0), 0.0, 0.0, "exp", 0.5), 1.0)) // invalid scale → 0
    val out = Boost.applyBoost(pool, "id", col("score"), conds, 1.0, "final")
      .select("id", "final").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // boost = (1*1 + 0*1)/2 = 0.5 for both rows → flat combined → minMax 1.0
    assert(out("a") == 1.0 && out("b") == 1.0)
    // at weight 0.5 the primary still separates them: combined a=0.75, b=0.25 → normalized 1/0
    val mixed = Boost.applyBoost(pool, "id", col("score"), conds, 0.5, "final")
      .select("id", "final").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mixed("a") == 1.0 && mixed("b") == 0.0)
  }
}
