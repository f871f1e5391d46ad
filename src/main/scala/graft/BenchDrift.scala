package graft

/** Pure drift-adjudication logic behind Bench's machine-readable `drift`
  * section — extracted so the protocol BASELINE.md prescribes in prose is
  * unit-testable (BenchDriftSpec) instead of living only inside a timing
  * harness that needs a Spark session and a noisy VM to exercise.
  *
  * Protocol: a pass is comparable iff its calibration sample is clean
  * (≤ [[CalibClean]] ABSOLUTE — steady calibration runs ~0.3-0.8 s,
  * contended windows 3-4 s+; absolute rather than relative-to-min, because
  * in a fully contended run a relative bound would bless every pass and
  * convert shared contention into false "structural" verdicts). Structural
  * regression = ≥2 clean passes with even the BEST of them ≥2× steady:
  * min-based, so a single slow sample (a VM excursion, or
  * `q_embed_neardup_ivf`'s expected pass-1 index build) can never flag
  * while a genuine regression (every clean pass ≥2×) always does. */
object BenchDrift {

  /** Absolute calibration-cleanliness bound, seconds. */
  val CalibClean = 1.5

  /** Indices of calibration-clean passes. */
  def cleanIdx(cs: Seq[Double]): Seq[Int] =
    cs.indices.filter(i => cs(i) <= CalibClean)

  /** Verdict for one query: `samples` are its per-pass seconds (-1 marks a
    * failed rep), `calib` the block's per-pass calibration samples,
    * `steady` its checked-in steady-state entry (None → first samples
    * become the baseline). */
  def status(steady: Option[Double], samples: Seq[Double],
      calib: Seq[Double]): String = {
    val clean = cleanIdx(calib).map(samples).filter(_ >= 0)
    steady match {
      case None => "new"
      case Some(s0) =>
        if (samples.forall(_ < 0)) "failed"
        else if (clean.isEmpty) "no_clean_pass"
        else if (clean.size >= 2 && clean.min >= 2.0 * s0) "structural"
        else if (clean.min > 1.3 * s0) "noise" // outside ±30%, not proven
        else "ok"
    }
  }

  /** Parse the steady-state table (`bench_steady_state.json`): every
    * numeric entry of every object-valued section except `comment`,
    * flattened to query → seconds. Malformed input → empty map (Bench
    * reports `drift_baseline: "missing"`). */
  def parseSteady(json: String): Map[String, Double] = try {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(json) match {
      case JObject(sections) => sections.collect {
        case (k, JObject(entries)) if k != "comment" => entries.collect {
          case (q, JDouble(v)) => q -> v
          case (q, JInt(v)) => q -> v.toDouble
          case (q, JDecimal(v)) => q -> v.toDouble
        }
      }.flatten.toMap
      case _ => Map.empty[String, Double]
    }
  } catch { case _: Throwable => Map.empty[String, Double] }
}
