package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the deterministic-sampling LAWS the corpus operators
  * rely on (SURVEY §5): runs on the [[HashMirror]] pure-JVM twin at
  * ScalaCheck volume — CorpusLawsBridgeSpec separately pins mirror ≡ Spark
  * column, which transfers every law proved here to the engine's columns. */
object CorpusLaws extends Properties("CorpusLaws") {

  private val sourceGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(16))

  // Domain mixing: the empirical keep fraction over a block of ids must
  // converge to the per-source target rate srcRate/100 (law of large
  // numbers over the samp-hash; 10k ids ⇒ σ ≈ 0.005, bound 0.025).
  property("domain-mix keep-rate converges to srcRate/100") =
    Prop.forAll(sourceGen, Gen.chooseNum(0L, 1000000L)) { (src, start) =>
      val n = 10000
      val rate = HashMirror.mixRate(src) / 100.0
      val kept = (start until start + n).count(HashMirror.mixKept(_, src))
      math.abs(kept.toDouble / n - rate) < 0.025
    }

  // Hash split: the routing must agree with an INDEPENDENT reimplementation
  // of the spec (full md5 hex digest → BigInt of the first 8 chars → mod-10
  // bucket). Falsifiable where a recompute-and-compare of the same function
  // would be a tautology: a byte-fold bug in the mirror, a threshold drift,
  // or a salt change all fail here. Subset-stability of the SPARK column
  // (the pure-function-of-id law) is pinned by CorpusLawsBridgeSpec, which
  // compares full-table and filtered-table routings through real plans.
  property("hash-split routing matches an independent md5 reimplementation") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue - 1)) { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val bucket = BigInt(hex.take(8), 16) % 10
      val expected =
        if (bucket < 8) "train" else if (bucket == 8) "val" else "test"
      HashMirror.split(id) == expected
    }

  // Hash split: 80/10/10 proportions hold on ANY id window, not just the
  // fixture corpus's 0..n range (InvariantCheck checks the corpus; this
  // checks arbitrary ranges, e.g. a shard's id slice).
  property("hash-split proportions ≈ 80/10/10 on any id window") =
    Prop.forAll(Gen.chooseNum(0L, 100000000L)) { start =>
      val n = 5000
      val splits = (start until start + n).map(HashMirror.split)
      val frac = splits.groupBy(identity).view.mapValues(_.size / n.toDouble)
      math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.05 &&
        math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.03 &&
        math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.03
    }
}
