package graft

/** Pure-JVM mirror of the engine's deterministic hash primitives
  * (TextOps.hash32 and the split/mix columns built on it), so sampling LAWS
  * can be property-tested at ScalaCheck volume without a Spark job per
  * sample. CorpusLawsBridgeSpec pins mirror ≡ Spark column on real corpus
  * rows; CorpusLaws then exercises the mirror across arbitrary inputs. */
object HashMirror {

  /** First 8 hex digits of md5, parsed as a long — TextOps.hash32. */
  def hash32(s: String): Long =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(4).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))

  /** CorpusOps.splitCol: deterministic 80/10/10 train/val/test routing. */
  def split(id: Long): String = {
    val bucket = hash32(s"split:$id") % 10
    if (bucket < 8) "train" else if (bucket == 8) "val" else "test"
  }

  /** CorpusOps.mixRate: per-source target keep rate in percent (1-100). */
  def mixRate(source: String): Long = hash32(s"mix:$source") % 100 + 1

  /** CorpusOps.mixKept: deterministic domain-mix keep membership. */
  def mixKept(id: Long, source: String): Boolean =
    hash32(s"samp:$id") % 1000000 < mixRate(source) * 10000
}
