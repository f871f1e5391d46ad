package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, RegexTokenizer}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Spark MLlib realizations of the scale-path operators: the `spark.ml`
  * MinHashLSH estimator for near-dup candidate joins and seeded KMeans for
  * IVF coarse centroids. These complement the hand-rolled, oracle-gated
  * versions in `graft.text`/`graft.sim` — MLlib's sketches are not
  * reproducible in DuckDB, so these run under the rows-only check with
  * ScalaTest assertions tying them back to the exact implementations.
  *
  * All stages are seeded; results are deterministic for a fixed input.
  */
object MlOps {

  /** documents → sparse binary term vectors (tokenize → hash features). */
  def termVectors(s: SparkSession, d: String): DataFrame = {
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("tokens")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true)
    new Pipeline().setStages(Array(tok, tf))
      .fit(Tables.documents(s, d))
      .transform(Tables.documents(s, d).repartition(col("doc_id")))
  }

  /** spark.ml MinHashLSH near-dup join: fit seeded hash tables, self-join at
    * Jaccard distance ≤ 0.6, count surviving pairs per distance bucket. */
  private val qMlMinhash = Q(
    "q_ml_minhash_neardup",
    (s, d) => {
      val vecs = termVectors(s, d).cache()
      val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(8).setSeed(42L)
      val model = lsh.fit(vecs)
      val pairs = model
        .approxSimilarityJoin(vecs, vecs, 0.6, "jaccard_dist")
        .select(col("datasetA.doc_id").as("doc_a"),
          col("datasetB.doc_id").as("doc_b"), col("jaccard_dist"))
        .filter(col("doc_a") < col("doc_b"))
      pairs
        .groupBy(round(col("jaccard_dist"), 1).as("dist_bucket"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("dist_bucket"))
    },
    None)

  /** Seeded KMeans as the IVF coarse quantizer: k=10 over the embeddings,
    * report cluster sizes (k rows — stable shape for the rows-only check). */
  private val qMlKmeans = Q(
    "q_ml_kmeans_ivf",
    (s, d) => {
      val toVec = udf((a: Seq[Float]) =>
        Vectors.dense(a.map(_.toDouble).toArray): Vector)
      val vecs = Tables.embeddings(s, d)
        .repartition(col("vec_id"))
        .withColumn("features", toVec(col("embedding")))
      val km = new KMeans().setK(10).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cluster")
      val model = km.fit(vecs)
      model.transform(vecs)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("cluster"))
    },
    None)

  def queries: Seq[Q] = Seq(qMlMinhash, qMlKmeans)
}
