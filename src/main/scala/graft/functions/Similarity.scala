package graft.functions

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-d float vectors).
  *
  * Two paths, as a large-scale pipeline needs:
  *  - brute-force cosine top-k — the exact baseline. Probes are broadcast,
  *    so the big side streams through one codegen stage with NO shuffle of
  *    the corpus; per-probe top-k is a bounded window. O(probes × corpus)
  *    compute but linear IO — at 100 TB you run it only for small probe
  *    sets.
  *  - random-hyperplane LSH ANN — the scale path: 16-bit sign buckets from
  *    seeded hyperplanes; candidates share a bucket, exact cosine re-ranks
  *    candidates only. Corpus signatures are one map-side pass; the search
  *    join is keyed on the bucket (shuffle ∝ bucket collisions, not n²).
  *
  * All dot products cast elements to double BEFORE multiplying and fold
  * left-to-right (functions.aggregate), so results are bit-deterministic
  * and reproducible against the DuckDB oracle.
  */
object Similarity {

  /** Left-fold dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Deterministic random hyperplanes: nPlanes × dim doubles, seed fixed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket of a vector under the given hyperplanes: an Int with one
    * sign bit per plane (16 planes → 65k buckets). */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce[Column](_ + _)

  /** Exact cosine top-k of `corpus` rows for each probe row (probe side is
    * broadcast). Ranking uses the ROUNDED score + vec_id tiebreak so order
    * is stable under float summation noise. */
  def cosineTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val joined = corpus.alias("c")
      .join(broadcast(probes.alias("p")), col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("vec_id"),
        round(dot(col("p.embedding"), col("c.embedding"))
          / (l2norm(col("p.embedding")) * l2norm(col("c.embedding"))), 6).as("cos"))
    joined
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("vec_id"), col("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact cosine top-5 for the first 10 vectors as probes.
    "q30_cosine_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      cosineTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy(col("probe_id"), col("rk"))
    }),

    // IVF-style ANN (the scale path): a deterministic sample of corpus
    // vectors acts as the coarse quantizer (k-means++-style seeding without
    // the iterations); every vector is assigned to its nearest centroid
    // cell (broadcast centroids — one codegen pass, no corpus shuffle
    // beyond the cell key), probes search their nProbe=4 nearest cells and
    // exact cosine re-ranks candidates only. Cost per probe ≈ nProbe/k of
    // the corpus vs all of it for q30. Approximate by design —
    // SimilaritySpec measures recall against q30 instead of an oracle.
    "q31_ann_ivf" -> ((s, d) => {
      val emb = embeddings(s, d)
      // k ≈ 17 deterministic centroids from the corpus itself
      val centroids = emb.filter(col("vec_id") % 29 === 3)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
      def cosTo(v: Column, c: Column): Column =
        round(dot(v, c) / (l2norm(v) * l2norm(c)), 6)
      val scored = emb.join(broadcast(centroids))
        .select(col("vec_id"), col("embedding"), col("centroid_id"),
          cosTo(col("embedding"), col("c_emb")).as("ccos"))
      // nearest centroid per corpus vector (max struct → deterministic)
      val assigned = scored
        .groupBy(col("vec_id"), col("embedding"))
        .agg(max(struct(col("ccos"), col("centroid_id"))).as("m"))
        .select(col("vec_id"), col("embedding"), col("m.centroid_id").as("cell"))
      // probes search their 4 nearest cells
      val probeCells = scored.filter(col("vec_id") < 10)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("centroid_id"))))
        .filter(col("rk") <= 4)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
          col("centroid_id").as("cell"))
      val cands = probeCells
        .join(assigned.select(col("vec_id"), col("embedding"), col("cell")), Seq("cell"))
        .filter(col("probe_id") =!= col("vec_id"))
        .select(col("probe_id"), col("vec_id"),
          cosTo(col("p_emb"), col("embedding")).as("cos"))
        .distinct()
      cands
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rk") <= 5)
        .select(col("probe_id"), col("rk"), col("vec_id"), col("cos"))
        .orderBy(col("probe_id"), col("rk"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q30_cosine_topk" ->
      """WITH scored AS (
           SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
             round(list_dot_product(p.embedding::DOUBLE[], c.embedding::DOUBLE[])
               / (sqrt(list_dot_product(p.embedding::DOUBLE[], p.embedding::DOUBLE[]))
                * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
               6) AS cos
           FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
           WHERE p.vec_id < 10),
         ranked AS (
           SELECT probe_id, vec_id, cos,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY cos DESC, vec_id) AS rk
           FROM scored)
         SELECT probe_id, rk, vec_id, cos FROM ranked
         WHERE rk <= 5 ORDER BY probe_id, rk"""
  )
}
