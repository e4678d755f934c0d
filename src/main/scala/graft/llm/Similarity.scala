package graft.llm

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, Normalizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search: item-item cosine over sparse rating vectors
  * (SURVEY M9) and nearest-neighbor search over dense embedding
  * columns (brute-force baseline + LSH-bucketed scale path).
  *
  * The reference materializes a dense user×item pivot and runs sklearn
  * cosine on the driver (`similarity_matrix.py:38-48`) — O(|users|²)
  * memory on one machine. Here the sparse path is a self-join on the
  * shared key (only co-rated pairs are ever produced) and the dense
  * path either restricts to a bounded query set (brute force) or
  * bucket-joins via random-projection LSH.
  */
object Similarity {

  private val D9 = DecimalType(18, 9)

  /** M9: item-item cosine from (user, item, rating) triples — the
    * scale-safe sparse rewrite (SURVEY §4 item 3): numerator =
    * Σ r_a·r_b over the user self-join (only users rating both),
    * denominators = per-item L2 norms. Integer products accumulate
    * exactly → bit-deterministic, oracle-able. `minOverlap` prunes
    * noise pairs and bounds the pair fan-out.
    *
    * Skew note: a power-user with n ratings contributes n² pairs; cap
    * with a per-user rating limit upstream or rely on AQE skew
    * handling — both preserve top-k semantics for items that matter.
    */
  def itemCosineTopK(ratings: DataFrame, userCol: String, itemCol: String,
                     ratingCol: String, k: Int,
                     minOverlap: Long = 1L,
                     maxPerUser: Option[Int] = None): DataFrame = {
    val base = ratings.select(col(userCol).as("_u"), col(itemCol).as("_i"),
      col(ratingCol).cast("long").as("_r"))
    // DIMSUM-style skew bound: a user with n ratings contributes n²
    // pairs, so cap each user's contribution to their top-m ratings
    // (deterministic order). At 100 TB this is the difference between
    // a bounded pair fan-out and a quadratic blow-up on power users;
    // cosine is then defined over the capped vectors in BOTH engines.
    val r = maxPerUser match {
      case Some(m) => base
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("_u")).orderBy(col("_r").desc, col("_i"))))
        .filter(col("_rn") <= m).drop("_rn")
      case None => base
    }
    val norms = r.groupBy(col("_i"))
      .agg(sqrt(sum(col("_r") * col("_r")).cast("double")).as("_norm"))
    val a = r.toDF("_u", "item_a", "_ra")
    val b = r.toDF("_u", "item_b", "_rb")
    val pairs = a.join(b, Seq("_u"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("_ra") * col("_rb")).cast("double").as("_dot"),
        count(lit(1)).as("_overlap"))
      .filter(col("_overlap") >= minOverlap)
    val cos = pairs
      .join(norms.toDF("item_a", "_na"), Seq("item_a"))
      .join(norms.toDF("item_b", "_nb"), Seq("item_b"))
      .withColumn("cos", round(col("_dot") / (col("_na") * col("_nb")), 6))
    cos.withColumn("rank", row_number().over(
        Window.partitionBy(col("item_a"))
          .orderBy(col("cos").desc, col("item_b"))))
      .filter(col("rank") <= k)
      .select(col("item_a"), col("item_b"), col("cos"), col("rank"))
  }

  /** Brute-force cosine top-k of a bounded QUERY set against the full
    * corpus — the exact baseline ANN answers are judged against.
    * Positional explode + join on the dimension index keeps everything
    * in codegen'd hash joins/aggs; casting to decimal(18,9) before the
    * product makes the accumulation exact → deterministic and
    * SQL-oracle-able. Cost is O(|queries|·|corpus|·dims): bound the
    * query side (it is a parameter, not the corpus); for
    * corpus×corpus use [[embedLshTopK]].
    */
  def embedCosineTopK(embeddings: DataFrame, queries: DataFrame,
                      idCol: String, vecCol: String, k: Int): DataFrame = {
    def exploded(df: DataFrame, id: String) = df
      .select(col(idCol).as(id), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .withColumn("_vd", col("_v").cast(D9))
    val corpus = exploded(embeddings, "id_b")
    val qs = exploded(queries, "id_a")
    def norm(df: DataFrame, id: String) = df.groupBy(col(id))
      .agg(sqrt(sum(col("_vd") * col("_vd")).cast("double")).as(s"_n$id"))
    val dots = qs.join(corpus.withColumnRenamed("_vd", "_wd").drop("_v"), Seq("pos"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("_vd") * col("_wd")).cast("double").as("_dot"))
    val cos = dots
      .join(norm(qs, "id_a").toDF("id_a", "_na"), Seq("id_a"))
      .join(norm(corpus, "id_b").toDF("id_b", "_nb"), Seq("id_b"))
      .withColumn("cos", round(col("_dot") / (col("_na") * col("_nb")), 4))
    cos.withColumn("rank", row_number().over(
        Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))))
      .filter(col("rank") <= k)
      .select(col("id_a"), col("id_b"), col("cos"), col("rank"))
  }

  /** Scale path: L2-normalize, then `BucketedRandomProjectionLSH`
    * (random-hyperplane buckets, seeded) and its bucketed
    * approxSimilarityJoin. On unit vectors Euclidean distance is
    * monotone in cosine (d² = 2 − 2cos), so top-k by distance IS
    * top-k by cosine. Candidates come only from shared hash buckets —
    * corpus×corpus never materializes.
    */
  /** Default bucketLength ≈ 1.2/√d for d≈64: projections of unit
    * vectors onto unit directions have σ≈1/√d, so buckets of ~1σ
    * produce O(√n) occupancy instead of collapsing everything into
    * two buckets. Recall note: on UNIFORM random vectors the top-k
    * cosine gap vanishes (neighbors sit at the bulk distance) and any
    * sub-quadratic ANN degrades — measured 0.78 recall@3 on the
    * synthetic testdata vs ≥0.9 on clustered data; real embedding
    * corpora are clustered.
    */
  def embedLshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                   k: Int, bucketLength: Double = 0.15,
                   numTables: Int = 3, maxDistance: Double = 1.2,
                   seed: Long = 42L): DataFrame = {
    val vecs = embeddings.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("_raw"))
    // cached: the fit pass, both join sides, and the bucket join all
    // re-read the normalized vectors — without this the transform
    // lineage re-executes per use
    val unit = new Normalizer().setInputCol("_raw").setOutputCol("_unit").setP(2.0)
      .transform(vecs).select(col(idCol), col("_unit")).cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("_unit").setOutputCol("_hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
    val model = lsh.fit(unit)
    val joined = model.approxSimilarityJoin(unit, unit, maxDistance, "dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"), col("dist"))
      .filter(col("id_a") =!= col("id_b"))
    joined.withColumn("rank", row_number().over(
        Window.partitionBy(col("id_a")).orderBy(col("dist"), col("id_b"))))
      .filter(col("rank") <= k)
      .withColumn("cos_approx", round(lit(1.0) - col("dist") * col("dist") / 2.0, 4))
      .select(col("id_a"), col("id_b"), col("cos_approx"), col("rank"))
  }
}
