package graft.northstar

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.io.ParquetTable

/** IVF (inverted-file) approximate nearest neighbor — the scale path beyond
  * LSH (BASELINE.json north-star: "an IVF or LSH-bucketed variant").
  *
  * Build: KMeans (seeded, deterministic) coarse-quantizes the corpus into
  * `nlist` cells; each vector is stored under its nearest centroid.
  * [[IvfIndex.persist]] writes that assignment through a cell-partitioned
  * [[ParquetTable]] — the FAISS inverted-list layout as a parquet
  * directory — so a probe scans only the `nprobe` probed cells' partitions
  * (PartitionFilters on `cell`), ~`nprobe / nlist` of the data.
  *
  * Search: score each query against the (tiny, broadcast-as-literal)
  * centroid table, take the `nprobe` nearest cells, then rank exact cosine
  * only within those cells. On a persisted index the probed cell set is
  * first resolved driver-side (a queries-only job — centroids are literals,
  * so it never touches the corpus) and pushed as a static partition filter;
  * this is FAISS's own probe order (pick lists, then scan lists) and keeps
  * the corpus scan pruned at plan time rather than relying on runtime DPP.
  */
final class IvfIndex private (val nlist: Int,
    val centroids: Array[(Int, Seq[Double])], val assigned: DataFrame,
    private val persisted: Boolean) {

  /** Per-query distance to every centroid → the `nprobe` nearest cells,
    * exploded to one (query_id, __qv, cell) row per probed cell.
    */
  private def probeCells(queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.toDoubleVec(col(vecCol)).as("__qv"))
    // centroids ride along as literals (they are nlist × dims doubles)
    val cellScores = array(centroids.map { case (cell, c) =>
      struct((lit(-1.0) * GraftFunctions.cosine_sim(col("__qv"), typedLit(c)))
        .as("d"), lit(cell).as("cell"))
    }.toIndexedSeq: _*)
    q.withColumn("__cells",
        slice(array_sort(cellScores), 1, nprobe).getField("cell"))
      .select(col("query_id"), col("__qv"), explode(col("__cells")).as("cell"))
  }

  /** Per-query nprobe nearest cells → exact cosine rank within them. */
  def search(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val probed = probeCells(queries, idCol, vecCol, nprobe)
    // On a persisted index, resolve the probed cells first and prune the
    // partitioned corpus statically. The probe job reads ONLY the query
    // set (cheap by definition); the collected set is ≤ queries × nprobe
    // ints. The in-memory path skips this — there is nothing to prune.
    val corpus =
      if (persisted) {
        val cells = probed.select(col("cell")).distinct()
          .collect().map(_.getInt(0)).toIndexedSeq
        assigned.filter(col("cell").isin(cells: _*))
      } else assigned
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    corpus.join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        round(GraftFunctions.cosine_sim(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Write the inverted lists as a cell-partitioned versioned table and
    * return an index whose searches scan only probed partitions. Idempotent
    * layout (versioned dirs + atomic pointer) — safe to rebuild in place.
    * Superseded index versions are vacuumed by default (an index is derived
    * data — rebuildable, so history retention just multiplies storage);
    * pass `retainHistory = true` to keep them time-travelable.
    */
  def persist(spark: SparkSession, path: String,
      retainHistory: Boolean = false): IvfIndex = {
    val table = new ParquetTable(path, partitionColumns = Seq("cell"))
    table.overwrite(assigned)
    if (!retainHistory) table.vacuum()
    new IvfIndex(nlist, centroids, table.read(spark), persisted = true)
  }
}

object IvfIndex {

  /** Fit the coarse quantizer and assign every corpus vector to its cell.
    * The quantizer trains on a bounded deterministic sample (~256 vectors
    * per cell, the FAISS heuristic) with capped iterations — at 100 TB you
    * never run KMeans over the full corpus to place cell centers; only the
    * cheap assignment pass (`transform`) sees every vector.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L): IvfIndex = {
    val vecs = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.toDoubleVec(col(vecCol)).as("__cv"))
      .withColumn("features", array_to_vector(col("__cv")))
    // three actions read this projection (count, fit, transform) — cache it
    vecs.cache()
    val trainTarget = nlist * 256
    val n = vecs.count()
    val train =
      if (n <= trainTarget) vecs
      else vecs.sample(withReplacement = false, trainTarget.toDouble / n, seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features")
      .fit(train)
    val assigned = model.transform(vecs)
      .select(col("neighbor_id"), col("__cv"), col("prediction").as("cell"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
    new IvfIndex(nlist, centroids, assigned, persisted = false)
  }
}
