package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector AGGREGATION over embedding columns — the reduce-side counterpart
  * of the per-row vector math in `org.apache.spark.sql.graft.VectorExprs`:
  * per-group element-wise mean (centroids). This is the training primitive
  * behind IVF index builds (`Similarity.ivfTopK`'s centroid stage), k-means
  * iterations, and class-prototype embeddings.
  *
  * Plan shape (the 100 TB part): `posexplode` flattens each vector to
  * (group, pos, value) SCALAR rows, so the shuffle carries fixed-width
  * numeric tuples (not whole vectors) and the per-(group,pos) mean gets
  * Spark's partial-aggregation (map-side combine) for free — the classic
  * long-form trick that keeps wide-vector aggregation inside codegen'd
  * HashAggregate instead of a per-group object agg over arrays. The
  * reassembly groupBy is over |groups|·dim tiny rows. Two shuffles total,
  * both on low-cardinality keys; no UDAF, no driver collection.
  */
object VectorAgg {

  /** Per-group element-wise mean of a fixed-width array column.
    * Output: (group, centroid: Array[Double]), one row per group. */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("group"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("group"), col("pos"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("group"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
}
