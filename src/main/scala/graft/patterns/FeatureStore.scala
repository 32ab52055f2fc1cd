package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time feature store: materialization + as-of join — the
  * reference's feature_table pattern ("point-in-time feature values ...
  * time-travel for training data consistency",
  * `docs/table-template-reference.md:290-295`;
  * `table-templates/feature_table.yaml`).
  */
object FeatureStore {

  /** `asof_feature_join`: for each label row, attach the latest feature row
    * of the same entity with feature_ts <= label_ts.
    *
    * Implemented as union + single window pass (the scalable as-of):
    * tag both sides, union, window over (entity ORDER BY ts, side) carrying
    * the last seen feature values forward, keep label rows. Exactly ONE
    * shuffle on the entity key and no range-join row explosion — a
    * join-on-inequality plan would blow up to |labels|x|features| per
    * entity before filtering, which is fatal at 100 TB.
    *
    * Features with feature_ts == label_ts are visible (<= semantics): the
    * union orders feature rows before label rows at equal timestamps.
    */
  def asofJoin(
      labels: DataFrame,
      features: DataFrame,
      entityCol: String,
      labelTsCol: String,
      featureTsCol: String): DataFrame = {

    val featCols = features.columns.filterNot(c => c == entityCol || c == featureTsCol).toSeq
    val labelCols = labels.columns.toSeq

    // the feature payload travels as ONE struct, so last(ignoreNulls)
    // carries whole rows: a newer feature row whose individual values are
    // null correctly shadows older non-null values (per-column carry
    // would resurrect them, breaking point-in-time semantics)
    val fRowType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__fts", features.schema(featureTsCol).dataType) +:
        featCols.map(c => features.schema(c)))

    val featSide = features.select(
      Seq(col(entityCol).as("_e"), col(featureTsCol).as("_ts"), lit(0).as("_side"),
        struct(col(featureTsCol).as("__fts") +: featCols.map(col): _*).as("_f")) ++
        labelCols.map(c => lit(null).cast(labels.schema(c).dataType).as(s"_l_$c")): _*)

    val labelSide = labels.select(
      Seq(col(entityCol).as("_e"), col(labelTsCol).as("_ts"), lit(1).as("_side"),
        lit(null).cast(fRowType).as("_f")) ++
        labelCols.map(c => col(c).as(s"_l_$c")): _*)

    val w = Window.partitionBy(col("_e"))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = featSide.unionByName(labelSide)
      .select(
        (Seq(col("_side"), last(col("_f"), ignoreNulls = true).over(w).as("_cf")) ++
          labelCols.map(c => col(s"_l_$c"))): _*)

    carried.filter(col("_side") === 1)
      .select(
        (labelCols.map(c => col(s"_l_$c").as(c)) ++
          Seq(col("_cf").getField("__fts").as(featureTsCol)) ++
          featCols.map(c => col("_cf").getField(c).as(c))): _*)
  }

  /** `feature_materialize`: produce the feature_table shape from per-entity
    * aggregation of a raw fact table (groupBy entity = one shuffle with
    * map-side partial aggregation).
    */
  def materialize(
      facts: DataFrame,
      entityCol: String,
      tsCol: String,
      featureSet: String,
      modelVersion: String,
      computedAt: Column,
      aggs: Map[String, Column]): DataFrame = {
    val aggCols = aggs.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    facts.groupBy(col(entityCol).as("entity_id"))
      .agg(max(col(tsCol)).as("feature_timestamp"), aggCols: _*)
      .withColumn("feature_set", lit(featureSet))
      .withColumn("model_version", lit(modelVersion))
      .withColumn("computed_at", computedAt)
  }
}
