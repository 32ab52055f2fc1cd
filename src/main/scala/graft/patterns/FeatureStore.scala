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

    val featSide = features.select(
      col(entityCol).as("_e") +:
        col(featureTsCol).as("_ts") +:
        lit(0).as("_side") +:
        (featCols.map(c => col(c).as(s"_f_$c")) ++
          labelCols.map(c => lit(null).cast(labels.schema(c).dataType).as(s"_l_$c")) :+
          col(featureTsCol).as("_f_ts_val")): _*)

    val labelSide = labels.select(
      col(entityCol).as("_e") +:
        col(labelTsCol).as("_ts") +:
        lit(1).as("_side") +:
        (featCols.map(c => lit(null).cast(features.schema(c).dataType).as(s"_f_$c")) ++
          labelCols.map(c => col(c).as(s"_l_$c")) :+
          lit(null).cast(features.schema(featureTsCol).dataType).as("_f_ts_val")): _*)

    val w = Window.partitionBy(col("_e"))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = featSide.unionByName(labelSide)
      .select(
        (Seq(col("_e"), col("_ts"), col("_side")) ++
          featCols.map(c => last(col(s"_f_$c"), ignoreNulls = true).over(w).as(s"_c_$c")) ++
          Seq(last(col("_f_ts_val"), ignoreNulls = true).over(w).as("_c_fts")) ++
          labelCols.map(c => col(s"_l_$c"))): _*)

    carried.filter(col("_side") === 1)
      .select(
        (labelCols.map(c => col(s"_l_$c").as(c)) ++
          Seq(col("_c_fts").as(featureTsCol)) ++
          featCols.map(c => col(s"_c_$c").as(c))): _*)
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
