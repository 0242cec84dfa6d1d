package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.format.StoragePaths
import graft.views.{MaterializedView, View}

/** Directory catalog: dataset name → `<root>/<name>` location; a dataset
  * exists iff its entrypoint file does (reference `DirCatalog`,
  * `/root/reference/python/src/space/catalogs/directory.py:30-77`,
  * `BaseCatalog` surface catalogs/base.py:29-85). */
final class DirCatalog(val spark: SparkSession, val root: String) {

  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def location(name: String): String = new Path(rootPath, name).toString

  def createDataset(
      name: String,
      schema: StructType,
      primaryKeys: Seq[String],
      recordFields: Seq[String] = Nil,
      statsFields: Seq[String] = Nil,
      bucketColumns: Seq[String] = Nil,
      numBuckets: Int = 0,
      bloomColumns: Seq[String] = Nil,
      writeClusterBy: Seq[String] = Nil,
      bucketCounts: Seq[Int] = Nil): SpaceDataset = {
    require(!exists(name), s"dataset $name already exists")
    SpaceDataset.create(spark, location(name), schema, primaryKeys, recordFields, statsFields,
      bucketColumns, numBuckets, bloomColumns, writeClusterBy, bucketCounts)
  }

  def createMaterializedView(
      name: String,
      view: View,
      primaryKeys: Seq[String],
      recordFields: Seq[String] = Nil): MaterializedView = {
    require(!exists(name), s"dataset $name already exists")
    MaterializedView.create(spark, location(name), view, primaryKeys, recordFields)
  }

  def createAggregateView(
      name: String,
      source: SpaceDataset,
      groupBy: Seq[String],
      aggs: Seq[graft.views.AggSpec],
      filter: Option[String] = None): graft.views.AggregateView = {
    require(!exists(name), s"dataset $name already exists")
    graft.views.AggregateView.create(spark, location(name), source, groupBy, aggs, filter)
  }

  def createJoinView(
      name: String,
      left: SpaceDataset,
      right: SpaceDataset,
      keys: Seq[String],
      leftFields: Seq[String],
      rightFields: Seq[String],
      joinType: String = graft.views.JoinView.Inner): graft.views.JoinView = {
    require(!exists(name), s"dataset $name already exists")
    // outer views derive companion unmatched-state table names — a
    // catalog dataset already sitting on one would collide (ADVICE r14)
    if (joinType == graft.views.JoinView.LeftOuter ||
        joinType == graft.views.JoinView.FullOuter)
      require(!exists(name + "__unmatched"),
        s"dataset ${name}__unmatched already exists — an outer join view " +
          s"named $name stores its unmatched rows there")
    if (joinType == graft.views.JoinView.FullOuter ||
        joinType == graft.views.JoinView.RightOuter)
      require(!exists(name + "__unmatched_right"),
        s"dataset ${name}__unmatched_right already exists — an outer " +
          s"join view named $name stores its unmatched right rows there")
    graft.views.JoinView.create(spark, location(name), left, right,
      keys, leftFields, rightFields, joinType)
  }

  def dataset(name: String): SpaceDataset = {
    require(exists(name), s"dataset $name not found")
    SpaceDataset.load(spark, location(name))
  }

  def materializedView(name: String): MaterializedView = {
    require(exists(name), s"dataset $name not found")
    MaterializedView.load(spark, location(name))
  }

  /** Load whichever refreshable view kind lives at `name` — row-wise
    * [[MaterializedView]] or [[graft.views.AggregateView]] — by probing
    * the persisted plan's node type. */
  def refreshableView(name: String): graft.views.Refreshable = {
    require(exists(name), s"dataset $name not found")
    val ds = SpaceDataset.load(spark, location(name))
    if (ds.storage.metadata.logicalPlan.exists(graft.views.AggPlan.isAggregate))
      new graft.views.AggregateView(spark, ds)
    else if (ds.storage.metadata.logicalPlan.exists(graft.views.JoinPlan.isJoin))
      new graft.views.JoinView(spark, ds)
    else new MaterializedView(spark, ds)
  }

  def exists(name: String): Boolean =
    Storage.exists(location(name), spark.sparkContext.hadoopConfiguration)

  def deleteDataset(name: String): Unit = {
    require(exists(name), s"dataset $name not found")
    fs.delete(new Path(rootPath, name), true)
  }

  /** Rename a dataset directory. Safe because every internal file
    * reference is table-root-RELATIVE ([[Storage.absolute]]); zero-copy
    * EXTERNAL references are absolute and stay valid. Like delete, not
    * atomic against concurrent writers on the old path. */
  def renameDataset(from: String, to: String): Unit = {
    require(exists(from), s"dataset $from not found")
    require(!exists(to), s"dataset $to already exists")
    if (!fs.rename(new Path(rootPath, from), new Path(rootPath, to)))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }

  /** Names of all datasets under the root (presence of the entrypoint
    * file is the marker, directory.py:66-77). */
  def datasets(): Seq[String] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(exists)
      .sorted
}
