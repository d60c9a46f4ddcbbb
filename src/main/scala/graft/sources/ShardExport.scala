package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard export: the LAST step before a training job reads the
  * corpus — packed sequences land in fixed-count shard files with
  * deterministic names and a manifest, committed through the
  * generation machinery so a crashed export can never publish a partial
  * shard set and a re-run resumes by simply committing the next
  * generation.
  *
  * North-star extension (no reference counterpart). Layout per committed
  * generation ([[Store.writeStoreGenerationWith]]):
  *
  * {{{
  *   <path>/gen-<seq>/shard=<s>/file_idx=<f>/data.parquet   — the shards
  *   <path>/gen-<seq>/_shards_manifest/                     — (shard,
  *                     file_idx, n_seqs, file) parquet rows
  *   <path>/gen-<seq>/_SUCCESS                              — commit marker
  * }}}
  *
  * Every file holds exactly `seqPerFile` sequences except the last file
  * of each shard stream (the remainder). The assignment is a PURE
  * function of ((shard, pack_id) order, seqPerFile) — repartition-stable
  * and replayable by a window-function oracle — and a training job can
  * address any shard file by name alone.
  *
  * Scale shape: the sequence→file assignment is one per-shard window over
  * (shard, pack_id) rows (shards are independent streams, parallelism =
  * shards, like [[graft.operators.Packing]]); the write is one shuffle to
  * co-locate each output file's rows; the manifest is a bounded roll-up
  * (one row per file). Nothing driver-side scales with the corpus.
  */
object ShardExport {

  private val ManifestDir = "_shards_manifest"
  private val DataFileName = "data.parquet"

  /** The deterministic sequence→file assignment: `file_idx` =
    * floor(rank / seqPerFile) where rank is the row's 0-based position
    * in its shard's (pack_id ASC) order. Input must hold ONE row per
    * sequence with unique (shard, pack_id) — duplicate keys would make
    * the rank (and so the whole layout) order-dependent. All input
    * columns pass through. */
  def shardAssignment(packs: DataFrame, seqPerFile: Int): DataFrame = {
    require(seqPerFile >= 1, "seqPerFile must be positive")
    val w = Window.partitionBy("shard").orderBy("pack_id")
    packs.withColumn("file_idx",
      floor(((row_number().over(w) - 1).cast("double")) / seqPerFile.toDouble)
        .cast("long"))
  }

  /** Export `packs` (one row per sequence, unique (shard, pack_id)) as
    * the next generation of the shard store at `path`; returns the
    * committed generation number. Crash-safe and concurrent-writer-safe
    * by the generation CAS ([[Store.writeStoreGenerationWith]]): a died
    * export leaves only invisible `_gen_build_*` debris, and readers of
    * the previous generation are untouched by the commit. */
  def exportTrainingShards(
      packs: DataFrame,
      path: String,
      seqPerFile: Int,
      keep: Int = 2): Long = {
    val spark = packs.sparkSession
    val assigned = shardAssignment(packs, seqPerFile)
    Store.writeStoreGenerationWith(spark, path, keep) { dir =>
      // one task per output file: every (shard, file_idx) key lands in
      // exactly one partition, so partitionBy writes exactly one part
      // file per directory — renamed below to the deterministic name
      assigned
        .repartition(col("shard"), col("file_idx"))
        .write.partitionBy("shard", "file_idx").parquet(dir)
      val fs = FileSystem.get(new URI(dir), spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(dir)).filter(_.isDirectory).foreach { sh =>
        fs.listStatus(sh.getPath).filter(_.isDirectory).foreach { fl =>
          val parts = fs.listStatus(fl.getPath)
            .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          require(parts.length == 1,
            s"expected exactly one part file in ${fl.getPath}, found ${parts.length}")
          fs.rename(parts.head.getPath, new Path(fl.getPath, DataFileName))
          // orphaned checksum siblings of the renamed part file
          fs.listStatus(fl.getPath)
            .filter(s => s.getPath.getName.startsWith(".part-"))
            .foreach(s => fs.delete(s.getPath, false))
        }
      }
      // bounded manifest: one row per file, addressed by its final name
      assigned.groupBy("shard", "file_idx")
        .agg(count(lit(1)).as("n_seqs"))
        .withColumn("file", concat(lit("shard="), col("shard"),
          lit("/file_idx="), col("file_idx"), lit("/"), lit(DataFileName)))
        .coalesce(1)
        .write.parquet(s"$dir/$ManifestDir")
    }
  }

  /** Latest committed generation's directory, or an error naming the
    * store — the resolve step every read below shares. */
  private def latestGen(spark: SparkSession, path: String): String = {
    val gens = Store.listGenerations(spark, path)
    require(gens.nonEmpty, s"no committed shard-export generation under $path")
    Store.generationPath(path, gens.last)
  }

  /** The latest generation's manifest: (shard, file_idx, n_seqs, file). */
  def shardManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${latestGen(spark, path)}/$ManifestDir")

  /** One shard file of the latest generation, by its deterministic
    * address — what a training worker reads (payload columns only; the
    * partition values live in the path). */
  def readShard(spark: SparkSession, path: String, shard: Long, fileIdx: Long): DataFrame =
    spark.read.parquet(s"${latestGen(spark, path)}/shard=$shard/file_idx=$fileIdx/$DataFileName")

  /** Every sequence of the latest generation with its (shard, file_idx)
    * re-attached from the directory layout — the round-trip read the
    * specs pin against the input. */
  def readAllShards(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(latestGen(spark, path))
}
