package graft.io

import java.io.File
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pinned VERSIONED parquet store — the transactional-table-format
  * core (Delta/Iceberg's snapshot mechanism) in its minimal honest form,
  * and the closure of the at-least-once boundary `ops/Bucketing.scala`
  * documents: raw-parquet appends cannot atomically publish a multi-file
  * change, but a SINGLE manifest rename can publish any number of data
  * files at once.
  *
  * Layout: immutable data files `v<N>-<i>-<orig>.parquet` in the store
  * root; `_manifests/manifest-<N>` text files each listing EVERY data
  * file live at version N (cumulative — a manifest is self-contained, so
  * reading version N never consults earlier manifests). Data files are
  * never rewritten or deleted by commits; a version, once published, reads
  * the same bytes forever (time travel / snapshot isolation: a reader
  * pinned to manifest N is untouched by any later commit).
  *
  * Commit protocol (crash-safe at every step):
  *   1. stage the DataFrame to a `_stage` temp dir (invisible to readers);
  *   2. move each part file into the root under a version-unique name —
  *      still invisible: no manifest references them;
  *   3. write `manifest-(N+1)` via the ledger discipline
  *      (write tmp → fsync → ATOMIC_MOVE → fsync dir): the rename IS the
  *      commit. A crash before it leaves orphan data files (garbage, never
  *      read, reclaimed by [[vacuum]]) and the store still serves N.
  *
  * Scale shape: the manifest carries file NAMES, one line per file — at
  * 100 TB that is O(#files) metadata, the same contract as a real table
  * format's manifest lists; reads plan from the explicit file list, so
  * no directory listing races with concurrent commits.
  */
object SnapshotStore {

  private def manifestDir(dir: String) = new File(dir, "_manifests")

  private def manifestFile(dir: String, v: Int) =
    new File(manifestDir(dir), f"manifest-$v%05d")

  /** Highest published version, 0 if none. */
  def currentVersion(dir: String): Int =
    Option(manifestDir(dir).listFiles()).toSeq.flatten
      .flatMap(f => f.getName.stripPrefix("manifest-").toIntOption)
      .maxOption.getOrElse(0)

  /** Data files live at version `v`, in manifest order. */
  def files(dir: String, v: Int): Seq[String] = {
    val mf = manifestFile(dir, v)
    require(mf.exists(), s"snapshot store $dir has no version $v")
    new String(Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).toSeq
  }

  /** Commit `df`'s rows as a new version (previous versions' files plus
    * the new ones) and return the published version number. An empty
    * frame commits a valid version with no new files.
    */
  def commit(df: DataFrame, dir: String): Int = {
    val root = new File(dir)
    root.mkdirs()
    val v = currentVersion(dir)
    val stage = new File(root, "_stage")
    rmTree(stage)
    df.write.mode("overwrite").parquet(stage.getAbsolutePath)
    val moved = Option(stage.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
      .zipWithIndex.map { case (f, i) =>
        val name = s"v${v + 1}-$i-${f.getName}"
        Files.move(f.toPath, new File(root, name).toPath,
          StandardCopyOption.ATOMIC_MOVE)
        name
      }
    rmTree(stage)
    val live = (if (v == 0) Seq.empty else files(dir, v)) ++ moved
    publishManifest(dir, v + 1, live)
    v + 1
  }

  /** Read the store AS OF version `v`: plan from the manifest's explicit
    * file list (empty version → empty frame with the probed schema from
    * any live store file, or an error if the store never held data).
    */
  def readVersion(spark: SparkSession, dir: String, v: Int): DataFrame = {
    val fs = files(dir, v).map(n => new File(dir, n).getAbsolutePath)
    if (fs.nonEmpty) spark.read.parquet(fs: _*)
    else {
      val any = (1 to currentVersion(dir)).flatMap(files(dir, _)).headOption
        .getOrElse(sys.error(s"snapshot store $dir has no data files at all"))
      spark.read.parquet(new File(dir, any).getAbsolutePath).limit(0)
    }
  }

  /** Delete data files no manifest references (crash-orphaned stages) and
    * optionally manifests (and their now-unreferenced files) below
    * `keepFrom`. Readers pinned at >= keepFrom are unaffected.
    */
  def vacuum(dir: String, keepFrom: Int = 1): Unit = {
    val cur = currentVersion(dir)
    val keep = (math.max(keepFrom, 1) to cur)
      .flatMap(v => files(dir, v)).toSet
    Option(new File(dir).listFiles()).toSeq.flatten.foreach { f =>
      if (f.isFile && f.getName.endsWith(".parquet") && !keep(f.getName)) {
        f.delete(); ()
      }
    }
    (1 until math.max(keepFrom, 1)).foreach { v =>
      manifestFile(dir, v).delete(); ()
    }
  }

  /** Wipe the store (fixture hygiene for re-runnable gate queries). */
  def reset(dir: String): Unit = rmTree(new File(dir))

  /** The ledger discipline (`Bucketing.commit`): tmp → fsync → ATOMIC_MOVE
    * → fsync dir. The manifest either exists complete or not at all, and
    * survives power loss once published.
    */
  private def publishManifest(dir: String, v: Int, live: Seq[String]): Unit = {
    val md = manifestDir(dir)
    md.mkdirs()
    val tmp = new File(md, f".manifest-$v%05d.tmp").toPath
    val ch = FileChannel.open(tmp, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(
        live.mkString("\n").getBytes(StandardCharsets.UTF_8)))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, manifestFile(dir, v).toPath,
      StandardCopyOption.ATOMIC_MOVE)
    val dch = FileChannel.open(md.toPath, StandardOpenOption.READ)
    try dch.force(true) finally dch.close()
  }

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
    ()
  }
}
