package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.northstar.{AnnDeletes, IvfIndex, IvfPqIndex, Similarity}

/** Laws of ANN deletion (round-8 verdict item 4 — the FAISS `remove_ids`
  * analog): logical tombstones, physical compaction, cold-reload parity,
  * delete-then-append, the emptied-list fallback and the crash-window
  * ordering. Exhaustive probing (nprobe = nlist) makes IVF search exact,
  * so every equality below is exact set equality, not a recall bound.
  */
class AnnDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 24 deterministic 4-d vectors: three loose directional clusters so
  // nlist=3 builds non-trivial lists
  private val bases: Array[Array[Double]] = Array(
    Array(1.0, 0.1, 0.0, 0.0), Array(0.0, 1.0, 0.1, 0.0),
    Array(0.0, 0.0, 1.0, 0.1))

  private def corpus: DataFrame = (0L until 24L).map { i =>
    val base = bases((i % 3).toInt)
    (i, base.zipWithIndex.map { case (v, d) =>
      v + 0.03 * ((i * 7 + d * 3) % 5) }.toSeq)
  }.toDF("vec_id", "embedding")

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshPath(tag: String): String =
    Files.createTempDirectory(s"graft_anndel_$tag").toString + "/idx"

  test("IVF remove masks deleted ids; tombstoned, compacted and " +
      "cold-reloaded searches are all exactly the survivors' top-k") {
    val path = freshPath("ivf")
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    val dropIds = Seq(2L, 5L, 11L, 17L)
    val drop = dropIds.toDF("vec_id")
    val queries = corpus.filter(col("vec_id") < 4)
    val removed = idx.remove(spark, path, drop, "vec_id")
    // exhaustive probe ⇒ exact: must equal brute force on the survivors
    val want = pairs(Similarity.bruteForceTopK(
      corpus.join(drop, Seq("vec_id"), "left_anti"), queries,
      "vec_id", "embedding", k = 3))
    val masked = pairs(
      removed.search(queries, "vec_id", "embedding", k = 3, nprobe = 3))
    assert(masked == want, "tombstoned search must equal survivors' top-k")
    assert(!masked.exists(p => dropIds.contains(p._2)),
      "no deleted id may surface")
    // tombstones survive a cold reload (they are index state, not session)
    val reloaded = pairs(IvfIndex.load(spark, path).get
      .search(queries, "vec_id", "embedding", k = 3, nprobe = 3))
    assert(reloaded == want, "cold reload must keep the mask")
    // physical fold: same answers, tombstone table emptied
    val compacted = removed.compact(spark, path)
    assert(pairs(compacted.search(queries, "vec_id", "embedding",
      k = 3, nprobe = 3)) == want, "compaction must not change answers")
    assert(AnnDeletes.read(spark, path).get.isEmpty,
      "compact must clear the tombstone table")
    // the deleted rows are physically gone from the lists
    val ids = IvfIndex.load(spark, path).get.assigned
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(dropIds.forall(!ids.contains(_)),
      "compacted lists must not hold deleted rows")
  }

  test("IVF compact rewrites only the touched lists (untouched cells' " +
      "files ride as links into the new version)") {
    val path = freshPath("ivftouch")
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    // drop ONE id — exactly one cell is touched
    val victim = 7L
    val cellOf = idx.assigned.filter(col("neighbor_id") === victim)
      .select("cell").head().getInt(0)
    val table = new graft.io.ParquetTable(path,
      partitionColumns = Seq("cell"))
    val beforeFiles = filesByCell(table.currentPath)
    idx.remove(spark, path, Seq(victim).toDF("vec_id"), "vec_id")
      .compact(spark, path, retainHistory = true)
    val afterFiles = filesByCell(table.currentPath)
    val untouched = beforeFiles.keySet - cellOf
    untouched.foreach { c =>
      assert(beforeFiles(c) == afterFiles(c),
        s"untouched cell $c must carry the same file names (hard links)")
    }
    assert(beforeFiles(cellOf) != afterFiles(cellOf),
      "the touched cell must have been rewritten")
  }

  private def filesByCell(versionDir: String): Map[Int, Set[String]] = {
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(versionDir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("cell="))
      .map { p =>
        val cell = p.getFileName.toString.stripPrefix("cell=").toInt
        cell -> Files.list(p).iterator().asScala
          .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
      }.toMap
  }

  test("delete-then-append: a re-added id serves its NEW vector — no " +
      "mask left behind, no stale row resurrected, no duplicate") {
    val path = freshPath("ivfreadd")
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    val victim = 9L
    val removed = idx.remove(spark, path, Seq(victim).toDF("vec_id"),
      "vec_id")
    // re-add the id with a DIFFERENT vector (an update via remove+add)
    val newVec = Seq(0.9, 0.9, 0.0, 0.0)
    val appended = removed.append(spark, path,
      Seq((victim, newVec)).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val rows = appended.assigned.filter(col("neighbor_id") === victim)
      .select("__cv").collect()
    assert(rows.length == 1, "exactly one physical row for the re-added id")
    assert(rows.head.getSeq[Double](0) == newVec,
      "the surviving row must carry the NEW payload")
    assert(AnnDeletes.read(spark, path).forall(_.isEmpty),
      "the re-added id must no longer be tombstoned")
    // and searches surface it again (exhaustive probe, query = its own
    // new direction → it must be rank-1 for a matching query vector)
    val q = Seq((100L, newVec)).toDF("vec_id", "embedding")
    val top = appended.search(q, "vec_id", "embedding", k = 1, nprobe = 3)
      .select("neighbor_id").head().getLong(0)
    assert(top == victim, "re-added vector must be findable")
  }

  test("emptied-list fallback: deleting a whole cell's vectors compacts " +
      "through the full rewrite, keeps the sidecar, and still reloads") {
    val path = freshPath("ivfempty")
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    val someCell = idx.assigned.select("cell").head().getInt(0)
    val cellIds = idx.assigned.filter(col("cell") === someCell)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(cellIds.nonEmpty)
    val compacted = idx
      .remove(spark, path, cellIds.toDF("vec_id"), "vec_id")
      .compact(spark, path)
    assert(compacted.assigned.filter(col("cell") === someCell).isEmpty,
      "the emptied list must be gone")
    val reloaded = IvfIndex.load(spark, path)
    assert(reloaded.nonEmpty,
      "full-rewrite fallback must preserve the centroid sidecar")
    val queries = corpus.filter(col("vec_id") < 2)
    val want = pairs(Similarity.bruteForceTopK(
      corpus.join(cellIds.toDF("vec_id"), Seq("vec_id"), "left_anti"),
      queries, "vec_id", "embedding", k = 3))
    assert(pairs(reloaded.get.search(queries, "vec_id", "embedding",
      k = 3, nprobe = 3)) == want)
  }

  test("crash window between list rewrite and tombstone clear is " +
      "harmless: stale tombstones over already-compacted rows change " +
      "nothing and the next compact clears them") {
    val path = freshPath("ivfcrash")
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    val drop = Seq(4L, 13L).toDF("vec_id")
    idx.remove(spark, path, drop, "vec_id").compact(spark, path)
    // simulate the crash residue: tombstones re-appear for rows that the
    // (committed) compaction already removed from the lists
    AnnDeletes.add(spark, path, drop.select(col("vec_id")))
    val queries = corpus.filter(col("vec_id") < 2)
    val want = pairs(Similarity.bruteForceTopK(
      corpus.join(drop, Seq("vec_id"), "left_anti"), queries,
      "vec_id", "embedding", k = 3))
    val masked = IvfIndex.load(spark, path).get
    assert(pairs(masked.search(queries, "vec_id", "embedding",
      k = 3, nprobe = 3)) == want, "stale tombstones must be inert")
    masked.compact(spark, path)
    assert(AnnDeletes.read(spark, path).get.isEmpty,
      "the next compact must clear the residue")
  }

  test("persist() supersedes prior deletes: a fresh rebuild over a " +
      "previously-tombstoned path serves re-ingested ids identically " +
      "warm and cold (stale tombstones cleared, not inherited)") {
    val path = freshPath("ivfrebuild")
    val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    val victim = 6L
    idx.remove(spark, path, Seq(victim).toDF("vec_id"), "vec_id")
    // a NEW generation of the index, built from the full corpus (the
    // id re-ingested), persisted over the same path — the delete above
    // belongs to the dead generation
    val rebuilt = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
      .persist(spark, path)
    assert(AnnDeletes.read(spark, path).forall(_.isEmpty),
      "persist must clear tombstones of the superseded generation")
    val q = corpus.filter(col("vec_id") === victim)
      .withColumn("vec_id", lit(100L))
    def top(i: IvfIndex) = i.search(q, "vec_id", "embedding",
      k = 1, nprobe = 3).select("neighbor_id").head().getLong(0)
    assert(top(rebuilt) == victim, "warm view must serve the re-ingested id")
    assert(top(IvfIndex.load(spark, path).get) == victim,
      "cold view must agree — the round-9 gap: load() masked it")
    // same law on the PQ layout
    val pqPath = freshPath("pqrebuild")
    val pq = IvfPqIndex.build(spark, corpus, "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 4).persist(spark, pqPath)
    pq.remove(spark, pqPath, Seq(victim).toDF("vec_id"), "vec_id")
    IvfPqIndex.build(spark, corpus, "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 4).persist(spark, pqPath)
    assert(AnnDeletes.read(spark, pqPath).forall(_.isEmpty),
      "IvfPq persist must clear stale tombstones too")
  }

  test("remove auto-compacts once the tombstone count reaches the " +
      "configured bound — the broadcast-size policy is enforced in " +
      "code, not left to operator discipline") {
    val prior = spark.conf.getOption(AnnDeletes.ThresholdConf)
    spark.conf.set(AnnDeletes.ThresholdConf, "3")
    try {
      val path = freshPath("ivfauto")
      val idx = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 3)
        .persist(spark, path)
      // below the bound: remove stays a pure tombstone append
      val r1 = idx.remove(spark, path, Seq(2L, 5L).toDF("vec_id"), "vec_id")
      assert(AnnDeletes.read(spark, path).get.count() == 2,
        "under the bound, tombstones accumulate (no rewrite)")
      val preCompactV = new graft.io.ParquetTable(path,
        partitionColumns = Seq("cell")).version
      // this remove crosses the bound (2 + 2 >= 3) → compaction fires
      val r2 = r1.remove(spark, path, Seq(11L, 17L).toDF("vec_id"), "vec_id")
      assert(AnnDeletes.read(spark, path).get.isEmpty,
        "at the bound, remove must fold tombstones into the lists")
      // the triggered compact is a data-dependent side effect of a
      // LOGICAL delete — it must not vacuum time-travel history (vacuum
      // stays an explicit-compact decision); the pre-compact version
      // must still be readable, deleted rows included
      val preCompact = new graft.io.ParquetTable(path,
          partitionColumns = Seq("cell"))
        .readVersion(spark, preCompactV)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(Seq(11L, 17L).forall(preCompact.contains),
        "remove-triggered compaction must retain prior versions " +
          "(history-safe by default)")
      val left = new graft.io.ParquetTable(path,
        partitionColumns = Seq("cell")).read(spark)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(Seq(2L, 5L, 11L, 17L).forall(!left.contains(_)),
        "auto-compacted lists must not hold any deleted row")
      // and answers equal brute force on the survivors
      val queries = corpus.filter(col("vec_id") < 2)
      val want = pairs(Similarity.bruteForceTopK(
        corpus.filter(!col("vec_id").isin(2L, 5L, 11L, 17L)), queries,
        "vec_id", "embedding", k = 3))
      assert(pairs(r2.search(queries, "vec_id", "embedding",
        k = 3, nprobe = 3)) == want)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(AnnDeletes.ThresholdConf, v)
        case None => spark.conf.unset(AnnDeletes.ThresholdConf)
      }
    }
  }

  test("IVFPQ remove masks deleted ids; compacted and reloaded searches " +
      "equal the tombstoned one exactly (same codes, same centroids)") {
    val path = freshPath("pq")
    val idx = IvfPqIndex.build(spark, corpus, "vec_id", "embedding",
      nlist = 3, m = 2, ksub = 4).persist(spark, path)
    val dropIds = Seq(3L, 10L, 20L)
    val drop = dropIds.toDF("vec_id")
    val queries = corpus.filter(col("vec_id") < 4)
    def run(i: IvfPqIndex) = pairs(
      i.search(queries, "vec_id", "embedding", k = 3, nprobe = 3))
    val removed = idx.remove(spark, path, drop, "vec_id")
    val masked = run(removed)
    assert(!masked.exists(p => dropIds.contains(p._2)),
      "no deleted id may surface from the coded lists")
    assert(run(IvfPqIndex.load(spark, path).get) == masked,
      "cold reload must keep the mask")
    val compacted = removed.compact(spark, path)
    assert(run(compacted) == masked,
      "compaction must not change PQ answers")
    assert(AnnDeletes.read(spark, path).get.isEmpty)
    assert(run(IvfPqIndex.load(spark, path).get) == masked,
      "post-compact reload parity")
  }
}
