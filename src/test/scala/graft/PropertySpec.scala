package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.clean.Strings
import graft.merge.MergeOps
import graft.northstar.Dedup
import graft.validate.Validators

/** Property-based invariants (SURVEY.md §5 plan): cleaning idempotence,
  * duplicate-policy survivor counts, merge algebra laws.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic seeded sampling (scalatestplus is not on the offline
    * classpath — drive ScalaCheck generators directly).
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val dirtyString: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\t'),
      2 -> Gen.oneOf("!@#$%^&*()/.,-_".toSeq))).map(_.mkString)

  test("property: cleanString is idempotent and emits only [A-Za-z ]") {
    samples(Gen.listOfN(20, dirtyString), 8).filter(_.nonEmpty).foreach { strings =>
      {
        val df = strings.zipWithIndex.map(_.swap).toDF("id", "s")
        val once = df.select(col("id"), Strings.cleanString(col("s")).as("c"))
        val twice = once.select(col("id"), Strings.cleanString(col("c")).as("c"))
        val o = once.orderBy("id").collect().map(_.getString(1)).toSeq
        val t = twice.orderBy("id").collect().map(_.getString(1)).toSeq
        assert(o == t)
        assert(o.forall(_.matches("[A-Za-z ]*")))
        assert(o.forall(s => s == s.trim && !s.contains("  ")))
      }
    }
  }

  test("property: identify_duplicates keeps exactly one ingested survivor per key") {
    val genRows = Gen.listOfN(40, for {
      id <- Gen.choose(1, 8)
      ts <- Gen.choose(1000, 9999)
    } yield (id, f"2024-01-01 00:$ts%04d".take(19), "ingested"))
    samples(genRows, 8)
      .map(_.distinctBy(r => (r._1, r._2)))
      .filter(_.nonEmpty).foreach { rows =>
      {
        val df = Validators.initDiagnostics(
          rows.toDF("id", "ingestion_timestamp", "silver_ingestion_status"))
        val out = Validators.identifyDuplicates(df, Seq("id"), "ingestion_timestamp")
        val survivors = out.filter(col("validation_status") =!= "invalid")
          .groupBy("id").count().collect()
        // every key retains exactly one valid row, regardless of copies
        assert(survivors.forall(_.getLong(1) == 1))
        assert(survivors.length == rows.map(_._1).distinct.size)
      }
    }
  }

  test("property: insertIfAbsent is idempotent and monotone") {
    val genTable = Gen.listOfN(15, for {
      k <- Gen.choose(1, 10); v <- Gen.alphaStr.map(_.take(4))
    } yield (k, v))
    samples(genTable.flatMap(a => genTable.map(b => (a, b))), 8)
      .filter(p => p._1.nonEmpty && p._2.nonEmpty).foreach { case (a, b) =>
      {
        val ta = a.distinct.toDF("k", "v").dropDuplicates("k")
        val tb = b.distinct.toDF("k", "v").dropDuplicates("k")
        val merged = MergeOps.insertIfAbsent(ta, tb, Seq("k"))
        // idempotent
        assert(TestSpark.rows(MergeOps.insertIfAbsent(merged, tb, Seq("k"))) ==
          TestSpark.rows(merged))
        // key set is the union; target rows win
        val keys = merged.select("k").collect().map(_.getInt(0)).toSet
        assert(keys == (ta.collect().map(_.getInt(0)).toSet ++
          tb.collect().map(_.getInt(0)).toSet))
      }
    }
  }

  test("property: minhash jaccard estimate tracks true jaccard") {
    // construct doc pairs with known overlap from a fixed vocabulary
    val vocab = (0 until 30).map(i => s"w$i")
    samples(Gen.choose(0, 30), 8).foreach { overlap =>
      val a = vocab.take(overlap) ++ (0 until (30 - overlap)).map(i => s"a$i")
      val b = vocab.take(overlap) ++ (0 until (30 - overlap)).map(i => s"b$i")
      val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text")
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", numPerm = 64,
        shingleSize = 1)
      val Seq(s1, s2) = sig.orderBy("doc_id").collect()
        .map(_.getSeq[Long](1)).toSeq
      val est = s1.zip(s2).count { case (x, y) => x == y } / 64.0
      val truth = if (overlap == 0) 0.0 else overlap.toDouble / (60 - overlap)
      assert(math.abs(est - truth) < 0.25, s"overlap=$overlap est=$est truth=$truth")
    }
  }

  test("property: DLQ loop converges — re-running the medallion over " +
    "adversarial sources is a fixpoint and silver stays consistent") {
    import graft.pipeline.{EntityPipeline, SeedStore, Warehouse}
    val clock = () => to_timestamp(lit("2024-01-01 00:00:00"))
    // adversarial generators: duplicate business keys, dirty-but-repairable
    // and unrepairable enum values, garbage timestamps, dangling FKs
    val genCustomer = for {
      id <- Gen.choose(1, 6)                      // small space → dup keys
      tpe <- Gen.oneOf("affiliate", "individual", " Affiliate! ", "unknown")
      status <- Gen.oneOf("regular", "VIP", " vip ", "gold")
      ts <- Gen.oneOf("2023-02-0", "not-a-date#")
      d <- Gen.choose(1, 9)
    } yield (id, tpe, status, if (ts.startsWith("2023")) s"$ts$d 10:00:00" else ts)
    val genOrder = for {
      custId <- Gen.choose(1, 9)                  // 7–9 dangle (dirty FK)
      addrId <- Gen.choose(10, 13)                // 12–13 dangle
      ts <- Gen.oneOf("2023-03-01 10:00:00", "bad-ts")
    } yield (custId, ts, addrId, "2023-03-05", "2023-03-06")
    samples(Gen.zip(Gen.listOfN(12, genCustomer), Gen.listOfN(8, genOrder)), 3)
      .foreach { case (custRows, orderRows) =>
        val sources = Map(
          "customers" -> custRows.toDF("id", "type", "status", "CreatedOn"),
          "addresses" -> Seq(
            ("2023-01-01 10:00:00", "Phoenix", "Az", "Us", 10, "1 Main St"),
            ("2023-01-02 10:00:00", "Tucson", "Az", "Us", 11, "2 Oak Ave"))
            .toDF("createdOn", "city", "state", "country", "id", "addressline"),
          "orders" -> orderRows.zipWithIndex.map { case (o, i) =>
            (o._1, o._2, o._3, o._4, o._5, 100 + i)
          }.toDF("customerId", "createdOn", "addressId",
            "deliveryDate", "deliveredOn", "id"))
        val w = new Warehouse(
          java.nio.file.Files.createTempDirectory("graft_fix").toString)
        def runOnce(): Unit =
          Seq(SeedStore.customers, SeedStore.addresses, SeedStore.orders)
            .foreach { cfg =>
              val p = new EntityPipeline(spark, w, cfg, clock)
              p.ingestBronze(sources(cfg.name))
              p.validateSilver() // throws if count reconciliation breaks
              p.cleanseDlq()
            }
        def state(): Map[String, Long] =
          Seq("bronze_customers", "silver_customers", "dlq_customers",
            "bronze_orders", "silver_orders", "dlq_orders")
            .map(t => t -> w.table(t).read(spark).count()).toMap ++
            Seq("dlq_customers", "dlq_orders").map(t => s"${t}_invalid" ->
              w.table(t).read(spark)
                .filter(col("validation_status") === "invalid").count())
        runOnce()
        val s1 = state()
        runOnce() // validate→cleanse→validate again over identical sources
        val s2 = state()
        assert(s1 == s2, s"DLQ loop must be a fixpoint; drift: $s1 vs $s2")
        // silver consistency after convergence: unique business keys and
        // no dangling customer FK among landed orders
        val silverCust = w.silverByName("customers").read(spark)
        assert(silverCust.groupBy("id").count()
          .filter(col("count") > 1).isEmpty, "silver customer ids must be unique")
        val landedCust = silverCust.select("id").collect().map(_.getLong(0)).toSet
        val orderFks = w.silverByName("orders").read(spark)
          .select("customer_id").collect().map(_.getLong(0)).toSet
        assert(orderFks.subsetOf(landedCust),
          s"silver orders reference missing customers: ${orderFks -- landedCust}")
      }
  }

  test("property: connectedComponents matches driver-side union-find on random graphs") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    // few samples on purpose: every CC round is real Spark jobs
    // (join + count per iteration), so this test is wall-clock-expensive;
    // 3 random 15-edge graphs over 14 nodes still hit merge/chain/isolate
    // shapes (the deterministic NorthStarSpec case covers the rest)
    val genEdges = Gen.listOfN(15, for {
      a <- Gen.choose(1L, 14L); b <- Gen.choose(1L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    samples(genEdges, 3).filter(_.nonEmpty).foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(edges),
        s"edges=$edges\n got=$got\n want=${unionFind(edges)}")
      // the star variant must agree with the same oracle on the same graph
      val star = Dedup.connectedComponentsStar(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == unionFind(edges),
        s"star: edges=$edges\n got=$star\n want=${unionFind(edges)}")
    }
    // adversarial long chain: diameter 127 defeats label propagation's
    // 20-round budget but star-contraction needs only ~log2(128) rounds
    val chain = (1L until 128L).map(i => (i, i + 1))
    val starChain = Dedup.connectedComponentsStar(
      chain.toDF("id_a", "id_b"), maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 128L).forall(starChain(_) == 1L))
  }

  test("property: scdType2 keeps exactly one current version per key, " +
    "closed intervals chain, and row count grows only by real changes") {
    // random snapshot sequences over a small key space force every branch:
    // new key, changed attr, unchanged attr, absent key, flip-back
    val genSnapshot = Gen.listOfN(6, for {
      id <- Gen.choose(1L, 4L)
      tier <- Gen.oneOf("a", "b", "c")
    } yield (id, tier)).map(_.distinctBy(_._1))
    samples(Gen.listOfN(4, genSnapshot), 6).filter(_.forall(_.nonEmpty))
      .foreach { snapshots =>
        val dates = (1 to snapshots.size).map(i => s"2020-0$i-01")
        var dim = MergeOps.scdType2Init(
          snapshots.head.toDF("id", "tier"), Seq("id"), Seq("tier"),
          lit(dates.head).cast("date"))
        snapshots.tail.zip(dates.tail).foreach { case (snap, d) =>
          dim = MergeOps.scdType2(dim, snap.toDF("id", "tier"),
            Seq("id"), Seq("tier"), lit(d).cast("date"))
        }
        val rows = dim.collect().map(r => (r.getLong(0), r.getString(1),
          r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
          r.getBoolean(4)))
        // exactly one open (current) version per key, and it is the only
        // row with valid_to = NULL
        rows.groupBy(_._1).foreach { case (id, vs) =>
          assert(vs.count(_._5) == 1, s"key $id: ${vs.count(_._5)} current rows")
          assert(vs.forall(v => v._5 == v._4.isEmpty))
          // closed versions chain: sort by valid_from; each valid_to equals
          // the successor's valid_from
          val sorted = vs.sortBy(_._3)
          sorted.sliding(2).foreach {
            case Array(prev, next) =>
              assert(prev._4.contains(next._3),
                s"key $id: ${prev._4} does not chain to ${next._3}")
            case _ =>
          }
          // adjacent versions always differ in the attribute (no no-op versions)
          sorted.sliding(2).foreach {
            case Array(prev, next) => assert(prev._2 != next._2)
            case _ =>
          }
        }
      }
  }

  test("property: funnel matches a driver-side sequential reference") {
    import graft.northstar.EventOps
    val stages = Seq("view", "click", "purchase")
    val eventGen = for {
      u <- Gen.choose(1L, 8L)
      t <- Gen.oneOf("view", "click", "purchase", "error", "signup")
      ts <- Gen.choose(1L, 50L).map(_ * 1000L) // ns, µs multiples
    } yield (u, t, ts)
    samples(Gen.listOfN(60, eventGen), 6).foreach { evs =>
      val got = EventOps.funnel(evs.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", stages)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // reference: per user, walk the stages picking each stage's first
      // occurrence strictly after the previous stage's picked time
      val perStage = stages.indices.map { i =>
        evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
          var tPrev = Option.empty[Long]
          var lag = 0L
          var ok = true
          for (j <- 0 to i if ok) {
            val cand = es.collect {
              case (_, t, ts) if t == stages(j) && tPrev.forall(ts > _) => ts
            }
            if (cand.isEmpty) ok = false
            else {
              val t = cand.min
              lag = tPrev.map(p => (t - p) / 1000L).getOrElse(0L)
              tPrev = Some(t)
            }
          }
          if (ok) Some((u, lag)) else None
        }
      }
      val expected = stages.indices.map { i =>
        (s"${i + 1}_${stages(i)}", perStage(i).size.toLong,
          if (i == 0) 0L else perStage(i).map(_._2).sum)
      }.toSet
      assert(got == expected, s"events=$evs")
    }
  }

  test("property: funnel state compaction is lossless under later arrivals " +
    "(the streaming mirror's monotonicity lemma)") {
    import graft.northstar.EventOps
    val stages = Seq("view", "click", "purchase")
    val eventGen = for {
      u <- Gen.choose(1L, 5L)
      t <- Gen.oneOf("view", "click", "purchase")
      ts <- Gen.choose(1L, 40L).map(_ * 1000L)
    } yield (u, t, ts)
    def times(evs: Seq[(Long, String, Long)]): Map[Long, Seq[Option[Long]]] =
      EventOps.stageTimes(evs.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", stages)
        .collect().map(r => r.getLong(0) ->
          stages.indices.map(i =>
            if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1)))).toMap
    samples(Gen.zip(Gen.listOfN(40, eventGen), Gen.listOfN(20, eventGen)), 5)
      .foreach { case (batch1, batch2) =>
        val t1 = times(batch1)
        // (a) monotonicity: adding events never INCREASES any stage time
        //     (None = +infinity) — the lemma the compaction rule rests on
        val tAll = times(batch1 ++ batch2)
        for ((u, ts1) <- t1; ts2 = tAll(u); i <- stages.indices)
          assert(ts2(i).getOrElse(Long.MaxValue) <=
            ts1(i).getOrElse(Long.MaxValue),
            s"stage ${stages(i)} time grew for user $u: $ts1 -> $ts2")
        // (b) exactness: the stream's keep-rule (drop stage-i times above
        //     the current t_i) loses nothing — recomputing from compacted
        //     state + the late batch equals recomputing from everything
        val compacted = batch1.distinct.filter { case (u, t, ts) =>
          val i = stages.indexOf(t)
          t1.get(u).forall(v => v(i).forall(ts <= _))
        }
        assert(times(compacted ++ batch2) == tAll,
          s"compaction dropped a load-bearing event: b1=$batch1 b2=$batch2")
      }
  }

  test("property: media builders round-trip through the header parser for " +
    "arbitrary dimensions/formats") {
    import graft.northstar.Multimodal.{AudioFormat, MediaBuilders, MediaDecoder}
    val pngGen = for {
      w <- Gen.choose(1, 1 << 20); h <- Gen.choose(1, 1 << 20)
      f <- Gen.choose(0, 200); s <- Gen.choose(0L, Long.MaxValue)
    } yield (w, h, f, s)
    samples(pngGen, 40).foreach { case (w, h, f, s) =>
      val png = MediaBuilders.png(w, h, f, s)
      assert(png.length == 57 + f)
      assert(MediaDecoder.ContainerHeaders.dimensions(png).contains((w, h)))
      assert(MediaDecoder.ContainerHeaders.audioFormat(png).isEmpty)
    }
    val jpgGen = for {
      w <- Gen.choose(1, 0xffff); h <- Gen.choose(1, 0xffff)
      f <- Gen.choose(0, 200); s <- Gen.choose(0L, Long.MaxValue)
    } yield (w, h, f, s)
    samples(jpgGen, 40).foreach { case (w, h, f, s) =>
      val jpg = MediaBuilders.jpeg(w, h, f, s)
      assert(jpg.length == 21 + f)
      assert(MediaDecoder.ContainerHeaders.dimensions(jpg).contains((w, h)))
    }
    val wavGen = for {
      sr <- Gen.oneOf(8000, 16000, 22050, 44100, 48000)
      ch <- Gen.choose(1, 8); f <- Gen.choose(0, 100).map(_ * 2)
      s <- Gen.choose(0L, Long.MaxValue)
    } yield (sr, ch, f, s)
    samples(wavGen, 40).foreach { case (sr, ch, f, s) =>
      val wav = MediaBuilders.wav(sr, ch, 16, f, s)
      assert(wav.length == 44 + f)
      assert(MediaDecoder.ContainerHeaders.audioFormat(wav)
        .contains(AudioFormat(sr, ch, 16)))
      assert(MediaDecoder.ContainerHeaders.dimensions(wav).isEmpty)
    }
  }

  test("property: retention matrix matches a driver-side reference") {
    import graft.northstar.EventOps
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    val eventGen = for {
      u <- Gen.choose(1L, 6L)
      day <- Gen.choose(19700, 19760) // epoch days spanning ~9 weeks
    } yield (u, day.toLong * 86400L * 1000000000L)
    def monday(ns: Long): LocalDate =
      LocalDate.ofEpochDay(ns / 86400000000000L)
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    samples(Gen.listOfN(30, eventGen), 6).foreach { evs =>
      val got = EventOps.retentionCohorts(evs.toDF("user_id", "ts"),
          "user_id", "ts")
        .collect()
        .map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getLong(2)))
        .toSet
      val cohort = evs.groupBy(_._1).map { case (u, es) =>
        u -> monday(es.map(_._2).min).toString
      }
      val expected = evs.map { case (u, ns) => (cohort(u), monday(ns).toString, u) }
        .distinct.groupBy(p => (p._1, p._2))
        .map { case ((c, w), us) => (c, w, us.map(_._3).distinct.size.toLong) }
        .toSet
      assert(got == expected, s"events=$evs")
    }
  }

  test("property: JPEG gray and color builders round-trip the full decode " +
      "to their closed forms on random DC programs") {
    import graft.northstar.Multimodal.{MediaBuilders, MediaDecoder}
    val dec = MediaDecoder.ContainerHeaders
    val dims: Gen[(Int, Int)] =
      for (bw <- Gen.choose(1, 5); bh <- Gen.choose(1, 4))
        yield (bw * 8, bh * 8)
    val gen = for {
      (w, h) <- dims
      nb = (w / 8) * (h / 8)
      dcs <- Gen.listOfN(nb, Gen.choose(-140, 140))
      cbs <- Gen.listOfN(nb, Gen.choose(-100, 100))
      crs <- Gen.listOfN(nb, Gen.choose(-100, 100))
      rst <- Gen.oneOf(0, 0, 1, 2, 3) // mostly no restarts, sometimes DRI
    } yield (w, h, dcs.toArray, cbs.toArray, crs.toArray, rst)
    samples(gen, 40).foreach { case (w, h, dcs, cbs, crs, rst) =>
      // grayscale: every decoded pixel is exactly clamp(dc + 128)
      val gray = dec.jpegPixels(MediaBuilders.jpegBaseline(w, h, dcs,
        restartEvery = rst)).getOrElse(fail(s"gray ${w}x$h rst=$rst refused"))
      assert(gray._1 == w && gray._2 == h)
      for (k <- dcs.indices) {
        val (bx, by) = (k % (w / 8), k / (w / 8))
        val got = gray._3((by * 8 + 3) * w + bx * 8 + 5) & 0xff
        val want = math.max(0, math.min(255, dcs(k) + 128))
        assert(got == want, s"gray block $k: $got != $want (rst=$rst)")
      }
      // color: every RGB pixel is the exact integer fixed-point form
      val col3 = dec.jpegRgbPixels(
        MediaBuilders.jpegBaselineColor(w, h, dcs, cbs, crs))
        .getOrElse(fail(s"color ${w}x$h refused"))
      def cl(v: Int) = math.max(0, math.min(255, v))
      for (k <- dcs.indices) {
        val (bx, by) = (k % (w / 8), k / (w / 8))
        val j = 3 * ((by * 8 + 2) * w + bx * 8 + 6)
        val y = cl(dcs(k) + 128)
        val (cb, cr) = (cl(cbs(k) + 128) - 128, cl(crs(k) + 128) - 128)
        assert((col3._3(j) & 0xff) == cl(y + ((91881 * cr + 32768) >> 16)))
        assert((col3._3(j + 1) & 0xff) ==
          cl(y - ((22554 * cb + 46802 * cr + 32768) >> 16)))
        assert((col3._3(j + 2) & 0xff) ==
          cl(y + ((116130 * cb + 32768) >> 16)))
      }
    }
  }

  test("property: sequence packing laws hold on random token programs") {
    import graft.northstar.SeqPack
    val gen = for {
      n <- Gen.choose(20, 120)
      budget <- Gen.choose(8, 80)
      bucket <- Gen.oneOf(16, 64, 1000)
      toks <- Gen.listOfN(n, Gen.choose(0, 100))
    } yield (budget, bucket, toks)
    samples(gen, 6).foreach { case (budget, bucket, toks) =>
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n").select(col("doc_id"),
          when(col("n") > 0, concat_ws(" ",
            transform(sequence(lit(1), col("n")), _ => lit("w"))))
            .otherwise(lit("")).as("text"))
      val packed = SeqPack.packGreedy(docs, "doc_id", "text", budget, bucket)
        .collect().sortBy(_.doc_id)
      // driver replay of the greedy recurrence, bucket by bucket
      val expected = toks.zipWithIndex
        .groupBy { case (_, i) => i / bucket }.toSeq
        .flatMap { case (b, ds) =>
          var seq = 0L; var fill = 0; var started = false
          ds.sortBy(_._2).map { case (t, i) =>
            if (!started) { started = true; fill = t }
            else if (fill.toLong + t > budget) { seq += 1; fill = t }
            else fill += t
            (i.toLong, b.toLong, seq)
          }
        }.toSet
      assert(packed.map(p => (p.doc_id, p.bucket, p.seq)).toSet == expected,
        s"budget=$budget bucket=$bucket")
    }
  }

  test("property: the planner-automatic stats-skipping read equals the " +
      "skipping-disabled read under randomized filter shapes") {
    import graft.io.ParquetTable
    // a table exercising every stat kind: long key, double, string tag,
    // a nullable column, and enough rows that compaction yields multiple
    // files with meaningful per-file ranges
    val rows = (0L until 400L).map { i =>
      (i, i.toDouble / 3.0, f"t${i % 40}%03d",
        if (i % 7 == 0) None else Some(i * 2))
    }
    val df = rows.toDF("id", "score", "tag", "maybe")
    val p = java.nio.file.Files.createTempDirectory("graft_prop").toString
    val tbl = new ParquetTable(p + "/t")
    tbl.overwrite(df)
    tbl.compact(spark, targetPartitions = 8, sortCols = Seq("id"))

    val genFilter: Gen[org.apache.spark.sql.Column] = {
      val id = col("id"); val sc = col("score"); val tg = col("tag")
      val range = for {
        lo <- Gen.choose(-50L, 450L); w <- Gen.choose(0L, 200L)
      } yield id >= lo && id <= lo + w
      val point = Gen.choose(-10L, 410L).map(id === _)
      val inList = Gen.listOfN(3, Gen.choose(-10L, 410L)).map(vs =>
        id.isin(vs.map(Long.box): _*))
      val dbl = Gen.choose(-5.0, 140.0).map(sc <= _)
      val str = Gen.choose(0, 45).map(n => tg >= f"t$n%03d")
      val prefix = Gen.choose(0, 4).map(d => tg.startsWith(s"t$d"))
      val nul = Gen.const(col("maybe").isNull)
      val leaf = Gen.oneOf(range, point, inList, dbl, str, prefix, nul)
      // conjunctions, disjunctions and mixes — the pruner must be a
      // strict optimization under ALL of them (ORs translate to
      // nothing today; the law pins that they stay harmless)
      Gen.oneOf(leaf,
        Gen.zip(leaf, leaf).map { case (a, b) => a && b },
        Gen.zip(leaf, leaf).map { case (a, b) => a || b },
        Gen.zip(leaf, leaf, leaf).map { case (a, b, c) => (a || b) && c })
    }
    samples(genFilter, 40).foreach { f =>
      val auto = tbl.read(spark).filter(f).collect().map(_.toSeq).toSet
      sys.props("graft.read.skipping") = "off"
      val plain =
        try tbl.read(spark).filter(f).collect().map(_.toSeq).toSet
        finally sys.props.remove("graft.read.skipping")
      assert(auto == plain, s"filter $f: skipping changed results " +
        s"(${auto.size} vs ${plain.size} rows)")
    }

    // the SQL path takes the same law: a catalog-registered graft table
    // (GraftSqlSkipping wraps its FileIndex at optimization time) must
    // be filter-for-filter identical to the skipping-disabled read
    graft.io.Catalog.ensureDatabase(spark, "graft_prop_db")
    graft.io.Catalog.registerTable(spark, "graft_prop_db", "t", tbl)
    samples(genFilter, 20).foreach { f =>
      val auto = spark.table("graft_prop_db.t").filter(f)
        .collect().map(_.toSeq).toSet
      sys.props("graft.read.skipping") = "off"
      val plain =
        try spark.table("graft_prop_db.t").filter(f)
          .collect().map(_.toSeq).toSet
        finally sys.props.remove("graft.read.skipping")
      assert(auto == plain, s"filter $f: SQL-path skipping changed " +
        s"results (${auto.size} vs ${plain.size} rows)")
    }
    spark.sql("DROP TABLE graft_prop_db.t")
  }
}
