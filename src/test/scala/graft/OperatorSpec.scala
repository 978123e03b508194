package graft

import graft.operators.{AsOfJoin, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class OperatorSpec extends SparkSpec {

  test("as-of join picks the most recent right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("lid"))
    val right = Seq((1L, 90L, 20L), (1L, 100L, 21L), (1L, 200L, 22L), (3L, 10L, 23L))
      .toDF("k", "t", "rid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("rid"))
    val got = AsOfJoin.asOf(left, right, "k", "t", "lid", "rid")
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // lid 10 (t=100): right 21 at t=100 (equal time visible, max id among ties/earlier)
    // lid 11 (t=250): right 22 at t=200
    // lid 12 (k=2): no right rows → null
    assert(got === Map(10L -> 21L, 11L -> 22L, 12L -> -1L))
  }

  test("as-of join keeps non-numeric id types (no ANSI cast crash)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "L1"), (1L, 250L, "L2"))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("lid"))
    val right = Seq((1L, 90L, "RA"), (1L, 200L, "RB"))
      .toDF("k", "t", "rid")
      .select(col("k"), timestamp_millis(col("t")).as("t"), col("rid"))
    val got = AsOfJoin.asOf(left, right, "k", "t", "lid", "rid")
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map("L1" -> "RA", "L2" -> "RB"))
  }

  test("grouping sets = the union of its marginal groupBys, and only those") {
    import graft.operators.Relational
    val gs = Relational.qGroupingSets(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    val byFlag = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("q"), count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), null, r.getDouble(1), r.getLong(2)))
    val byStatus = li.groupBy("l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("q"), count(lit(1)).as("n")).collect()
      .map(r => (null, r.getString(0), r.getDouble(1), r.getLong(2)))
    val total = li.agg(round(sum("l_quantity"), 2).as("q"), count(lit(1)).as("n"))
      .collect().map(r => (null, null, r.getDouble(0), r.getLong(1)))
    val expect = (byFlag ++ byStatus ++ total).toSet
    val got = gs.map(r => (
      if (r.isNullAt(0)) null else r.getString(0),
      if (r.isNullAt(1)) null else r.getString(1),
      r.getDouble(2), r.getLong(3))).toSet
    assert(got === expect) // no (flag, status) pairwise cells
  }

  test("semi join emits each matching customer exactly once") {
    import graft.operators.Relational
    val semi = Relational.qSemiJoin(spark, sf)
    val keys = semi.select("c_custkey").collect().map(_.getLong(0))
    assert(keys.length === keys.distinct.length)
    val withOrders = Tables.orders(spark, sf)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(keys.toSet === keys.toSet.intersect(withOrders))
    val custs = Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(keys.toSet === custs.intersect(withOrders))
  }

  test("range frame counts exactly the trailing-hour events per user") {
    import graft.operators.Relational
    val got = Relational.qRangeFrame(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._2)
    val expect = ev.map { case (id, u, t) =>
      id -> byUser(u).count { case (_, _, t2) => t2 >= t - 3600000L && t2 <= t }.toLong
    }.toMap
    assert(got === expect)
  }

  test("dedup keep: exactly one keeper per group, and it has the top rounded quality") {
    import graft.operators.{NearDup, TextAnalysis => TA}
    val keep = NearDup.dedupKeep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val quality = TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    keep.groupBy(_._2).foreach { case (gid, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length === 1, s"group $gid")
      val keeper = keepers.head
      assert(members.forall(_._3 == keeper._1), s"group $gid keep_id consistent")
      val best = members.map(m => (quality(m._1), -m._1)).max
      assert((quality(keeper._1), -keeper._1) === best, s"group $gid keeps best quality")
    }
  }

  test("int8 quantization: codes bounded, reconstruction error bounded by scale/2 per dim") {
    import graft.operators.Ann
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = Ann.embQuantize(spark, sf).collect()
    assert(q.length === e.size)
    q.foreach { r =>
      val (id, scale, qsum, err) =
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3))
      val v = e(id).map(_.toDouble)
      val exactScale = v.map(math.abs).max / 127.0
      assert(math.abs(scale - exactScale) < 1e-6)
      if (exactScale > 0) {
        val codes = v.map(x => math.floor(x / exactScale + 0.5).toLong)
        assert(codes.forall(c => c >= -127 && c <= 127))
        assert(qsum === codes.sum)
        // each |x - q*scale| <= scale/2 → l2 <= scale/2 * sqrt(64)
        assert(err <= exactScale / 2 * 8 + 1e-6)
      }
    }
  }

  test("intersect = manual set intersection of the two projections") {
    import graft.operators.Relational
    val ev = Tables.events(spark, sf)
    val click = ev.filter(col("event_type") === "click")
      .select("user_id").collect().map(_.getLong(0)).toSet
    val purchase = ev.filter(col("event_type") === "purchase")
      .select("user_id").collect().map(_.getLong(0)).toSet
    val got = Relational.qIntersect(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got === click.intersect(purchase))
  }

  test("normalized dedup merges at least as much as exact, and groups are normalization-consistent") {
    import graft.operators.NearDup
    val norm = NearDup.docsDedupNormalized(spark, sf).collect()
    val exact = NearDup.docsDedupExact(spark, sf).collect()
    assert(norm.length <= exact.length)
    assert(norm.map(_.getLong(3)).forall(_ >= 1)) // n_raw_variants
    assert(norm.map(_.getLong(2)).sum === exact.map(r => r.getLong(2)).sum) // doc count conserved
    def normalize(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectGroups = docs.values.map(normalize).toSet.size
    assert(norm.length === expectGroups)
  }

  test("ann recall equals a manual overlap of IVF vs brute force") {
    import graft.operators.Ann
    val exact = Ann.annBruteForce(spark, sf).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val ivf = Ann.annIvf(spark, sf).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Ann.annRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (q, nMatch, recall) =>
      val expect = exact(q).count(ivf.contains).toLong
      assert(nMatch === expect, s"q=$q")
      assert(recall === math.rint(nMatch / 5.0 * 10000) / 10000)
      assert(recall >= 0.0 && recall <= 1.0)
    }
    assert(got.length === exact.size)
  }

  test("chunking covers every char, respects overlap, and reassembles the document") {
    import graft.operators.TextAnalysis
    val chunks = TextAnalysis.docsChunk(spark, sf, size = 200, overlap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet === docs.keySet)
    docs.foreach { case (id, text) =>
      val cs = chunks(id)
      // stride-150 prefixes reassemble the full text exactly
      val rebuilt = cs.init.map(_.take(150)).mkString + cs.last
      assert(rebuilt === text, s"doc $id")
      // consecutive chunks agree on the 50-char overlap
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(a.drop(150) === b.take(a.length - 150), s"doc $id overlap")
        case _ =>
      }
      assert(cs.init.forall(_.length === 200), s"doc $id full chunks")
    }
  }

  test("chunking edge cases: empty text, exact boundaries, tiny docs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // lengths around the stride/size boundaries: 0, 1, overlap,
    // stride, size, size+1, exactly two strides + overlap
    val docs = Seq(0, 1, 50, 150, 200, 201, 350)
      .zipWithIndex.map { case (n, i) => (i.toLong, "x" * n) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, 200, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got(0L) === Seq(""))           // empty doc → one empty chunk
    assert(got(1L) === Seq("x"))
    assert(got(2L) === Seq("x" * 50))
    assert(got(3L) === Seq("x" * 150))    // == stride → single chunk
    assert(got(4L) === Seq("x" * 200))    // == size → single chunk
    assert(got(5L).map(_.length) === Seq(200, 51))  // one char spills over
    assert(got(6L).map(_.length) === Seq(200, 200)) // 350 = 2*150 + 50
  }

  test("stratified sampling is deterministic and near the configured rates") {
    import graft.operators.Sampling
    val a = Sampling.docsSampleStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val b = Sampling.docsSampleStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(a.toSet === b.toSet) // rerun picks the same rows
    val byLang = a.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val rate = lang match { case "en" => 0.5; case "zh" => 0.3; case _ => 0.2 }
      val got = rows.count(_._3).toDouble / rows.length
      // loose binomial bound: small strata at sf0.001 (~10-100 docs)
      assert(math.abs(got - rate) < 0.25, s"$lang rate $got vs $rate")
    }
  }

  test("dsir weights replay the hashed-bigram target affinities and separate the target slice") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    def bucketOf(f: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 4096L
    }
    val feats = docs.flatMap { case (id, lang, t) =>
      t.sliding(2).collect { case Seq(a, b) => (id, lang, bucketOf(s"$a $b")) } }
    val cR = feats.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cT = feats.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val expect = feats.groupBy(f => (f._1, f._2)).map { case ((id, lang), fs) =>
      val terms = fs.map(f => 1000000L * (cT.getOrElse(f._3, 0L) + 1) / (cR(f._3) + 1))
      (id, lang) -> (fs.length.toLong, terms.sum / fs.length)
    }
    val got = Sampling.docsDsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
    // the selection signal separates: target-language docs score
    // higher on average than the rest (hashed en-bigrams concentrate
    // in buckets where c_t tracks c_r)
    val (en, rest) = got.toSeq.partition(_._1._2 == "en")
    def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.length
    assert(mean(en.map(_._2._2)) > mean(rest.map(_._2._2)))
  }

  test("tpch completions q12/q18/q21 replay from first principles") {
    import graft.operators.Tpch
    def ms(v: Any): Long = v match { // NTZ parquet surfaces LocalDateTime
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_returnflag", "l_quantity", "l_shipdate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3).toLong, ms(r.get(4))))
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
      .collect().map(r => r.getLong(0) -> (r.getString(1), ms(r.get(2)), r.getString(3))).toMap
    def days(shipMs: Long, ordMs: Long): Long =
      shipMs / 86400000L - ordMs / 86400000L // midnight timestamps, UTC session
    // q12: delayed lines by returnflag x priority class
    val delayed = li.filter { case (ok, _, _, _, ship) => days(ship, ord(ok)._2) > 750 }
    val expect12 = delayed.groupBy(_._3).view.mapValues { ls =>
      val high = ls.count(l => Set("1-URGENT", "2-HIGH")(ord(l._1)._3)).toLong
      (high, ls.length - high)
    }.toMap
    val got12 = Tpch.q12Priority(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got12 === expect12)
    // q18: per-order quantity gate
    val expect18 = li.groupBy(_._1).view.mapValues(_.map(_._4).sum)
      .filter(_._2 > 250).toMap
    val got18 = Tpch.q18LargeOrders(spark, sf).collect()
      .map(r => r.getLong(2) -> r.getLong(5)).toMap
    assert(got18 === expect18)
    // q21: sole-late supplier in finished multi-supplier orders
    val pairs = li.filter(l => ord(l._1)._1 == "F")
      .groupBy(l => (l._1, l._2)).view.mapValues(ls =>
        ls.exists(l => days(l._5, ord(l._1)._2) > 1200)).toMap
    val expect21 = pairs.keys.toSeq
      .filter { case (okk, sk) => pairs((okk, sk)) &&
        pairs.keys.exists(p => p._1 == okk && p._2 != sk) &&
        !pairs.exists(p => p._1._1 == okk && p._1._2 != sk && p._2) }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got21 = Tpch.q21Waiting(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got21 === expect21 && got21.nonEmpty)
  }

  test("dsir resample keeps docs by the exact weight-proportional hash rule") {
    import graft.operators.Sampling
    val wts = Sampling.docsDsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val wTotal = wts.map(_._3).map(BigInt(_)).sum
    val expect = wts.filter { case (id, _, w) =>
      BigInt(Sampling.hash32Of(id)) * wTotal < BigInt(w) * BigInt(4294967296L) * 100
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = Sampling.docsDsirSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expect && got.nonEmpty)
    // selection pressure: the kept set's mean weight exceeds the corpus mean
    val meanAll = wts.map(_._3).sum.toDouble / wts.length
    val meanKept = got.toSeq.map(_._3).sum.toDouble / got.size
    assert(meanKept > meanAll)
  }

  test("tile plan partitions every image exactly (areas sum, edges clip, row-major)") {
    import graft.operators.Multimodal
    val decoded = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
    val dims = decoded.collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    val tiles = Multimodal.tilePlan(decoded).collect().groupBy(_.doc_id)
    assert(tiles.keySet === dims.keySet)
    tiles.foreach { case (id, ts) =>
      val (w, h) = dims(id)
      assert(ts.map(t => t.w.toLong * t.h).sum === w.toLong * h, s"doc $id area")
      assert(ts.forall(t => t.x0 + t.w <= w && t.y0 + t.h <= h), s"doc $id bounds")
      assert(ts.forall(t => t.w > 0 && t.h > 0), s"doc $id degenerate tile")
      val expected = ((w + 63) / 64) * ((h + 63) / 64)
      assert(ts.length === expected, s"doc $id tile count")
    }
  }

  test("salted join equals the plain unsalted join") {
    import graft.operators.Relational
    val salted = Relational.qSaltedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sf)
    val dim = ev.groupBy("event_type").agg(round(avg("value"), 4).as("type_avg"))
    val plain = ev.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > col("type_avg"), 1).otherwise(0)).cast("long").as("n_above"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("repetition and boilerplate signals match a manual replay") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(s: String, k: Int) = {
      val t = s.split(" ", -1)
      if (t.length < k) Seq.empty[String]
      else t.sliding(k).map(_.mkString(" ")).toSeq
    }
    val rep = TextAnalysis.textRepetition(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, text) =>
      val sh = shingles(text, 3)
      assert(rep(id) === ((sh.length.toLong, sh.distinct.length.toLong)), s"doc $id")
    }
    val top = docs.values.flatMap(t => shingles(t, 2).distinct).toSeq
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (ng, df) => (-df, ng) }.take(20).map(_._1).toSet
    val boiler = TextAnalysis.textBoilerplate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    boiler.foreach { case (id, nBigrams, nTop) =>
      val bg = shingles(docs(id), 2).distinct
      assert(nBigrams === bg.length.toLong, s"doc $id bigrams")
      assert(nTop === bg.count(top).toLong, s"doc $id top hits")
    }
  }

  test("retention and funnel match a manual replay over collected events") {
    import graft.operators.Relational
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"),
        to_date(col("ts")).cast("string").as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))

    // retention: cohort = first day per user, distinct users per offset
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    val expRet = ev.map { case (u, _, _, d) =>
      val c = firstDay(u)
      ((c, java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(c), java.time.LocalDate.parse(d)).toInt), u)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val gotRet = Relational.qRetention(spark, sf).collect()
      .map(r => ((r.getDate(0).toString, r.getInt(1)), r.getLong(2))).toMap
    assert(gotRet === expRet)

    // funnel: purchase within 1h after the user's FIRST click
    val firstClick = ev.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val expFun = firstClick.map { case (u, c) =>
      u -> ev.exists(e => e._1 == u && e._2 == "purchase" &&
        e._3 >= c && e._3 <= c + 3600000L)
    }
    val gotFun = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) == 1L)).toMap
    assert(gotFun === expFun)
  }

  test("quality gate flags are consistent with the underlying signals, keep is their conjunction") {
    import graft.operators.TextAnalysis
    val gate = TextAnalysis.docsQualityFilter(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6))))
    assert(gate.length === Tables.documents(spark, sf).count())
    val rep = TextAnalysis.textRepetition(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val boiler = TextAnalysis.textBoilerplate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val quality = TextAnalysis.textQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // n_tokens
    gate.foreach { case (id, (fShort, fLong, _, fRep, fBoiler, keep)) =>
      assert(fShort === (quality(id) < 5), s"doc $id short")
      assert(fLong === (quality(id) > 80), s"doc $id long")
      val (nSh, nD) = rep(id)
      assert(fRep === (nD * 5 < nSh * 4), s"doc $id repetitive")
      val (nB, nTop) = boiler(id)
      assert(fBoiler === (nTop * 5 > nB * 2), s"doc $id boilerplate")
    }
    gate.foreach { case (id, (a, b, c, d, e, keep)) =>
      assert(keep === !(a || b || c || d || e), s"doc $id keep")
    }
  }

  test("frame energy replays the byte math exactly (centering, tail frames, peak)") {
    import graft.operators.Multimodal
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val payloads = media.collect().map(r => r.doc_id -> r.payload).toMap
    val got = Multimodal.frameEnergy(media).collect()
    got.foreach { f =>
      val frame = payloads(f.doc_id).slice(f.frame_idx * 64, f.frame_idx * 64 + 64)
      assert(f.n_samples === frame.length)
      val samples = frame.map(b => (b & 0xFF) - 128)
      assert(f.energy === samples.map(s => s.toLong * s).sum)
      assert(f.peak === (if (samples.isEmpty) 0 else samples.map(math.abs).max))
    }
    // every byte of every payload is covered by exactly one frame
    val covered = got.groupBy(_.doc_id).view.mapValues(_.map(_.n_samples).sum).toMap
    assert(covered === payloads.view.mapValues(_.length).toMap)
  }

  test("multimodal decode is deterministic and batch-shaped") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.decodeFeatures(media)
    val rows = feats.collect()
    assert(rows.length === media.count().toInt)
    assert(rows.forall(f => f.width >= 16 && f.height >= 16 && f.n_bytes > 0))
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(rows.sortBy(_.doc_id).map(_.checksum).sameElements(again.sortBy(_.doc_id).map(_.checksum)))
  }

  test("bucketed range join equals the naive theta-join count") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val mk = (rows: Seq[(Long, Long)]) => rows.toDF("id", "t")
      .select(col("id"), timestamp_millis(col("t")).as("ts"))
    val left = mk(Seq((1L, 1000L), (2L, 5000L), (3L, 100000L)))
    val right = mk(Seq((10L, 0L), (11L, 900L), (12L, 4500L), (13L, 99000L), (14L, 100001L)))
    val got = RangeJoin.countInWindow(left, right.select("ts"), "id", windowMs = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 1 [0,1000]: right at 0, 900 → 2; id 2 [4000,5000]: 4500 → 1;
    // id 3 [99000,100000]: 99000 → 1 (100001 is after)
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("resize plan preserves aspect ratio, never upscales, floors at 1px") {
    import spark.implicits._
    val feats = Seq(
      Multimodal.MediaFeatures(1L, 10, 0L, 100, 200),   // fits: untouched
      Multimodal.MediaFeatures(2L, 10, 0L, 1024, 512),  // downscale 4x
      Multimodal.MediaFeatures(3L, 10, 0L, 1000, 1)     // degenerate strip
    ).toDS()
    val r = Multimodal.resizePlan(feats, box = 256)
      .collect().map(x => x.doc_id -> x).toMap
    assert((r(1L).out_w, r(1L).out_h, r(1L).scale_pct) === ((100, 200, 100)))
    assert((r(2L).out_w, r(2L).out_h) === ((256, 128)))
    assert(r(3L).out_w === 256 && r(3L).out_h === 1) // 1*256/1000 floors to 0 -> 1px guard
    // out dims never exceed the box
    assert(r.values.forall(x => math.max(x.out_w, x.out_h) <= 256))
  }

  test("frame sampling is exact on frame boundaries and strides") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](1025)(i => (i % 251).toByte) // 5 frames of 256 (last = 1 byte)
    val media = Seq(Multimodal.MediaRow(7L, payload)).toDS()
    val frames = Multimodal.frameSample(media, frameBytes = 256, stride = 4)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 4)) // 5 frames → sampled 0 and 4
    assert(frames(0).n_bytes === 256 && frames(1).n_bytes === 1)
  }

  test("corpus ngram top-k is deterministic, ordered, and df-consistent") {
    val rows = TextAnalysis.textNgramTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 20)
    // ordered by (df desc, ngram asc)
    assert(rows.sameElements(rows.sortBy { case (g, df) => (-df, g) }))
    assert(rows.forall(_._2 >= 1))
  }

  test("quality scores stay in [0,1] and langid emits known labels") {
    val q = TextAnalysis.textQuality(spark, sf).collect()
    assert(q.forall { r =>
      val s = r.getDouble(r.fieldIndex("quality_score")); s >= 0.0 && s <= 1.0
    })
    val langs = TextAnalysis.textLangId(spark, sf)
      .select("lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("histogram cells partition the events exactly, bounds inside the bucket") {
    import graft.operators.Relational
    val ev = Tables.events(spark, sf)
    val cells = Relational.qHistogram(spark, sf).collect()
    assert(cells.map(_.getLong(2)).sum === ev.count())
    assert(cells.forall { r =>
      val (b, lo, hi) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      lo <= hi && math.floor(lo / 10.0).toLong == b && math.floor(hi / 10.0).toLong == b
    })
  }

  test("incremental dedup: ingest iff novel vs history AND first in batch") {
    import graft.operators.NearDup
    val rows = NearDup.dedupIncremental(spark, sf).collect()
    // batch = exactly the doc_id % 5 == 0 split
    val batchIds = Tables.documents(spark, sf).filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === batchIds)
    val hist = Tables.documents(spark, sf).filter(col("doc_id") % 5 =!= 0)
      .select(md5(col("text"))).collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(r.getBoolean(2) === hist.contains(r.getString(1)))
      assert(r.getBoolean(4) === (!r.getBoolean(2) && !r.getBoolean(3)))
    }
    // within the batch, each hash has exactly one non-dup_in_batch row
    rows.groupBy(_.getString(1)).foreach { case (_, g) =>
      assert(g.count(!_.getBoolean(3)) === 1)
    }
  }

  test("ntile assigns floor-standard bucket sizes over the unique sort") {
    import graft.operators.Relational
    val got = Relational.qNtile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expect = ev.groupBy(_._2).flatMap { case (t, g) =>
      val s = g.sortBy(e => (e._3, e._1))
      val n = s.length; val b = 4
      val sizes = Array.tabulate(b)(i => n / b + (if (i < n % b) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _) // SQL-standard ntile sizing
      s.indices.map(i => (s(i)._1, t, bounds.indexWhere(_ > i)))
    }.toSet
    assert(got.toSet === expect)
  }

  test("unpivot emits one (measure, value) row per wide cell, values intact") {
    import graft.operators.Relational
    val long = Relational.qUnpivot(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val flags = long.keys.map(_._1).toSet
    assert(long.size === flags.size * 3) // 3 measures per group, no loss
    // spot-replay one measure against a direct aggregate
    val nLines = Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    flags.foreach(f => assert(long((f, "n_lines")) === nLines(f)))
  }

  test("lag/lead deltas are symmetric and consistent with a manual walk") {
    import graft.operators.Relational
    val rows = Relational.qLagDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // manual replay from the raw events
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._2).values.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._1)) // full-resolution sort, ms-truncated deltas
      def ms(i: Int): Long = Math.floorDiv(s(i)._3, 1000L)
      s.indices.map { i =>
        (s(i)._1, s(i)._2,
          if (i == 0) None else Some(ms(i) - ms(i - 1)),
          if (i == s.length - 1) None else Some(ms(i + 1) - ms(i)))
      }
    }.toSet
    assert(rows.toSet === expect)
    // X's ms_until_next == successor's ms_since_prev (symmetry)
    assert(rows.flatMap(_._4).sum === rows.flatMap(_._3).sum)
  }

  test("corpus dedup stats are consistent with the exact-dedup groups") {
    import graft.operators.NearDup
    val groups = NearDup.docsDedupExact(spark, sf).collect()
      .map(_.getLong(2)) // n_copies per content hash
    val r = NearDup.docsDedupStats(spark, sf).collect().head
    assert(r.getLong(0) === groups.sum)            // n_docs
    assert(r.getLong(1) === groups.length.toLong)  // n_unique
    assert(r.getLong(2) === groups.sum - groups.length) // n_dupes
    assert(r.getLong(3) === groups.count(_ > 1).toLong)
    assert(r.getLong(4) === groups.max)
  }

  test("vocab stats match a manual replay of the word frequencies") {
    val freqs = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (_, v) => v.length.toLong }.toSeq
    val r = TextAnalysis.vocabStats(spark, sf).collect().head
    assert(r.getLong(0) === freqs.sum)
    assert(r.getLong(1) === freqs.size.toLong)
    assert(r.getLong(2) === freqs.count(_ == 1L).toLong)
  }

  test("embedding dim stats: 64 dims, m2 >= mean^2, bounds contain the mean") {
    import graft.operators.Ann
    val rows = Ann.embDimStats(spark, sf).collect()
    assert(rows.length === 64)
    rows.foreach { r =>
      val (m, m2, lo, hi) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(m2 >= m * m - 1e-9) // E[v²] ≥ E[v]² up to rounding
      assert(lo <= m && m <= hi)
    }
  }

  test("moving sum over a 4-row frame replays against a manual walk") {
    import graft.operators.Relational
    val got = Relational.qMovingAvg(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        floor(col("value") * 1000.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._2).values.foreach { g =>
      val s = g.sortBy(e => (e._3, e._1))
      s.indices.foreach { i =>
        val frame = s.slice(math.max(0, i - 3), i + 1)
        assert(got(s(i)._1) === ((frame.map(_._4).sum, frame.length.toLong)))
      }
    }
  }

  test("conditional aggregates count exactly the predicated subsets") {
    import graft.operators.Relational
    val rows = Relational.qCondAgg(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (t, g) =>
      val high = g.filter(_._2 > 50.0)
      assert(rows(t) === ((g.length.toLong, high.length.toLong,
        high.map(_._3).distinct.length.toLong, g.count(_._4 % 2 == 0).toLong)))
    }
  }

  test("string agg emits the 3 earliest event ids in rank order") {
    import graft.operators.Relational
    val got = Relational.qStringAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, g) =>
      val expect = g.sortBy(e => (e._3, e._2)).take(3).map(_._2).mkString(",")
      assert(got(t) === expect)
    }
  }

  test("first/last profile picks the boundary rows of the unique order") {
    import graft.operators.Relational
    val got = Relational.qFirstLast(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (u, g) =>
      val s = g.sortBy(e => (e._3, e._4))
      assert(got(u) === ((s.head._2, s.last._2,
        Math.floorDiv(s.head._3, 1000L), Math.floorDiv(s.last._3, 1000L), s.length.toLong)))
    }
  }

  test("activity gaps: span = active + gap days, bounds from the day set") {
    import graft.operators.Relational
    val rows = Relational.qActivityGaps(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (span, active, gap) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(span === active + gap)
      assert(active >= 1 && span >= active)
      assert(r.getDate(2).toLocalDate.toEpochDay - r.getDate(1).toLocalDate.toEpochDay + 1 === span)
    }
    // replay one user's distinct-day count
    val u = rows.head.getLong(0)
    val days = Tables.events(spark, sf).filter(col("user_id") === u)
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.head.getLong(4) === days)
  }

  test("outer join keeps users from both sides with zero-filled counts") {
    import graft.operators.Relational
    val rows = Relational.qOuterJoin(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
    assert(rows.map(_._1).distinct.length === rows.length) // one row per user
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clicks = ev.filter(_._2 == "click").groupBy(_._1).map { case (u, g) => (u, g.length.toLong) }
    val purchases = ev.filter(_._2 == "purchase").groupBy(_._1).map { case (u, g) => (u, g.length.toLong) }
    assert(rows.map(_._1).toSet === clicks.keySet ++ purchases.keySet)
    rows.foreach { case (u, (nc, np, seg)) =>
      assert(nc === clicks.getOrElse(u, 0L) && np === purchases.getOrElse(u, 0L))
      assert(seg === (if (nc > 0 && np > 0) "both" else if (nc > 0) "click_only" else "purchase_only"))
    }
  }

  test("gram matrix cells equal brute-force quantized products") {
    import graft.operators.Ann
    val got = Ann.embGram(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got.size === 64 * 65 / 2)
    // brute-force replay from the raw embeddings
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val qs = vecs.map { v =>
      val d = v.map(_.toDouble)
      val scale = d.map(math.abs).max / 127.0
      if (scale == 0.0) Array.fill(64)(0L)
      else d.map(x => math.floor(x / scale + 0.5).toLong)
    }
    for (i <- 0 until 64; j <- i until 64 if (i + j) % 23 == 0) // spot grid
      assert(got((i, j)) === qs.map(q => q(i) * q(j)).sum)
    // diagonal is a sum of squares — non-negative, and zero only if
    // every vector's component i quantizes to 0
    (0 until 64).foreach(i => assert(got((i, i)) >= 0L))
  }

  test("bloom-prefiltered dedup equals the exact history join") {
    import graft.operators.{BloomDedup, NearDup}
    val got = BloomDedup.dedupBloom(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getBoolean(2)))).toMap
    val exact = NearDup.dedupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getBoolean(2)))).toMap
    assert(got === exact)
    assert(got.values.exists(_._2) || got.nonEmpty) // sanity: frame non-empty
  }

  test("phash: bands rebuild from the blockhash kernel, exact dups at distance 0") {
    import graft.operators.Multimodal
    val rows = Multimodal.mmPhash(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val bs = Multimodal.blockhash(bytes)
      assert(rows(id) === ((bytes.length, bs(0), bs(1), bs(2), bs(3))))
      bs.foreach(b => assert(b >= 0 && b <= 0xFFFF))
    }
    // identical payloads fingerprint identically (vacuous at sf where
    // the corpus has no exact dups; the sf0.01 oracle gate has them)
    docs.groupBy(_._2).values.filter(_.length > 1).foreach { g =>
      assert(g.map(d => rows(d._1)).distinct.length === 1)
    }
    // synthetic sensitivity: flipping one block's bytes moves few bits
    val base = Array.tabulate(640)(i => ((i * 37) % 251).toByte)
    val near = base.clone()
    (0 until 10).foreach(i => near(i) = 127.toByte) // one block of 64
    val (hb, hn) = (Multimodal.blockhash(base), Multimodal.blockhash(near))
    val d = (0 until 4).map(k => Integer.bitCount(hb(k) ^ hn(k))).sum
    assert(d >= 0 && d <= 8) // localized edit ⇒ localized bit churn
    assert(Multimodal.blockhash(base).sameElements(hb)) // deterministic
  }

  test("phash pairs: banded join finds every pair within distance 3, none farther") {
    import graft.operators.Multimodal
    val got = Multimodal.phashPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val fps = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Multimodal.blockhash(r.getString(1).getBytes("UTF-8"))))
    def hamming(a: Array[Int], b: Array[Int]): Int =
      (0 until 4).map(k => Integer.bitCount(a(k) ^ b(k))).sum
    // brute-force all pairs: banding must be complete for d ≤ 3
    val expect = fps.indices.flatMap { i =>
      ((i + 1) until fps.length).flatMap { j =>
        val d = hamming(fps(i)._2, fps(j)._2)
        if (d > 3) None
        else {
          val (x, y) =
            if (fps(i)._1 < fps(j)._1) (fps(i)._1, fps(j)._1)
            else (fps(j)._1, fps(i)._1)
          Some(((x, y), d))
        }
      }
    }.toMap
    assert(got === expect) // banding complete ∧ no false survivors
  }

  test("compact-latest keeps exactly the newest row per (user, type)") {
    import graft.operators.Relational
    val got = Relational.qCompactLatest(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val expect = ev.groupBy(e => (e._1, e._2)).map { case (k, g) =>
      val last = g.maxBy(e => (e._4, e._3))
      (k, (last._3, Math.floorDiv(last._4, 1000L), last._5))
    }
    assert(got === expect)
  }

  test("rarity sums replay the document-frequency join") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.textRarity(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val dfMap = docs.flatMap { case (id, ts) => ts.distinct.map(t => (t, id)) }
      .groupBy(_._1).map { case (t, g) => (t, g.length.toLong) }
    docs.foreach { case (id, ts) =>
      val sumDf = ts.map(dfMap).sum
      val n = ts.length.toLong
      assert(got(id) === ((n, sumDf, ts.map(dfMap).min, 10000L * sumDf / n)))
    }
  }

  test("mod-p minhash signatures replay exactly via BigInt") {
    import graft.operators.NearDup
    import graft.functions.MinHashSig
    val got = NearDup.minhashSignatures(spark, sf).collect()
      .map(r => (r.getLong(0), (1 to MinHashSig.PERMS).map(r.getLong))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    var checked = 0
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val shingles = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
      if (shingles.isEmpty) assert(!got.contains(id))
      else {
        val hs = shingles.map { s =>
          val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(hex.take(15), 16)
        }
        val expect = (0 until MinHashSig.PERMS).map { i =>
          val (a, b) = MinHashSig.coeff(i)
          hs.map(h => ((BigInt(a) * h + b) mod BigInt(MinHashSig.P)).toLong).min
        }
        assert(got(id) === expect)
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("sequence packing replays a per-lang running walk") {
    import graft.operators.Sampling
    val got = Sampling.docsPack(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).length.toLong))
    docs.groupBy(_._2).foreach { case (lang, g) =>
      var cum = 0L
      g.sortBy(_._1).foreach { case (id, _, n) =>
        val start = cum
        cum += n
        assert(got(id) === ((lang, n, start / 256, start % 256,
          start / 256 != (cum - 1) / 256)))
      }
    }
    // packs are densely filled: every non-first doc in a pack starts
    // exactly where the previous doc's tokens ended
    assert(got.nonEmpty)
  }

  test("scene cuts fire exactly on >50% energy moves") {
    import graft.operators.Multimodal
    val rows = Multimodal.mmSceneCuts(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((doc, fi), (e, prev, cut)) =>
      prev match {
        case None =>
          assert(fi === 0 && !cut)
        case Some(p) =>
          assert(rows((doc, fi - 1))._1 === p) // prev chains correctly
          assert(cut === (math.abs(e - p) * 2 > p))
      }
    }
  }

  test("yield report reconciles with the pipeline's survivor set") {
    import graft.operators.Pipeline
    val rep = Pipeline.docsYieldReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // per-source input accounting covers the whole corpus
    assert(rep.map(_._2).sum === Tables.documents(spark, sf).count())
    // stage monotonicity and survivor-count agreement with the pipeline
    rep.foreach { case (s, in, tin, kept, out, tout, y) =>
      assert(kept <= in && out <= kept, s"source $s stage counts not monotone")
      assert(tout <= tin && y === tout * 10000L / tin, s"source $s yield math")
    }
    assert(rep.map(_._5).sum === Pipeline.docsPipeline(spark, sf).count())
  }

  test("pipeline = quality gate ∘ exact dedup ∘ packing, stage by stage") {
    import graft.operators.{Pipeline, TextAnalysis}
    val got = Pipeline.docsPipeline(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // stage replay: keep-set from the quality operator, dedup + pack by hand
    val keep = TextAnalysis.docsQualityFilter(spark, sf)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => keep(d._1))
    val survivors = docs.groupBy(_._3).values.map(_.minBy(_._1)).toSeq
    val expect = survivors.groupBy(_._2).flatMap { case (lang, g) =>
      var cum = 0L
      g.sortBy(_._1).map { case (id, _, text) =>
        val n = text.split(" ", -1).length.toLong
        val start = cum; cum += n
        (id, (lang, n, start / 256, start % 256))
      }
    }
    assert(got === expect)
    assert(got.size < docs.length + keep.size) // gates actually dropped rows
  }

  test("mode picks the (count desc, type asc) argmax per user") {
    import graft.operators.Relational
    val got = Relational.qMode(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val ev = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = ev.groupBy(_._1).map { case (u, g) =>
      val byType = g.groupBy(_._2).map { case (t, rows) => (t, rows.length.toLong) }
      // argmax: count desc, then type asc
      (u, byType.toSeq.minBy { case (t, n) => (-n, t) })
    }
    assert(got === expect)
  }

  test("scd2 runs partition each user's ordered stream exactly") {
    import graft.operators.Relational
    val got = Relational.qScd2(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // per user: runs cover every event once, types alternate between
    // consecutive runs, boundaries are the run's min/max millis
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e._3, e._4))
      val runs = sorted.foldLeft(Vector.empty[Vector[(Long, String, Long, Long)]]) {
        case (acc, e) =>
          if (acc.nonEmpty && acc.last.head._2 == e._2) acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
      }
      runs.zipWithIndex.map { case (run, i) =>
        ((u, (i + 1).toLong),
          (run.head._2, Math.floorDiv(run.map(_._3).min, 1000L),
            Math.floorDiv(run.map(_._3).max, 1000L), run.length.toLong, run.map(_._4).min))
      }
    }
    assert(got === expect)
  }

  test("bpe pairs count every in-word 2-char window") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.textBpePairs(spark, sf, k = 1000000).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val expect = docs.flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)))
      .groupBy(identity).map { case (p, g) => (p, g.length.toLong) }
    assert(got === expect)
  }

  test("shard plan: hash assignment replays, masses account for the whole corpus") {
    import graft.operators.Sampling
    import java.security.MessageDigest
    val got = Sampling.docsShardPlan(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    def shardOf(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(id.toString.getBytes)
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 16
    }
    val expect = docs.groupBy(d => shardOf(d._1)).map { case (s, ds) =>
      s -> (ds.length.toLong, ds.map(_._2).sum) }
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === expect)
    val total = docs.map(_._2).sum
    got.foreach { case (_, (_, toks, share)) =>
      assert(share === toks * 16L * 10000L / total)
    }
    assert(got.values.map(_._1).sum === docs.length)
  }

  test("mix sample plan: mixture respected, never upsampled, counts consistent") {
    import graft.operators.Sampling
    val rows = Sampling.docsMixSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val wDen = rows.map(_._3).sum
    val t = rows.map { case (_, n, w, _, _) => n * wDen / w }.min
    rows.foreach { case (_, nDocs, wNum, planned, kept) =>
      assert(planned === t * wNum / wDen) // exact mixture share of T
      assert(planned <= nDocs)            // never upsamples a source
      // hash-rate sampling hits the planned count only in expectation
      assert(kept <= nDocs)
    }
    // the whole corpus is partitioned by the plan rows
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === total)
  }

  test("knn graph is block-grid-invariant (the grid only partitions the work)") {
    import graft.operators.Ann
    def edges(blocks: Int) = Ann.embKnnGraph(spark, sf, blocks = blocks).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val derived = edges(0)
    assert(derived.nonEmpty)
    // replicated composite-key join: any grid covers every ordered
    // pair exactly once, so output is invariant in the block count
    assert(edges(5) === derived)
    assert(edges(37) === derived)
  }

  test("knn graph equals brute-force top-k over the hash sample") {
    import graft.operators.{Ann, Sampling}
    val got = Ann.embKnnGraph(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // the same sample the operator selects (identity hash replayed
    // independently: first 8 md5 hex digits of the decimal id)
    val u = conv(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val sample = Tables.embeddings(spark, sf)
      .filter(u < Sampling.rateThreshold(0.1))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val expect = sample.flatMap { case (q, qe) =>
      val n2q = dot(qe, qe)
      sample.filter(_._1 != q)
        .map { case (n, ne) => (n, dot(qe, ne) / (math.sqrt(n2q) * math.sqrt(dot(ne, ne)))) }
        .sortBy { case (n, s) => (-s, n) }
        .take(3).zipWithIndex
        .map { case ((n, s), i) =>
          ((q, i + 1), (n, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) }
    }.toMap
    assert(got === expect)
  }

  test("minhash estimate replays signatures and exact set overlap") {
    import graft.operators.NearDup
    import graft.functions.MinHashSig
    val got = NearDup.minhashEstimate(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // Scala replication: distinct word 3-shingles, 60-bit md5 prefix,
    // mod-p minima — the same definitions, independently evaluated
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
      .map { case (id, ts) =>
        (id, ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet) }
      .filter(_._2.nonEmpty).toMap
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def sig(sh: Set[String]): Array[Long] = {
      val hs = sh.map(h60)
      Array.tabulate(MinHashSig.PERMS) { i =>
        val (a, b) = MinHashSig.coeff(i)
        hs.map(h => MinHashSig.affineMod(a, b, h)).min
      }
    }
    got.foreach { case ((aId, bId), (inter, uni, matches, jaccE4, estE4)) =>
      val (sa, sb) = (docs(aId), docs(bId))
      val i = (sa & sb).size.toLong
      val u = sa.size + sb.size - i
      assert((inter, uni) === ((i, u)))
      assert(i.toDouble / u >= 0.5) // only verified near-dup pairs
      val m = sig(sa).zip(sig(sb)).count { case (x, y) => x == y }.toLong
      assert(matches === m)
      assert(jaccE4 === 10000 * i / u)
      assert(estE4 === 10000 * m / MinHashSig.PERMS)
    }
    assert(got.nonEmpty)
  }

  test("pq codes replay the deterministic two-pass Lloyd codebook") {
    import graft.operators.Ann
    val got = Ann.embPq(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = collection.mutable.Map(embs.map(e => (e._1, 0L)): _*)
    for (m <- 0 until 8) {
      val subs = embs.map { case (id, e) => (id, e.slice(m * 8, m * 8 + 8)) }
      val seeds = subs.filter(_._1 < 16).map { case (id, s) => (id.toInt, s) }.toMap
      def assign(cents: Map[Int, Array[Double]]): Map[Long, Int] =
        subs.map { case (id, s) =>
          // argmax by (score, cid) — ties take the larger cid
          (id, cents.toSeq.maxBy { case (cid, c) => (dot(s, c) - dot(c, c) / 2.0, cid) }._1)
        }.toMap
      val a0 = assign(seeds)
      val means = subs.groupBy(x => a0(x._1)).map { case (cid, g) =>
        (cid, Array.tabulate(8)(i => round4(g.map(_._2(i)).sum / g.length)))
      }
      val cents1 = seeds.map { case (cid, c) => (cid, means.getOrElse(cid, c)) }
      assign(cents1).foreach { case (id, cid) => expect(id) |= cid.toLong << (4 * m) }
    }
    assert(got === expect.toMap)
  }

  test("sketch profile: HLL distinct counts and KLL quantiles inside published bounds") {
    import graft.operators.Relational
    val got = Relational.qSketchProfile(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2), r.getLong(3))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val values = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    assert(got.keySet === exact.keySet)
    got.foreach { case (et, (au, ap, an)) =>
      val (eu, en) = exact(et)
      assert(an === en)
      // HLL++ rsd=0.02: allow 5 sigma
      assert(math.abs(au - eu) <= math.max(2.0, eu * 0.10), s"$et distinct: $au vs $eu")
      // percentile_approx's guarantee is in RANK space (error ≤
      // n/accuracy): the returned value's rank fraction must sit next
      // to the requested quantile (the returned value is a real
      // element, so value-space distance is unbounded in sparse tails)
      val vs = values(et)
      ap.zip(Seq(0.5, 0.9, 0.99)).foreach { case (a, q) =>
        val frac = vs.count(_ <= a).toDouble / vs.length
        assert(math.abs(frac - q) <= 0.01 + 1.0 / vs.length,
          s"$et q=$q: value $a has rank fraction $frac")
      }
    }
  }

  test("interval overlap: sweep-line peak equals the brute-force concurrency max") {
    import graft.operators.Relational
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_millis(ts)").as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = ev.groupBy(_._1).map { case (et, rows) =>
      val ts = rows.map(_._2)
      // concurrency just after instant t = opens in (t-30m, t]
      val peak = ts.map(t => ts.count(s => s > t - 1800000L && s <= t)).max
      val peakAt = ts.filter(t => ts.count(s => s > t - 1800000L && s <= t) == peak).min
      et -> (peak.toLong, peakAt)
    }
    val got = Relational.qIntervalOverlap(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
  }

  test("per-day carry-in interval sweep equals the single-sweep result") {
    import graft.operators.Relational
    val single = Relational.qIntervalOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val daily = Relational.qIntervalOverlapDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(daily === single && single.nonEmpty)
  }

  test("salted collocation lift equals the plain marginal joins") {
    import graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val plain = rows(TextAnalysis.docsCoocLift(spark, sf))
    val salted = rows(TextAnalysis.docsCoocLiftSalted(spark, sf))
    assert(salted === plain && plain.nonEmpty)
  }

  test("per-day merge-interval split equals the single-sweep spans") {
    import graft.operators.Relational
    val single = Relational.qMergeIntervals(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val daily = Relational.qMergeIntervalsDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(daily === single && single.nonEmpty)
  }

  test("time buckets form a dense step-aligned grid covering every event") {
    import graft.operators.Relational
    val got = Relational.qTimeBucket(spark, sf).collect()
    val step = 900000L
    // dense per-type grid: consecutive buckets differ by exactly the step
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val buckets = rows.map(_.getLong(1)).sorted
      buckets.sliding(2).foreach {
        case Array(a, b) => assert(b - a === step)
        case _           =>
      }
      assert(buckets.forall(_ % step === 0))
    }
    // gap flag <=> empty bucket; totals cover every source event
    got.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(2) == 0L))
      if (r.getBoolean(4)) assert(r.getLong(3) === 0L)
    }
    assert(got.map(_.getLong(2)).sum === Tables.events(spark, sf).count())
  }

  test("corr subquery keeps exactly the orders strictly above their customer mean") {
    import graft.operators.Relational
    val got = Relational.qCorrSubquery(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = cents.groupBy(_._2).map { case (k, rs) =>
      k -> (rs.map(_._3).sum, rs.length) }
    val expect = cents.collect {
      case (ok, ck, c) if c * byCust(ck)._2 > byCust(ck)._1 => ok
    }.toSet
    assert(got === expect)
  }

  test("simhash groups: edge endpoints share a label, label = min reachable id") {
    import graft.operators.NearDup
    val labels = NearDup.docsSimhashGroups(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = NearDup.simhashPairs(spark, sf).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) => assert(labels(a) === labels(b)) }
    // every label is the minimum of its member set, and a member itself
    labels.groupBy(_._2).foreach { case (g, members) =>
      assert(members.keys.min === g)
    }
    assert(labels.size === Tables.documents(spark, sf).count())
  }

  test("phash groups: edge endpoints share a label, label = min reachable id") {
    val labels = Multimodal.phashGroups(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Multimodal.phashPairs(spark, sf).select("doc_id_a", "doc_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) => assert(labels(a) === labels(b)) }
    labels.groupBy(_._2).foreach { case (g, members) =>
      assert(members.keys.min === g)
    }
    // no text-byte phash collisions in this corpus → all singletons,
    // which the closure must label as themselves
    if (edges.isEmpty) labels.foreach { case (id, g) => assert(id === g) }
    assert(labels.size === Tables.documents(spark, sf).count())
  }

  test("group-size histogram partitions the whole corpus") {
    import graft.operators.NearDup
    val hist = NearDup.docsGroupSizes(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    hist.foreach { case (sz, n, d) => assert(sz * n === d) }
    assert(hist.map(_._3).sum === Tables.documents(spark, sf).count())
    val groups = NearDup.dedupGroups(spark, sf).collect()
      .map(_.getLong(1)).groupBy(identity).values.map(_.length.toLong)
    val expect = groups.groupBy(identity).map { case (sz, g) => (sz, g.size.toLong) }
    assert(hist.map(t => (t._1, t._2)).toMap === expect)
  }

  test("adc search: k ranked neighbors per query, scores descending, no self") {
    import graft.operators.Ann
    val got = Ann.embAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to 5L))
      // descending score with vec_id tie-break, never the query itself
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
      assert(sorted.forall(_._3 != q))
    }
  }

  test("ivf-adc: every result comes from a probed cluster with its full-scan adc score") {
    import graft.operators.Ann
    // the composed search must agree with the whole-corpus ADC scan
    // (emb_adc) on the scores it emits — pruning may drop candidates,
    // never rescore them
    val full = Ann.embAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val fullAll = Ann.embAdc(spark, sf, k = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val got = Ann.embIvfAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === (0L until 5L).toSet)
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length))
    }
    got.foreach { case (q, _, n, s) =>
      assert(fullAll((q, n)) === s, s"score mismatch for ($q, $n)")
    }
    // sanity: pruning keeps most of the true top-k (recall floor, not
    // an exactness claim — nprobe/clusters trades recall for scan)
    val hits = full.keySet.count { case (q, n) => got.exists(g => g._1 == q && g._3 == n) }
    assert(hits >= full.size / 2, s"ivf-adc recall collapsed: $hits/${full.size}")
  }

  test("whitening profile replays the pinned-stats transform") {
    import graft.operators.Ann
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val n = vecs.length
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val stats = (0 until 64).map { i =>
      val col = vecs.map(_._2(i))
      val m = col.sum / n
      (r4(m), r4(math.sqrt(col.map(x => (x - m) * (x - m)).sum / n)))
    }
    val expect = vecs.map { case (id, v) =>
      val wi = (0 until 64).map { i =>
        val (m4, sd4) = stats(i)
        math.floor((v(i) - m4) / sd4 * 10000).toLong
      }
      id -> (wi.sum, wi.min, wi.max)
    }.toMap
    val got = Ann.embWhiten(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
  }

  test("embedding drift replays exact integer centroid geometry per label") {
    import graft.operators.Ann
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val expect = vecs.groupBy(_._3).map { case (label, vs) =>
      def cent(snap: Long): (Array[Long], Long) = {
        val sel = vs.filter(v => v._1 % 2 == snap).map(_._2)
        (Array.tabulate(64)(i => math.round(sel.map(_(i)).sum / sel.length * 10000)),
          sel.length.toLong)
      }
      val ((c0, n0), (c1, n1)) = (cent(0), cent(1))
      val dot = (0 until 64).map(i => c0(i) * c1(i)).sum
      val l2 = (0 until 64).map(i => (c0(i) - c1(i)) * (c0(i) - c1(i))).sum
      val na2 = c0.map(x => x * x).sum; val nb2 = c1.map(x => x * x).sum
      val cos = BigDecimal(dot.toDouble / (math.sqrt(na2.toDouble) * math.sqrt(nb2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      label -> (n0, n1, l2, cos)
    }
    val got = Ann.embDrift(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (label, (na, nb, l2, cos)) =>
      val (ena, enb, el2, ecos) = expect(label)
      assert((na, nb, l2) === ((ena, enb, el2)), s"label $label integer geometry")
      assert(math.abs(cos - ecos) < 2e-6, s"label $label cosine")
    }
  }

  test("hashing tf: per-doc tf sums to the token count, buckets in range") {
    val got = TextAnalysis.textHashingTf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, b, tf) => b >= 0 && b < 64 && tf > 0 })
    val perDoc = got.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).sum }
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc === expect.filter(_._2 > 0))
  }

  test("overlap spans find the longest diagonal run of shared positional shingles") {
    import graft.operators.NearDup
    val k = 8
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    def shingles(t: Seq[String]) =
      if (t.length < k) Seq.empty
      else (0 to t.length - k).map(i => i.toLong -> t.slice(i, i + k).mkString(" "))
    val bench = docs.filter(_._1 < 50).map { case (id, t) => id -> shingles(t) }
    val train = docs.filter(_._1 >= 50).map { case (id, t) => id -> shingles(t) }
    val expect = (for {
      (aId, as) <- train; (bId, bs) <- bench
      bPos = bs.groupBy(_._2).map { case (s, v) => s -> v.map(_._1) }
      hits = as.flatMap { case (pa, s) => bPos.getOrElse(s, Seq.empty).map(pb => (pa, pb)) }
      if hits.nonEmpty
    } yield {
      val runs = hits.groupBy { case (pa, pb) => pa - pb }.values.flatMap { dh =>
        // pos_a unique per diagonal: segment consecutive pos_a
        val sorted = dh.map(_._1).sorted
        val starts = sorted.zipWithIndex.collect {
          case (p, 0) => p
          case (p, i) if sorted(i - 1) != p - 1 => p
        }
        starts.map { st =>
          val len = sorted.dropWhile(_ < st).zipWithIndex.takeWhile { case (p, i) => p == st + i }.length
          (len.toLong, st, st - dh.head._1 + dh.head._2) // (run_len, a_start, b_start-ish)
        }
      }
      val best = runs.toSeq.map { case (len, aSt, _) => (len, aSt) }
        .sortBy { case (len, aSt) => (-len, aSt) }.head
      ((aId, bId), best)
    }).toMap
    val got = NearDup.docsOverlapSpans(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    got.foreach { case ((a, b), (run, toks, aSt, bSt)) =>
      assert(toks === run + k - 1)
      val (eLen, eASt) = expect((a, b))
      assert(run === eLen, s"pair ($a,$b) longest run")
      assert(aSt === eASt, s"pair ($a,$b) a_start")
      // the claimed span really is a shared contiguous token run
      val aT = docs.toMap.apply(a); val bT = docs.toMap.apply(b)
      assert(aT.slice(aSt.toInt, aSt.toInt + toks.toInt) ===
        bT.slice(bSt.toInt, bSt.toInt + toks.toInt), s"pair ($a,$b) span content")
    }
    // completeness: every pair with a >=3-shingle run is emitted
    val expectedPairs = expect.filter(_._2._1 >= 3).keySet
    assert(got.map(_._1).toSet === expectedPairs)
  }

  test("chunk dedup rate replays per-chunk cross-doc membership") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def chunksOf(t: String): Seq[String] = {
      val n = math.max((t.length - 50 + 149) / 150, 1)
      (0 until n).map(i => t.slice(i * 150, i * 150 + 200))
    }
    val perDoc = docs.map { case (id, t) => id -> chunksOf(t) }
    val docsWith = perDoc.flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, v) => c -> v.map(_._2).distinct.size }
    val expect = perDoc.map { case (id, cs) =>
      val shared = cs.count(docsWith(_) > 1).toLong
      id -> (cs.length.toLong, shared, shared * 10000L / cs.length)
    }.toMap
    val got = TextAnalysis.docsChunkDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
  }

  test("ngram novelty replays the min-owner attribution") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val perDoc = docs.collect { case (id, t) if t.length >= 2 =>
      id -> t.sliding(2).map(_.mkString(" ")).toSet }
    val owner = perDoc.flatMap { case (id, bs) => bs.map(_ -> id) }
      .groupBy(_._1).map { case (b, v) => b -> v.map(_._2).min }
    val expect = perDoc.map { case (id, bs) =>
      val novel = bs.count(owner(_) == id).toLong
      id -> (bs.size.toLong, novel, novel * 10000L / bs.size)
    }.toMap
    val got = TextAnalysis.textNgramNovelty(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
  }

  test("lang confusion matrix cells reconcile with the per-doc langid output") {
    val perDoc = TextAnalysis.textLangId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectCells = labels.toSeq
      .groupBy { case (id, lang) => (lang, perDoc(id)) }
      .map { case (k, v) => k -> v.size.toLong }
    val got = TextAnalysis.docsLangConfusion(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.view.mapValues(_._1).toMap === expectCells)
    // recall floors: cells of one label sum to <= 10000, > 10000 - |cells|
    got.groupBy(_._1._1).foreach { case (lang, cells) =>
      val total = labels.values.count(_ == lang).toLong
      cells.foreach { case ((_, _), (n, rec)) =>
        assert(rec === n * 10000L / total)
      }
    }
  }

  test("bigram lm score replays the corpus continuation-ratio mean") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val bigrams = docs.flatMap { case (id, t) => t.sliding(2).collect {
      case Seq(a, b) => (id, a, b) } }
    val c2 = bigrams.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.length.toLong }
    val c1 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val expect = bigrams.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map { case (_, a, b) => c2((a, b)) * 1000000L / c1(a) }
      id -> (bs.length.toLong, terms.sum / bs.length)
    }
    val got = TextAnalysis.textBigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
  }

  // --- shared RQ trainer replay (residual-quantization specs) ---
  private def rqRound4(v: Double) =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def rqDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def rqAssign(vs: Seq[(Long, Array[Double])],
                       cents: Seq[(Long, Array[Double])]): Map[Long, Long] =
    vs.map { case (id, x) =>
      id -> cents.maxBy { case (cid, c) => (rqDot(x, c) - rqDot(c, c) / 2, cid) }._1
    }.toMap
  private def rqTrain(vs: Seq[(Long, Array[Double])])
      : (Map[Long, Array[Double]], Map[Long, Long]) = {
    val seeds = vs.filter(_._1 < graft.operators.Ann.RQ_K)
    val a0 = rqAssign(vs, seeds)
    val byC = vs.groupBy(v => a0(v._1))
    val cents = seeds.map { case (cid, c) =>
      cid -> byC.get(cid).map { m =>
        Array.tabulate(m.head._2.length)(i => rqRound4(m.map(_._2(i)).sum / m.length))
      }.getOrElse(c)
    }
    (cents.toMap, rqAssign(vs, cents))
  }
  private def rqVectors: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).sortBy(_._1).toSeq

  test("residual quantization replays the two-stage deterministic Lloyd end-to-end") {
    import graft.operators.Ann
    val e = rqVectors
    val (c1, a1) = rqTrain(e)
    val resid = e.map { case (id, x) =>
      val c = c1(a1(id)); id -> Array.tabulate(x.length)(i => x(i) - c(i))
    }
    val (c2, b1) = rqTrain(resid)
    val expect = resid.map { case (id, r) =>
      val c = c2(b1(id))
      val err = r.indices.foldLeft(0.0)((s, i) => s + (r(i) - c(i)) * (r(i) - c(i)))
      id -> (a1(id), b1(id), math.floor(err * 10000).toLong)
    }.toMap
    val got = Ann.embRq(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expect)
    // residual coding refines: total two-stage distortion is below the
    // stage-1 distortion of the same vectors
    val d1 = e.map { case (id, x) =>
      val c = c1(a1(id))
      x.indices.foldLeft(0.0)((s, i) => s + (x(i) - c(i)) * (x(i) - c(i)))
    }.sum
    val d2 = expect.values.map(_._3).sum / 10000.0
    assert(d2 < d1)
  }

  test("rq-adc search replays the additive two-LUT scoring over the codes") {
    import graft.operators.Ann
    val e = rqVectors
    val (c1, a1) = rqTrain(e)
    val resid = e.map { case (id, x) =>
      val c = c1(a1(id)); id -> Array.tabulate(x.length)(i => x(i) - c(i))
    }
    val (c2, b1) = rqTrain(resid)
    val queries = e.filter(_._1 < 5)
    val expect = queries.flatMap { case (qid, q) =>
      val scored = e.collect { case (vid, _) if vid != qid =>
        val p1 = math.floor(rqDot(q, c1(a1(vid))) * 10000).toLong
        val p2 = math.floor(rqDot(q, c2(b1(vid))) * 10000).toLong
        (vid, p1 + p2)
      }
      scored.sortBy { case (vid, sc) => (-sc, vid) }.take(5).zipWithIndex
        .map { case ((vid, sc), i) => (qid, i + 1L, vid, sc) }
    }.toSet
    val got = Ann.embRqAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
  }

  test("lm gate buckets docs by exact discrete terciles of the corpus score") {
    val scores = TextAnalysis.textBigramLm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    val sorted = scores.map(_._2).sorted
    val n = sorted.length
    // percentile_disc(k/3): smallest value whose cumulative count
    // reaches k/3 of n = the ceil(k*n/3)-th order statistic
    val cTail = sorted(((n + 2) / 3) - 1)
    val cMid = sorted(((2 * n + 2) / 3) - 1)
    val expect = scores.map { case (id, s) =>
      id -> (s, if (s <= cTail) "tail" else if (s <= cMid) "middle" else "head")
    }.toMap
    val got = TextAnalysis.textLmGate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got === expect)
    // the gate actually splits at this SF: every bucket is populated
    val byBucket = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
  }

  test("zipf head: ranked by frequency, cumulative share is a monotone prefix sum") {
    val got = TextAnalysis.textZipf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq === (1L to got.length))
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
        assert(a._5 <= b._5)
      case _ =>
    }
    // the top-1 token really is the corpus argmax
    val top = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t")).first()
    assert(got.head._2 === top.getString(0) && got.head._3 === top.getLong(1))
  }

  test("audio resample replays the nearest-index pick per output sample") {
    val got = Multimodal.mmAudioResample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val payloads = Multimodal.mediaFromDocuments(spark, sf).collect()
      .map(r => r.doc_id -> r.payload).toMap
    assert(got.length === payloads.size)
    got.foreach { case (id, nIn, nOut, cksum, energy) =>
      val p = payloads(id)
      assert(nIn === p.length)
      assert(nOut === ((p.length.toLong * 160 + 440) / 441).toInt)
      var c = 0L; var e = 0L
      (0 until nOut).foreach { j =>
        val b = p((j.toLong * 441 / 160).toInt) & 0xFF
        c = (c * 31 + b) % 1000000007L
        val s = b - 128
        e += s.toLong * s
      }
      assert(cksum === c && energy === e)
    }
  }

  test("transition matrix counts every consecutive pair exactly once") {
    import graft.operators.Relational
    val got = Relational.qTransitions(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // replay: per-user (us, event_id)-ordered timelines, counted by hand
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).values.flatMap { tl =>
      tl.sortBy(e => (e._4, e._2)).map(_._3).toList.sliding(2).collect { case List(a, b) => (a, b) }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.view.mapValues(_._1).toMap === expect)
    val total = expect.values.sum
    got.foreach { case (_, (n, share)) => assert(share === n * 10000L / total) }
  }

  test("rolling 7-day WAU matches a brute-force trailing window") {
    import graft.operators.Relational
    val got = Relational.qRollingDau(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val du = Tables.events(spark, sf)
      .select(expr("unix_millis(ts) div 86400000").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = du.map(_._1).distinct.sorted
    assert(got.keySet === days.toSet) // only active days emitted
    days.foreach { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter(u => u._1 <= d && u._1 >= d - 6).map(_._2).distinct.length.toLong
      assert(got(d) === ((dau, wau, dau * 10000L / wau)), s"day $d")
    }
  }

  test("cumulative reach ends at the total distinct-user count") {
    import graft.operators.Relational
    val rows = Relational.qRunningDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_._2).sum === totalUsers)
    assert(rows.last._3 === totalUsers)
    // prefix-sum consistency, strictly increasing cum
    rows.foldLeft(0L) { case (acc, (_, nu, cum)) =>
      assert(cum === acc + nu); cum
    }
  }

  test("length profile percentiles are exact order statistics") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.docsLengthProfile(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val docs = Tables.documents(spark, sf).select("lang", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val sorted = ds.sortBy(d => (d._2, d._3)).map(_._2)
      val n = sorted.length
      def pick(q: Int) = sorted(((n.toLong * q + 99) / 100).toInt - 1)
      assert(got(lang) === ((n.toLong, sorted.min, sorted.max,
        pick(10), pick(50), pick(90))), s"lang $lang")
    }
  }

  test("token-length histogram accounts for every token") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.textLenHist(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    got.foreach { case ((_, len), (n, nd)) =>
      assert(len >= 0 && nd >= 1 && nd <= n)
    }
    // token mass per lang reconciles with the corpus token count
    val perLang = got.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum).toMap
    val expect = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("lang").agg(sum("nt").as("nt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perLang === expect)
  }

  test("anomaly flags match exact BigInt mean/variance replay") {
    import graft.operators.Relational
    val got = Relational.qAnomaly(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getBoolean(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.size === ev.length)
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val sq = rows.map(r => BigInt(r._3) * r._3).sum
      rows.foreach { case (id, _, x) =>
        val d = n * x - s
        val expect = d * d > 4 * (n * sq - s * s) // |x-mu| > 2 sigma, exactly
        assert(got(id) === ((x, expect)), s"event $id")
      }
    }
    assert(got.values.exists(_._2) && got.values.exists(!_._2)) // both classes occur
  }

  test("pareto deciles: distributed rank equals a driver-side sort") {
    import graft.operators.Relational
    val got = Relational.qPareto(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1)
    val spend = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ranked = spend.sortBy { case (u, s) => (-s, u) }.zipWithIndex
    val nu = ranked.length.toLong
    val deciles = ranked.groupBy { case (_, i) => i.toLong * 10 / nu }
      .map { case (d, rows) => d -> (rows.length.toLong, rows.map(_._1._2).sum) }
    val total = spend.map(_._2).sum
    var cum = 0L
    got.foreach { case (d, (n, sp, cumGot, share)) =>
      assert((n, sp) === deciles(d), s"decile $d")
      cum += sp
      assert(cumGot === cum && share === cum * 10000L / total, s"decile $d cumulative")
    }
    assert(got.map(_._1) === (0L to 9L).toArray.toSeq || nu < 10)
  }

  test("attribution picks the latest prior non-purchase touch") {
    import graft.operators.Relational
    val got = Relational.qAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "" else r.getString(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4), r.getBoolean(5)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).values.flatMap { tl =>
      val sorted = tl.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.collect { case ((_, id, "purchase", us), idx) =>
        sorted.take(idx).filter(_._3 != "purchase").lastOption match {
          case Some((_, sid, st, sus)) =>
            id -> ((sid, st, (us - sus) / 1000, us - sus <= 1800000000L))
          case None => id -> ((-1L, "", Long.MinValue, false))
        }
      }
    }.toMap
    assert(got === expect)
  }

  test("co-occurrence lift reconciles with brute-force window pairs") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.docsCoocLift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val toks = docs.map(_.split(" ", -1))
    val marg = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = toks.map(_.length.toLong).sum
    val pairs = toks.flatMap { t =>
      t.indices.flatMap(i => (i + 1 to math.min(i + 3, t.length - 1)).map(j => (t(i), t(j))))
    }.groupBy(identity).view.mapValues(_.length.toLong).filter(_._2 >= 5).toMap
    assert(got.keySet === pairs.keySet)
    got.foreach { case (k @ (a, b), (cab, ca, cb, lift)) =>
      assert(cab === pairs(k) && ca === marg(a) && cb === marg(b))
      assert(lift === cab * n * 10000L / (ca * cb))
    }
  }

  test("skew profile buckets reconcile with per-key counts") {
    import graft.operators.Relational
    val got = Relational.qSkewProfile(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val counts = Tables.events(spark, sf).groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val expect = counts.groupBy(n => java.lang.Long.toBinaryString(n).length.toLong)
      .map { case (b, ns) => b -> (ns.length.toLong, ns.sum, ns.max) }
    val total = counts.sum
    assert(got.keySet === expect.keySet)
    got.foreach { case (b, (nk, nr, mx, share)) =>
      assert((nk, nr, mx) === expect(b) && share === nr * 10000L / total, s"bucket $b")
    }
  }

  test("column profile matches direct per-column aggregates") {
    import graft.operators.Relational
    val got = Relational.qColProfile(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    Seq("user_id", "event_type", "value", "props").foreach { c =>
      val nn = ev.filter(col(c).isNotNull).count()
      val nd = ev.select(c).filter(col(c).isNotNull).distinct().count()
      assert(got(c) === ((n, n - nn, nd)), s"column $c")
    }
  }

  test("lsh balance reconciles with the raw signature table") {
    import graft.operators.Ann
    val got = Ann.embLshBalance(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sigs = Ann.lshSignatures(spark, sf).collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(got.size === Ann.LSH_TABLES)
    sigs.groupBy(_._1).foreach { case (t, rows) =>
      val buckets = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val (nb, mx) = (buckets.size.toLong, buckets.values.max)
      assert(got(t.toLong) === ((nb, nVecs, mx, mx * nb * 10000L / nVecs)), s"table $t")
    }
  }

  test("embedding dedup groups equal union-find over cosine pairs") {
    import graft.operators.NearDup
    val got = NearDup.embDedupGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = NearDup.embCosineDedup(spark, sf).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]().withDefault(identity)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = got.keySet.groupBy(find)
    members.foreach { case (_, ids) =>
      // every member of a computed component carries the same label =
      // the component's min id
      assert(ids.map(got).size === 1 && got(ids.head) === ids.min, s"component of ${ids.head}")
    }
  }

  test("semantic groups refine exact groups; in-cluster edge recall measured") {
    import graft.operators.{Ann, NearDup}
    // the verify step is the exact cosine, so the in-cluster edge
    // set can only MISS exact edges (cluster-boundary splits), never
    // invent them
    val exact = NearDup.embCosineDedup(spark, sf).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Ann.embSemanticPairs(spark, sf).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact))
    val recall = if (exact.isEmpty) 1.0 else sem.size.toDouble / exact.size
    info(f"semantic edge recall vs exact: ${sem.size}/${exact.size} = $recall%.3f")
    // the multi-assign lever strictly widens the candidate set (the
    // nprobe=1 cell is always among the nprobe=2 cells) and must
    // raise recall on this corpus, where threshold-0.4 edges sit at
    // the isotropic sim tail and often straddle cells
    val sem2 = Ann.embSemanticPairs(spark, sf, nprobe = 2)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(sem2) && sem2.subsetOf(exact))
    info(f"nprobe=2 edge recall: ${sem2.size}/${exact.size} = ${sem2.size.toDouble / exact.size}%.3f")
    assert(sem2.size > sem.size)
    // fewer edges => a refinement: every semantic group sits INSIDE
    // one exact group (members never straddle two exact components)
    val exactG = NearDup.embDedupGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val semG = Ann.embSemanticGroups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(semG.map(_._1).toSet === exactG.keySet)
    semG.groupBy(_._2).foreach { case (g, members) =>
      assert(members.map(m => exactG(m._1)).toSet.size === 1,
        s"semantic group $g straddles exact groups")
    }
  }

  test("temperature mixture flattens shares and honors its caps") {
    import graft.operators.Sampling
    val rows = Sampling.docsMixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val totToks = rows.map(_._3).sum
    val budget = totToks / 2
    // w = floor(sqrt(tokens)); planned never exceeds the source's own
    // mass (no upsampling) nor, in total, the budget; kept <= mass
    rows.foreach { case (_, _, t, w, p, _, k) =>
      assert(w === math.sqrt(t.toDouble).floor.toLong)
      assert(p <= t && k <= t)
    }
    assert(rows.map(_._5).sum <= budget)
    // tau < 1 flattens by construction: sqrt-weights give the
    // smallest source at least its raw share of the budget and the
    // largest at most — up to the STRUCTURAL slack, not a float
    // epsilon: planned = floor(budget·w/W) is off by < 1/budget
    // relative, and w = floor(sqrt(tokens)) perturbs the weight
    // share w/W by < (1/w + n/W) relative. A 1e-9 tolerance only
    // held because the fixture's sqrt-share margin dwarfs the floor
    // slack; near-uniform source mixes would trip it spuriously.
    val W = rows.map(_._4).sum.toDouble
    def slack(w: Long): Double =
      1.0 / budget + 1.0 / math.max(w, 1L) + rows.size / W
    val smallest = rows.minBy(_._3)
    val largest = rows.maxBy(_._3)
    assert(smallest._5.toDouble / budget >=
      smallest._3.toDouble / totToks - slack(smallest._4))
    assert(largest._5.toDouble / budget <=
      largest._3.toDouble / totToks + slack(largest._4))
    info(f"raw share vs planned-of-budget: smallest ${smallest._3.toDouble / totToks}%.4f -> " +
      f"${smallest._5.toDouble / budget}%.4f, largest ${largest._3.toDouble / totToks}%.4f -> " +
      f"${largest._5.toDouble / budget}%.4f")
  }

  test("folded-centroid assignment equals the literal rendering (quantizer + semantic pairs)") {
    import graft.operators.Ann
    // same K through both renderings: the literal path inlines K
    // struct expressions, the fold path broadcasts the centroid
    // array and scores via a HOF — scores and (s, cid) tie
    // semantics must be bit-identical (auto-K relies on the fold
    // past literalKMax, where the literal plan stops compiling)
    def pairs() = Ann.embSemanticPairs(spark, sf, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lit = pairs()
    // force the fold path (also inside Lloyd); scoped restore
    Ann.withLiteralKMax(0) {
      assert(pairs() === lit)
    }
    assert(lit.nonEmpty)
  }

  test("routed two-level assignment: exhaustive gprobe equals flat; agreement monotone in gprobe") {
    import graft.operators.Ann
    // K forced well past the routing payoff point and through the
    // fold path (the auto-K regime routing exists for); G = ceil(√K)
    val k = 32
    Ann.withLiteralKMax(0) {
      def flat = Ann.embSemanticPairs(spark, sf, clusters = k, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      def routed(gp: Int) = Ann.embSemanticPairsRouted(
          spark, sf, clusters = k, nprobe = 2, gprobe = gp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // gprobe ≥ G: every cell is a candidate, member scores and
      // (s, cid) tie semantics are bit-identical → EXACT equality
      val f = flat
      assert(routed(k) === f)
      assert(f.nonEmpty)
      // sub-exhaustive probing: agreement with the flat argmax cell
      // is the probed-set indicator, monotone in gprobe
      val e = Ann.semanticFrame(spark, sf)
      val exact = Ann.semanticAssignmentsFull(e, k, iters = 1, nprobe = 1)
        .select("vec_id", "cid").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      def agree(gp: Int): Int = {
        val cs = Ann.semanticAssignmentsRoutedFull(
            e, Ann.trainedCentroidsForTest(spark, sf, k), nprobe = 1, gprobe = gp)
          .select("vec_id", "cid").collect()
          .map(r => (r.getLong(0), r.getInt(1)))
        cs.count { case (v, c) => exact(v) == c }
      }
      val a1 = agree(1); val a2 = agree(2); val aAll = agree(k)
      info(s"routed/flat cell agreement over ${exact.size}: gprobe1=$a1 gprobe2=$a2 exhaustive=$aAll")
      assert(a1 <= a2 && a2 <= aAll && aAll == exact.size)
      // downstream safety at any gprobe: verified pairs are exact-
      // cosine checked, so routed pairs never leave the exact set
      val exactPairs = graft.operators.NearDup.embCosineDedup(spark, sf)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(routed(1).map(t => (t._1, t._2)).subsetOf(exactPairs))
    }
  }

  test("routed assignment with sample-trained centroids keeps the refinement invariant") {
    import graft.operators.{Ann, NearDup}
    // sampled training changes the MODEL (different centroids than
    // the full-corpus Lloyd pass) but not the safety story: the
    // exact-cosine verify bounds pairs by the exact edge set
    val exact = NearDup.embCosineDedup(spark, sf).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Ann.embSemanticPairsRouted(spark, sf, gprobe = 2,
        trainSampleTarget = 512L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact))
    assert(sem.nonEmpty)
    info(f"sample-trained routed edge recall vs exact: ${sem.size}/${exact.size}")
  }

  test("graph-beam search: universe/rank invariants + monotone rounds lever") {
    import graft.operators.Ann
    // the search's world is the sampled node set (= the graph's own
    // source nodes): every answer lives there, the query itself
    // never appears, ranks are dense 1..k with non-increasing sims
    val nodes = Ann.embKnnGraph(spark, sf).select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val res = Ann.annGraphSearch(spark, sf).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(nodes.contains(r.getLong(2)), s"answer ${r.getLong(2)} outside the sampled universe")
      assert(r.getLong(2) != r.getLong(0), "query returned as its own neighbor")
    }
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val sims = sorted.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // extra rounds continue the SAME deterministic trajectory, so
    // visited only grows; and a growing visited set can never lose a
    // match (a displaced node is displaced by a higher-sim node,
    // which then matches the exact top-k whenever the displaced one
    // did) — so total matches are structurally monotone in rounds
    def matches(rounds: Int, beam: Int = 4): Long =
      Ann.annRecallGraph(spark, sf, rounds = rounds, beam = beam)
        .agg(sum("n_match")).collect()(0).getLong(0)
    val r1 = matches(1); val r3 = matches(3); val r5 = matches(5)
    info(s"graph recall matches at beam=4: rounds1=$r1 rounds3=$r3 rounds5=$r5 (beam8/r5=${matches(5, 8)})")
    assert(r1 <= r3 && r3 <= r5)
  }

  test("dedup audit family through the shared pair seam equals recompute") {
    import graft.operators.NearDup
    val (venn, sizes, keep) = NearDup.dedupAuditFamily(spark, sf)
    def key(r: org.apache.spark.sql.Row) = r.toSeq.map(String.valueOf).mkString("|")
    assert(venn.collect().map(key).sorted.toSeq ===
      NearDup.docsDetectorVenn(spark, sf).collect().map(key).sorted.toSeq)
    assert(sizes.collect().map(key).sorted.toSeq ===
      NearDup.docsGroupSizes(spark, sf).collect().map(key).sorted.toSeq)
    assert(keep.collect().map(key).sorted.toSeq ===
      NearDup.dedupKeep(spark, sf).collect().map(key).sorted.toSeq)
    // the storage-handoff variant writes its edge/group artifacts to
    // parquet and yields the identical family outputs
    val dir = java.nio.file.Files.createTempDirectory("graft_fam_").toString
    try {
      val (v2, s2, k2) = NearDup.dedupAuditFamily(spark, sf,
        checkpointDir = Some(dir))
      assert(v2.collect().map(key).sorted.toSeq === venn.collect().map(key).sorted.toSeq)
      assert(s2.collect().map(key).sorted.toSeq === sizes.collect().map(key).sorted.toSeq)
      assert(k2.collect().map(key).sorted.toSeq === keep.collect().map(key).sorted.toSeq)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/jaccard_pairs")))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/groups")))
    } finally {
      TestSpark.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("merged interval spans cover events and never overlap") {
    import graft.operators.Relational
    val spans = Relational.qMergeIntervals(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_millis(ts)")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    spans.groupBy(_._1).foreach { case (t, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length).toArray.toSeq) // dense span ids
      sorted.foreach { case (_, _, s0, s1, _) => assert(s1 >= s0 + 1800000L) }
      // spans are disjoint with real gaps between them
      sorted.toList.sliding(2).foreach {
        case List(a, b) => assert(b._3 > a._4, s"type $t spans touch")
        case _ =>
      }
      // every event of the type falls inside exactly one span, and
      // per-span event counts add up to the type's event count
      val evs = ev.filter(_._1 == t).map(_._2)
      evs.foreach(e => assert(sorted.count(s => e >= s._3 && e + 1800000L <= s._4) === 1))
      assert(sorted.map(_._5).sum === evs.length.toLong)
    }
  }

  test("distinct rollup marginals equal direct distinct counts") {
    import graft.operators.Relational
    val got = Relational.qDistinctRollup(spark, sf).collect()
      .map(r => ((if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_millis(ts) div 86400000"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = ev.groupBy(_._1).map { case (t, rs) =>
      (t, -1L) -> (rs.map(_._3).distinct.length.toLong, rs.length.toLong) }
    val byDay = ev.groupBy(_._2).map { case (d, rs) =>
      (null, d) -> (rs.map(_._3).distinct.length.toLong, rs.length.toLong) }
    val totalKey: (String, Long) = (null, -1L)
    val expect = byType ++ byDay +
      (totalKey -> ((ev.map(_._3).distinct.length.toLong, ev.length.toLong)))
    assert(got === expect) // exactly the three marginal sets, no pairwise cells
  }

  test("charclass counts partition every document's characters") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.textCharClass(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size === docs.length)
    docs.foreach { case (id, t) =>
      val alpha = t.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')).toLong
      val digit = t.count(c => c >= '0' && c <= '9').toLong
      val space = t.count(_ == ' ').toLong
      assert(got(id) === ((t.length.toLong, alpha, digit, space,
        t.length - alpha - digit - space)), s"doc $id")
    }
  }

  test("nearest join picks the closer side with before-tie and null edges") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (2L, 50L, 12L), (3L, 7L, 13L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 90L, 20L), (1L, 200L, 21L), (1L, 210L, 22L), (2L, 55L, 23L))
      .toDF("k", "t", "rid")
    val got = AsOfJoin.asOfNearest(left, right, "k", "t", "lid", "rid").collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) "" else r.getString(5)))).toMap
    // lid 10 (t=100): prev 90 (gap 10) vs next 200 (gap 100) -> before
    // lid 11 (t=205): prev 200 (gap 5) vs next 210 (gap 5) -> tie -> before
    // lid 12 (t=50): no prev, next 55 -> after
    // lid 13 (k=3): no right rows -> null
    assert(got === Map(10L -> ((20L, "before")), 11L -> ((21L, "before")),
      12L -> ((23L, "after")), 13L -> ((-1L, ""))))
  }

  test("changepoint split maximizes the exact prefix-mean deviation") {
    import graft.operators.Relational
    val got = Relational.qChangepoint(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.sortBy(_._2)
      val m = xs.length.toLong
      val s = xs.map(_._3).sum
      val scores = xs.zipWithIndex.init.map { case ((_, day, _), i) =>
        val sk = xs.take(i + 1).map(_._3).sum
        (day, math.abs(m * sk - (i + 1) * s))
      }
      val peak = scores.map(_._2).max
      val splitDay = scores.filter(_._2 == peak).map(_._1).min
      assert(got(t) === ((splitDay, peak, m)), s"type $t")
    }
  }

  test("having join keeps exactly the orders clearing the quantity bar") {
    import graft.operators.Relational
    val got = Relational.qHavingJoin(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))).toMap
    val qty = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val names = Tables.customer(spark, sf).select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = orders.filter(o => qty.getOrElse(o._1, 0L) > 200L)
      .map(o => o._1 -> ((o._2, names(o._2), math.round(o._3 * 100), qty(o._1)))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("merged incremental states equal the flat aggregate, any split") {
    import graft.operators.IncrementalAgg
    val ev = Tables.events(spark, sf)
    val flat = IncrementalAgg.aggState(ev).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // three-way split by event_id residue — merge must not care how
    // many or how uneven the increments are
    val parts = (0 until 3).map(i => ev.filter(pmod(col("event_id"), lit(3)) === i))
    val merged = IncrementalAgg.mergeStates(parts.map(IncrementalAgg.aggState))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged === flat)
    // the contract query's derived avg divides the merged sums
    val q = IncrementalAgg.qIncrAgg(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    flat.foreach { case (t, (n, s, mn, mx)) =>
      assert(q(t) === ((n, s, mn, mx, s * 100 / n)), s"type $t")
    }
  }

  test("count-min estimates are one-sided and eps-bounded on real keys") {
    import graft.operators.Cms
    val ev = Tables.events(spark, sf)
    val cms = Cms.sketch(ev, "user_id")
    val truth = ev.groupBy("user_id").agg(count(lit(1))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = truth.map(_._2).sum
    val est = Cms.estimates(cms, truth.map(_._1))
    val slack = math.max(1L, math.ceil(0.001 * n).toLong)
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"CMS undercounted key $k") // never undercounts
      assert(est(k) <= c + slack, s"key $k: est ${est(k)} vs true $c + eps*N $slack")
    }
    // a key never inserted can only collide up to the same slack
    assert(est.getOrElse(-1L, cms.estimateCount(Long.box(-999999L))) <= slack)
  }

  test("trigram paths extend the transition matrix consistently") {
    import graft.operators.Relational
    val tri = Relational.qPathTrigrams(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    // replay by hand over per-user ordered timelines
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).values.flatMap { tl =>
      tl.sortBy(e => (e._4, e._2)).map(_._3).toList.sliding(3).collect {
        case List(a, b, c) => (a, b, c)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(tri === expect)
    // marginalizing the first step recovers the bigram counts for
    // every user with >= 3 events chains (cross-check vs transitions
    // restricted to the same support): total trigrams = total events
    // - users with >= 1 event counted twice... simplest invariant:
    val nUsersWith2 = ev.groupBy(_._1).count(_._2.length >= 2)
    assert(tri.values.sum === ev.length - ev.groupBy(_._1).size - nUsersWith2)
  }

  test("adc recall agrees with a direct exact-vs-adc comparison") {
    import graft.operators.Ann
    val got = Ann.annRecallAdc(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val exact = Ann.annBruteForce(spark, sf, nQueries = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val adc = Ann.embAdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    exact.groupBy(_._1).foreach { case (q, rows) =>
      val matches = rows.count(r => adc.contains((q, r._2))).toLong
      assert(got(q) === ((matches, matches / 5.0)), s"query $q")
    }
    assert(got.size === 5)
  }

  test("winsorized mean clamps exactly at the discrete percentile bounds") {
    import graft.operators.Relational
    val got = Relational.qWinsorize(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length.toLong
      def pick(q: Int) = sorted(((n * q + 99) / 100).toInt - 1)
      val (p05, p95) = (pick(5), pick(95))
      val raw = sorted.sum * 100 / n
      val wins = sorted.map(c => math.min(math.max(c, p05), p95)).sum * 100 / n
      assert(got(t) === ((n, p05, p95, raw, wins)), s"type $t")
      assert(wins != raw || p05 == sorted.min && p95 == sorted.max, s"type $t: clamp did nothing")
    }
  }

  test("cohort ltv reconciles with retention-style replay") {
    import graft.operators.Relational
    val got = Relational.qCohortLtv(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts) div 604800000"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val cohortOf = ev.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val purch = ev.filter(_._2 == "purchase")
    got.groupBy(_._1._1).foreach { case (cwk, cells) =>
      var cum = 0L
      cells.sortBy(_._1._2).foreach { case ((_, age), (size, buyers, spend, cumGot, ltv)) =>
        val ps = purch.filter(p => cohortOf(p._1) == cwk && p._3 - cwk == age)
        assert(size === sizes(cwk))
        assert(buyers === ps.map(_._1).distinct.length.toLong)
        assert(spend === ps.map(_._4).sum)
        cum += spend
        assert(cumGot === cum && ltv === cum * 100 / size, s"cohort $cwk age $age")
      }
    }
    assert(got.nonEmpty)
  }

  test("minhash calibration buckets reconcile with the estimator pairs") {
    import graft.operators.NearDup
    val got = NearDup.minhashCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val est = NearDup.minhashEstimate(spark, sf).collect()
      .map(r => (r.getLong(5), r.getLong(6))) // (jacc_e4, est_e4)
    assert(est.nonEmpty)
    val expect = est.groupBy(_._2 / 1000).map { case (b, rows) =>
      val js = rows.map(_._1)
      b -> ((rows.length.toLong, js.sum / rows.length, js.min, js.max))
    }
    assert(got === expect)
  }

  test("mad equals the hand-computed nested discrete medians") {
    import graft.operators.Relational
    val got = Relational.qMad(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val n = rows.length.toLong
      def medBy(xs: Seq[(Long, Long)]): Long = // (sortVal, id) -> rank ceil(n/2)
        xs.sortBy(x => (x._1, x._2)).apply(((n * 50 + 99) / 100).toInt - 1)._1
      val med = medBy(rows.map(r => (r._3, r._2)).toSeq)
      val mad = medBy(rows.map(r => (math.abs(r._3 - med): Long, r._2)).toSeq)
      assert(got(t) === ((n, med, mad)), s"type $t")
    }
  }

  test("router assigns the same best cell as IVF and orders margins sanely") {
    import graft.operators.Ann
    val got = Ann.embRouter(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.length === Tables.embeddings(spark, sf).count().toInt)
    got.foreach { case (v, (c1, c2, margin)) =>
      assert(c1 != c2 && margin >= 0L, s"vec $v: degenerate top-2")
      assert(c1 >= 0 && c1 < 16 && c2 >= 0 && c2 < 16)
    }
    // the best cell must agree with the nearest-centroid rule the IVF
    // path uses: vectors that seed a centroid keep high self-affinity
    // (not exact identity after the Lloyd pass, but margins exist)
    assert(got.map(_._2._3).distinct.length > 1, "margins are all identical")
  }

  test("mrl recall compares truncated-prefix retrieval to the full rank") {
    import graft.operators.Ann
    val got = Ann.annRecallMrl(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    // brute-force replay on collected vectors (prefix-16 cosine)
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def topk(dims: Int, q: Long): Set[Long] = {
      val qv = vecs.find(_._1 == q).get._2
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        (0 until dims).foreach { i =>
          d += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        }
        d / math.sqrt(na * nb)
      }
      vecs.filter(_._1 != q).map(v => (cos(qv, v._2), v._1))
        .sortBy(x => (-x._1, x._2)).take(5).map(_._2).toSet
    }
    (0L until 10L).foreach { q =>
      val matches = (topk(64, q) intersect topk(16, q)).size.toLong
      assert(got(q) === ((matches, matches / 5.0)), s"query $q")
    }
  }

  test("forward fill carries the last observed bucket into every gap") {
    import graft.operators.Relational
    val rows = Relational.qGapFfill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (t, ts) =>
      var carry: Option[Long] = None
      ts.sortBy(_._2).foreach { case (_, b, n, v, f, gap) =>
        assert(gap === (n == 0L) && v.isDefined === !gap, s"type $t bucket $b flags")
        if (v.isDefined) carry = v
        assert(f === carry, s"type $t bucket $b ffill") // carry == last observed
      }
      assert(ts.exists(_._6), s"type $t: no gaps exercised") // grid has real gaps
    }
  }

  test("golden record picks each field from its latest qualifying event") {
    import graft.operators.Relational
    val got = Relational.qGoldenRecord(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")),
        expr("CAST(round(value * 100) AS BIGINT)"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.size === ev.map(_._1).distinct.length)
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val tl = rows.sortBy(e => (e._4, e._2))
      def lastOf[T](p: ((Long, Long, String, Long, Long, Long)) => Boolean,
                    f: ((Long, Long, String, Long, Long, Long)) => T): Option[T] =
        tl.filter(p).lastOption.map(f)
      assert(got(u) === ((tl.length.toLong, tl.last._3,
        lastOf(_._3 == "purchase", _._5), lastOf(_._3 == "error", _._4),
        lastOf(_._3 == "click", _._6))), s"user $u")
    }
  }

  test("langid margin is consistent with the langid prediction") {
    import graft.operators.TextAnalysis
    val margin = TextAnalysis.textLangIdMargin(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), Seq(r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)), r.getLong(6), r.getBoolean(7)))).toMap
    val pred = TextAnalysis.textLangId(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(margin.keySet === pred.keySet)
    margin.foreach { case (id, (p, scores, m, cjk)) =>
      assert(p === pred(id), s"doc $id prediction drifted from text_langid")
      val sorted = scores.sorted.reverse
      assert(m === sorted.head - sorted(1) && m >= 0, s"doc $id margin")
      // a non-cjk winner's score is the max score
      if (!cjk) {
        val winnerScore = p match {
          case "en" => scores(0); case "de" => scores(1)
          case "es" => scores(2); case "fr" => scores(3)
        }
        assert(winnerScore === sorted.head, s"doc $id winner not max")
      }
    }
  }

  test("shingle df profile accounts for every posting") {
    import graft.operators.NearDup
    val got = NearDup.docsDfProfile(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // replay from raw shingles
    val dfs = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.functions.TextFunctions
        .wordShingles(col("text"), NearDup.SHINGLE_K)).as("s"))
      .groupBy("s").agg(count(lit(1))).collect().map(_.getLong(1))
    val expect = dfs.groupBy(d => java.lang.Long.toBinaryString(d).length.toLong)
      .map { case (b, ds) => b -> ((ds.length.toLong, ds.sum, ds.max)) }
    assert(got === expect)
    // posting mass reconciles with the exploded shingle count
    assert(got.values.map(_._2).sum === dfs.sum)
  }

  test("conversion latency percentiles replay from the attribution rows") {
    import graft.operators.Relational
    val got = Relational.qConversionLatency(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // reuse the attribution operator as the independent source of
    // (src_type, gap_ms) — its own spec already proves it vs replay
    val attr = Relational.qAttribution(spark, sf).collect()
      .filter(r => !r.isNullAt(3) && r.getBoolean(5))
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    assert(attr.nonEmpty)
    attr.groupBy(_._2).foreach { case (st, rows) =>
      val n = rows.length.toLong
      val sorted = rows.map(r => (r._3, r._1)).sortBy(identity).map(_._1)
      def pick(q: Int) = sorted(((n * q + 99) / 100).toInt - 1)
      assert(got(st) === ((n, pick(10), pick(50), pick(90))), s"src $st")
    }
    assert(got.keySet === attr.map(_._2).toSet)
  }

  test("pii scrub: planted docs count 1 email/phone/ip, others are pii-free") {
    val rows = TextAnalysis.piiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nEmail, nPhone, nIp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      if (id % 3 == 0) {
        assert((nEmail, nPhone, nIp) === ((1L, 1L, 1L)), s"doc $id")
        // redaction replaces, never grows: tags are shorter than the
        // shortest plantable match of each class
        assert(r.getLong(5) > r.getLong(6), s"doc $id len_raw <= len_scrubbed")
      } else {
        assert((nEmail, nPhone, nIp) === ((0L, 0L, 0L)), s"doc $id")
        assert(r.getLong(5) === r.getLong(6), s"doc $id scrub changed clean text")
      }
    }
    // blocklist terms do occur in the corpus — the counter is live
    assert(rows.map(_.getLong(4)).sum > 0)
  }

  test("pii quality gate: default-off parity, raw corpus passes the gate") {
    val base = TextAnalysis.docsQualityFilter(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
    val gated = TextAnalysis.docsQualityFilterPii(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(r.fieldIndex("keep")),
        r.getBoolean(r.fieldIndex("flag_pii"))))
    // the raw synthetic corpus has no PII, so the gate is a no-op on
    // it — keep decisions must match the ungated filter exactly
    assert(gated.forall(!_._3))
    assert(gated.map(g => g._1 -> g._2).toMap === base)
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has a DuckDB oracle (no rows-only gaps)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("kmeans trainer: clusters partition the vectors, 64 grid dims per survivor") {
    val out = SparkEntry.queries("emb_kmeans_train")(spark, sf).collect()
    val byCid = out.groupBy(_.getAs[Long]("cid"))
    // every surviving cluster reports exactly the 64 grid coordinates
    byCid.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq === (1L to 64L))
      assert(rows.map(_.getAs[Long]("n")).distinct.length === 1)
    }
    // cluster sizes partition the vector set
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(byCid.values.map(_.head.getAs[Long]("n")).sum === nVecs)
    // trained centroids stay on the quantized grid's value range
    out.foreach(r => assert(math.abs(r.getAs[Long]("m")) <= 2000))
  }

  test("gopher rules: pass is the conjunction, counters are consistent") {
    SparkEntry.queries("docs_gopher_rules")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_alpha_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_stop_distinct") <= 5)
      val conj = Seq("flag_words", "flag_mwl", "flag_symbol", "flag_alpha", "flag_stop")
        .forall(r.getAs[Boolean])
      assert(r.getAs[Boolean]("pass") === conj)
    }
  }

  test("dup spans: reported spans replay exactly against the raw texts") {
    val texts = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ")).toMap
    val spans = SparkEntry.queries("docs_dup_spans")(spark, sf).collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      val len = r.getAs[Long]("longest_tokens").toInt
      val (as, bs) = (r.getAs[Long]("a_start").toInt, r.getAs[Long]("b_start").toInt)
      assert(r.getAs[Long]("longest_tokens") === r.getAs[Long]("longest_run") + 4)
      // the claimed span is genuinely shared, token for token
      assert(texts(a).slice(as, as + len).toSeq === texts(b).slice(bs, bs + len).toSeq,
        s"span mismatch for pair ($a, $b)")
    }
  }

  test("graph rank: teleport floor, mass bound, in-degrees sum to the edge count") {
    val rows = SparkEntry.queries("emb_graph_rank")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    rows.foreach { r =>
      // every node keeps at least the teleport mass and can never
      // exceed teleport + damped total (floors only shed mass)
      val m = r.getAs[Long]("mass")
      assert(m >= 150000L && m <= 150000L + (850000L * n))
    }
    // kNN construction: out-degree is exactly k for every node
    assert(rows.map(_.getAs[Long]("in_deg")).sum === 3 * n)
    // total mass never grows above the initial pool (floors shed)
    assert(rows.map(_.getAs[Long]("mass")).sum <= 1000000L * n)
  }

  test("audio segments: active runs replay against frame energies") {
    import org.apache.spark.sql.functions.col
    val segs = SparkEntry.queries("mm_audio_segments")(spark, sf).collect()
    assert(segs.nonEmpty)
    val active = graft.operators.Multimodal
      .frameEnergy(graft.operators.Multimodal.mediaFromDocuments(spark, sf)).toDF()
      .filter(col("energy") > col("n_samples").cast("long") * 2048)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"))).toSet
    // segments cover exactly the active frames, contiguously
    val covered = segs.flatMap { s =>
      val (d, st, n) = (s.getAs[Long]("doc_id"),
        s.getAs[Int]("start_frame"), s.getAs[Long]("n_frames").toInt)
      (st until st + n).map(d -> _)
    }.toSet
    assert(covered === active)
    // maximality: the frame before each segment start is inactive
    segs.foreach { s =>
      val (d, st) = (s.getAs[Long]("doc_id"), s.getAs[Int]("start_frame"))
      assert(st == 0 || !active(d -> (st - 1)))
    }
  }

  test("mm detector venn: exact-copy items are always phash-caught") {
    val cells = SparkEntry.queries("mm_detector_venn")(spark, sf).collect()
      .map(r => (r.getAs[Boolean]("f_exact"), r.getAs[Boolean]("f_phash")) ->
        r.getAs[Long]("n_docs")).toMap
    // byte-identical payloads have phash distance 0 — banding is
    // pigeonhole-complete for d <= 3, so (exact, not-phash) is empty
    assert(!cells.contains((true, false)))
    // the planting guarantees both detectors fire somewhere
    assert(cells.getOrElse((true, true), 0L) > 0)
    assert(cells.keys.exists(_._2))
  }

  test("vocab coverage: monotone in k, bounded by the corpus total") {
    val rows = SparkEntry.queries("text_vocab_coverage")(spark, sf)
      .collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(10L, 100L, 1000L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vocab") <= r.getAs[Long]("k"))
      assert(r.getAs[Long]("coverage_tokens") <= r.getAs[Long]("total_tokens"))
    }
    val shares = rows.map(_.getAs[Long]("share_e4"))
    assert(shares.zip(shares.tail).forall { case (lo, hi) => lo <= hi })
    assert(shares.forall(s => s >= 0 && s <= 10000))
  }

  test("tpch wave invariants: custdist partitions customers, shares bounded, pairs directional") {
    // Q13: the count distribution partitions the customer relation
    val cd = SparkEntry.queries("q13_custdist")(spark, sf).collect()
    assert(cd.map(_.getAs[Long]("custdist")).sum === Tables.customer(spark, sf).count())
    // Q14/Q8: shares are exact floors inside [0, 10000], numerators bounded
    val q14 = SparkEntry.queries("q14_promo")(spark, sf).head()
    assert(q14.getAs[Long]("promo_cents") <= q14.getAs[Long]("total_cents"))
    val s14 = q14.getAs[Long]("promo_share_e4")
    assert(s14 >= 0 && s14 <= 10000)
    SparkEntry.queries("q8_share")(spark, sf).collect().foreach { r =>
      val s = r.getAs[Long]("share_e4")
      assert(s >= 0 && s <= 10000)
      assert(r.getAs[Long]("nation_cents") <= r.getAs[Long]("total_cents"))
    }
    // Q7: only the two configured trade directions appear
    SparkEntry.queries("q7_volume")(spark, sf).collect().foreach { r =>
      assert(Set((1L, 2L), (2L, 1L))((r.getAs[Long]("supp_nat"), r.getAs[Long]("cust_nat"))))
    }
    // Q22: dormant above-average customers are a subset of the
    // above-average customers (dropping the anti-join only grows it)
    val q22 = SparkEntry.queries("q22_global")(spark, sf).collect()
      .map(_.getAs[Long]("numcust")).sum
    val aboveAvg = {
      import org.apache.spark.sql.functions._
      val c = Tables.customer(spark, sf)
        .select(expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      val Array(sum0, n0) = c.filter(col("cents") > 0)
        .agg(sum("cents"), count(lit(1))).head().toSeq.toArray.map(_.asInstanceOf[Long])
      c.filter(col("cents") * n0 > sum0).count()
    }
    assert(q22 <= aboveAvg)
  }

  test("bpe merge loop equals a driver-side greedy replay") {
    import graft.operators.TextAnalysis
    val words0 = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .map(_.toCharArray.map(_.toString).toVector).toSeq
    def pairCounts(ws: Seq[Vector[String]]): Map[(String, String), Long] = {
      val m = collection.mutable.Map.empty[(String, String), Long]
      ws.foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val k = (w(i), w(i + 1)); m(k) = m.getOrElse(k, 0L) + 1L
        }
      }
      m.toMap
    }
    // canonical greedy left-to-right merge — the semantics the
    // double-replace rendering must reproduce
    def mergeWord(w: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w(i) == l && w(i + 1) == r) { b += (l + r); i += 2 }
        else { b += w(i); i += 1 }
      }
      b.result()
    }
    var ws = words0
    val expect = (1 to 2).map { rnd =>
      val ((l, r), n) = pairCounts(ws).toSeq
        .minBy { case ((pl, pr), pn) => (-pn, pl, pr) }
      if (rnd < 2) ws = ws.map(w => mergeWord(w, l, r))
      (rnd.toLong, l, r, l + r, n)
    }
    val got = TextAnalysis.textBpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got === expect)

    // apply pass: per-doc BPE token counts equal a full greedy
    // replay with the same learned merges (chars merge-invariant)
    val perDoc = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(_.toCharArray.map(_.toString).toVector).toSeq)).toMap
    var docWords = perDoc
    expect.foreach { case (_, l, r, _, _) =>
      docWords = docWords.view.mapValues(_.map(w => mergeWord(w, l, r))).toMap
    }
    val gotApply = TextAnalysis.textBpeApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expApply = docWords.filter(_._2.nonEmpty).map { case (id, ws) =>
      id -> (ws.length.toLong, ws.map(_.map(_.length).sum).sum.toLong,
        ws.map(_.length).sum.toLong)
    }
    assert(gotApply === expApply)
  }

  test("many-round bpe trainer with checkpoint-every-N handoff equals the lazy chain at rounds=6") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_ckpt").toString
    try {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
      val lazyOut = rows(TextAnalysis.textBpeMerges(spark, sf, rounds = 6))
      val stored = rows(TextAnalysis.textBpeMerges(spark, sf, rounds = 6,
        checkpointDir = Some(dir), checkpointEvery = 2))
      assert(stored === lazyOut && stored.size === 6)
      // rounds really merged something distinct each time
      assert(stored.map(t => (t._2, t._3)).distinct.size === 6)
      // handoff artifacts on storage at rounds 2 and 4 (never the
      // final round — nothing is re-segmented after the last merge)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/round_2")))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/round_4")))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/round_6")))
    } finally TestSpark.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("farthest-point init equals a driver-side greedy replay") {
    import graft.operators.Ann
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(e => math.floor(e.toDouble * 1000.0).toLong).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector(vecs.head._1)
    val expect = collection.mutable.ArrayBuffer((1L, vecs.head._1, 0L))
    for (r <- 2 to 4) {
      val byId = vecs.toMap
      val (id, md) = vecs.map { case (id, xs) =>
        (id, chosen.map(c => d2(xs, byId(c))).min)
      }.minBy { case (id, md) => (-md, id) }
      expect += ((r.toLong, id, md))
      chosen :+= id
    }
    val got = Ann.embInitFarthest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === expect.toSeq)
  }

  test("farthest-point init with per-round parquet handoff equals the lazy rendering") {
    import graft.operators.Ann
    val dir = java.nio.file.Files.createTempDirectory("graft_init_ckpt").toString
    try {
      val lazyOut = Ann.embInitFarthest(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val stored = Ann.embInitFarthest(spark, sf, checkpointDir = Some(dir)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(stored === lazyOut && stored.size === 4)
      // the handoff artifacts really are on storage (restart seam)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/round_1")))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/round_4")))
    } finally TestSpark.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("approx column profile matches the exact twin within the rsd bound") {
    import graft.operators.Relational
    val exact = Relational.qColProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Relational.qColProfileApprox(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (c, (nr, nn, nd)) =>
      val (enr, enn, end) = exact(c)
      // rows + nulls stay exact — only the distinct count is sketched
      assert(nr === enr && nn === enn, s"$c: exact counters drifted")
      // HLL++ rsd=0.02: allow 5 sigma (same adjudication as the
      // sketch-profile contract)
      assert(math.abs(nd - end) <= math.max(2.0, end * 0.10),
        s"$c distinct: approx $nd vs exact $end")
    }
    // scale pin: the distinct really is the sketch (constant state,
    // map-side partial merge), not a fallback to exact expand-distinct
    val plan = Relational.qColProfileApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"),
      "approx profile plans no HLL sketch aggregate")
    assert(!plan.contains("count(distinct"),
      "approx profile fell back to exact distinct")
  }

  test("approx distinct rollup matches the exact marginals within the rsd bound") {
    import graft.operators.Relational
    def keyOf(r: org.apache.spark.sql.Row): (String, Long) =
      (if (r.isNullAt(0)) "<all>" else r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))
    val exact = Relational.qDistinctRollup(spark, sf).collect()
      .map(r => keyOf(r) -> (r.getLong(2), r.getLong(3))).toMap
    val approx = Relational.qDistinctRollupApprox(spark, sf).collect()
      .map(r => keyOf(r) -> (r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (users, events)) =>
      val (eu, ee) = exact(k)
      assert(events === ee, s"$k: exact event count drifted")
      assert(math.abs(users - eu) <= math.max(2.0, eu * 0.10),
        s"$k users: approx $users vs exact $eu")
    }
    val plan = Relational.qDistinctRollupApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct") && !plan.contains("count(distinct"),
      "approx rollup does not plan the sketch aggregate")
  }

  test("approx rolling DAU/WAU matches the exact twin within the sketch bound") {
    import graft.operators.Relational
    val exact = Relational.qRollingDau(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Relational.qRollingDauApprox(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical day axis: only days with activity, full trailing window
    assert(approx.keySet === exact.keySet && exact.nonEmpty)
    approx.foreach { case (day, (dau, wau)) =>
      val (ed, ew) = exact(day)
      // lgK=14 rsd ≈ 1.6%; 5-sigma-ish slack floored at 2 (the
      // profileApprox adjudication)
      assert(math.abs(dau - ed) <= math.max(2.0, ed * 0.10), s"day $day dau: $dau vs $ed")
      assert(math.abs(wau - ew) <= math.max(2.0, ew * 0.10), s"day $day wau: $wau vs $ew")
    }
    // scale pin: cardinalities come from mergeable HLL sketches — no
    // exact distinct (and so no (day, user) pair shuffle) anywhere.
    // (hll_sketch_agg itself sits behind the lazy checkpoint's RDD
    // scan boundary in this plan — the running-distinct spec pins it
    // on an uncheckpointed plan.)
    val plan = Relational.qRollingDauApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_union_agg") && plan.contains("hll_sketch_estimate"),
      "approx rolling reach does not plan the sketch merge")
    assert(!plan.toLowerCase.contains("count(distinct") && !plan.contains("Expand"),
      "approx rolling reach fell back to exact distinct")
  }

  test("approx running distinct reach matches the exact twin within the sketch bound") {
    import graft.operators.Relational
    val exact = Relational.qRunningDistinct(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Relational.qRunningDistinctApprox(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the approx axis is every ACTIVE day (the per-day sketch table);
    // the exact twin's decomposition only emits days contributing a
    // first-seen user — a strict subset
    assert(exact.keySet.subsetOf(approx.keySet) && exact.nonEmpty)
    // cumulative estimates carry the rsd contract; new_users is their
    // clamped difference (≥ 0 by construction)
    exact.foreach { case (day, (_, ecum)) =>
      val (nu, cum) = approx(day)
      assert(math.abs(cum - ecum) <= math.max(2.0, ecum * 0.10),
        s"day $day cum_users: $cum vs $ecum")
      assert(nu >= 0L, s"day $day new_users negative")
    }
    // approx total arrivals reconcile with the final cumulative reach
    val lastDay = approx.keySet.max
    assert(approx.values.map(_._1).sum >= approx(lastDay)._2 - 2,
      "summed new_users inconsistent with final reach")
    val plan = Relational.qRunningDistinctApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_sketch_agg") && plan.contains("hll_union_agg"),
      "approx running reach does not plan the sketch aggregates")
    assert(!plan.toLowerCase.contains("count(distinct"),
      "approx running reach fell back to exact distinct")
  }

  test("approx retention matrix matches the exact twin within the sketch bound") {
    import graft.operators.Relational
    def key(r: org.apache.spark.sql.Row) = (r.getDate(0).toString, r.getInt(1))
    val exact = Relational.qRetention(spark, sf).collect()
      .map(r => key(r) -> r.getLong(2)).toMap
    val approx = Relational.qRetentionApprox(spark, sf).collect()
      .map(r => key(r) -> r.getLong(2)).toMap
    // cohorts are exact (same first-seen min pass) → identical cells
    assert(approx.keySet === exact.keySet && exact.nonEmpty)
    approx.foreach { case (k, n) =>
      val en = exact(k)
      assert(math.abs(n - en) <= math.max(2.0, en * 0.10), s"cell $k: approx $n vs exact $en")
    }
    val plan = Relational.qRetentionApprox(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hll_sketch_agg"), "approx retention does not plan the sketch")
    assert(!plan.toLowerCase.contains("count(distinct") && !plan.contains("Expand"),
      "approx retention fell back to exact distinct")
  }

  test("two-phase exactly-k sample equals the single-pass rank on any partition layout") {
    import graft.operators.Sampling
    val expect = Sampling.docsSampleFixed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(expect.nonEmpty)
    // adversarial layouts: however rows are spread across input
    // partitions, the per-partition heaps + global refine must
    // reproduce the corpus-wide rank exactly
    Seq(1, 3, 7).foreach { parts =>
      val docs = Tables.documents(spark, sf).repartition(parts)
      val got = Sampling.docsSampleFixed2PhaseOn(docs).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expect, s"two-phase sample diverged at $parts partitions")
    }
    // the corpus-wide window is gone: ranking runs on the bounded
    // survivor set produced by the per-partition heap fold
    val plan = Sampling.docsSampleFixed2Phase(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      "two-phase sample lost its per-partition fold")
  }
}
