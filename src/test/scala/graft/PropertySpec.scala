package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, PipelineContext}
import graft.storage.{FileStaging, XlsxReader}

/** Randomized differentials over the primitives whose failure modes a
  * fixed fixture can miss: the binary XLSX parser (escaping, sparse
  * cells, type inference), the three exact-Jaccard paths (index /
  * prefix-filter vs an in-test brute force), and the component
  * fixpoint (vs union-find). Deterministic: ScalaCheck generators are
  * sampled from a fixed seed, so a failure reproduces. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** n deterministic samples of g (plain ScalaCheck, no runner). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // ---- xlsx round trip ----------------------------------------------------

  private sealed trait Cell
  private case class SCell(s: String) extends Cell
  private case class LCell(l: Long) extends Cell
  private case class DCell(d: Double) extends Cell

  private val cellGen: Gen[Option[Cell]] = Gen.frequency(
    2 -> Gen.const(None),
    3 -> Gen.oneOf(
      "plain", "with space", "a&b", "<tag>", "x>y", "\"quoted\"",
      "ünïcode", "tab\tchar", "0x10", "12a").map(s => Some(SCell(s))),
    3 -> Gen.chooseNum(-1000000L, 1000000L).map(l => Some(LCell(l))),
    2 -> Gen.chooseNum(-4000, 4000).map(i => Some(DCell(i / 4.0))))

  private val tableGen: Gen[(Int, Seq[Seq[Option[Cell]]])] = for {
    nCols <- Gen.chooseNum(1, 5)
    nRows <- Gen.chooseNum(1, 8)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, cellGen))
    // every column needs one non-null so the typing rule is exercised,
    // not the all-null fallback (that edge is pinned separately)
    patched = rows.zipWithIndex.map { case (r, i) =>
      r.zipWithIndex.map { case (c, j) =>
        if (i == j % nRows && c.isEmpty) Some(LCell(j.toLong)) else c } }
  } yield (nCols, patched)

  private def esc(s: String) =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def writeXlsx(path: String, nCols: Int, rows: Seq[Seq[Option[Cell]]]): Unit = {
    val header = (0 until nCols)
      .map(i => s"""<c t="inlineStr"><is><t>h$i</t></is></c>""").mkString
    val body = rows.zipWithIndex.map { case (r, ri) =>
      val cells = r.zipWithIndex.flatMap { case (c, ci) =>
        val ref = s"${('A' + ci).toChar}${ri + 2}"
        c.map {
          case SCell(s) => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
          case LCell(l) => s"""<c r="$ref"><v>$l</v></c>"""
          case DCell(d) => s"""<c r="$ref"><v>$d</v></c>"""
        }
      }.mkString
      s"""<row r="${ri + 2}">$cells</row>"""
    }.mkString
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        s"""<row r="1">$header</row>""" + body + "</sheetData></worksheet>"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(sheet.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  test("xlsx parser round-trips random tables: escaping, sparse cells, type inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-propxlsx")
    samples(tableGen, 12).zipWithIndex.foreach { case ((nCols, rows), k) =>
      val p = s"$dir/t$k.xlsx"
      writeXlsx(p, nCols, rows)
      val df = XlsxReader.read(spark, p)
      assert(df.columns.toSeq === (0 until nCols).map(i => s"h$i"))
      val got = df.collect()
      assert(got.length === rows.length, s"table $k row count")
      // expected per-column type under the reader's rule: all-long ->
      // long, else all-numeric -> double, else string
      val colIs: Int => Seq[Cell] = i => rows.flatMap(r => r(i))
      (0 until nCols).foreach { i =>
        val cells = colIs(i)
        val expType =
          if (cells.forall(_.isInstanceOf[LCell])) "bigint"
          else if (cells.forall(c => c.isInstanceOf[LCell] || c.isInstanceOf[DCell])) "double"
          else "string"
        assert(df.schema(i).dataType.simpleString === expType,
          s"table $k col $i: cells=$cells")
      }
      rows.zipWithIndex.foreach { case (r, ri) =>
        r.zipWithIndex.foreach { case (c, ci) =>
          val v = got(ri).get(ci)
          (c, v) match {
            case (None, null) => ()
            case (Some(SCell(s)), x) => assert(x === s, s"table $k [$ri,$ci]")
            case (Some(LCell(l)), x: java.lang.Long) => assert(x.longValue === l)
            case (Some(LCell(l)), x: java.lang.Double) => assert(x.doubleValue === l.toDouble)
            case (Some(LCell(l)), x: String) => assert(BigDecimal(x) === BigDecimal(l))
            case (Some(DCell(d)), x: java.lang.Double) => assert(x.doubleValue === d)
            case (Some(DCell(d)), x: String) => assert(x.toDouble === d)
            case other => fail(s"table $k [$ri,$ci]: unexpected $other")
          }
        }
      }
    }
  }

  test("xls writer/reader round-trips random tables through BIFF8 bytes") {
    import graft.storage.{BiffBytes, XlsReader}
    val dir = java.nio.file.Files.createTempDirectory("graft-propxls")
    samples(tableGen, 10).zipWithIndex.foreach { case ((nCols, rows0), k) =>
      // BIFF numbers arrive as rendered doubles, so a whole-valued
      // DCell would legitimately type as long — keep them fractional
      // so the expected-type rule matches the xlsx test's
      val rows = rows0.map(_.map {
        case Some(DCell(d)) if d == scala.math.rint(d) => Some(DCell(d + 0.25))
        case c => c
      })
      val header = BiffBytes.rowRec(0) ++ (0 until nCols).toArray
        .flatMap(i => BiffBytes.label(0, i, s"h$i"))
      val cells = rows.zipWithIndex.foldLeft(header) { case (acc, (r, ri)) =>
        acc ++ BiffBytes.rowRec(ri + 1) ++ r.zipWithIndex.toArray.flatMap {
          case (Some(SCell(s)), ci) => BiffBytes.label(ri + 1, ci, s)
          case (Some(LCell(l)), ci) => BiffBytes.number(ri + 1, ci, l.toDouble)
          case (Some(DCell(d)), ci) => BiffBytes.number(ri + 1, ci, d)
          case (None, _) => Array.empty[Byte]
        }
      }
      val p = s"$dir/t$k.xls"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        BiffBytes.cfbMini(BiffBytes.workbook(Array.empty[Byte], cells)))
      val df = XlsReader.read(spark, p)
      assert(df.columns.toSeq === (0 until nCols).map(i => s"h$i"))
      val got = df.collect()
      assert(got.length === rows.length, s"xls table $k row count")
      rows.zipWithIndex.foreach { case (r, ri) =>
        r.zipWithIndex.foreach { case (c, ci) =>
          val v = got(ri).get(ci)
          (c, v) match {
            case (None, null) => ()
            case (Some(SCell(s)), x) => assert(x === s, s"xls $k [$ri,$ci]")
            case (Some(LCell(l)), x: java.lang.Long) => assert(x.longValue === l)
            case (Some(LCell(l)), x: java.lang.Double) => assert(x.doubleValue === l.toDouble)
            case (Some(LCell(l)), x: String) => assert(BigDecimal(x) === BigDecimal(l))
            case (Some(DCell(d)), x: java.lang.Double) => assert(x.doubleValue === d)
            case (Some(DCell(d)), x: String) => assert(x.toDouble === d)
            case other => fail(s"xls $k [$ri,$ci]: unexpected $other")
          }
        }
      }
    }
  }

  // ---- jaccard triple equivalence ----------------------------------------

  private val vocab = Vector("ox", "ant", "bee", "cat", "dog", "elk", "fox", "gnu")
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(4, 10)
    docs <- Gen.listOfN(n, Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def bruteJaccard(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    def grams(s: String): Set[String] = {
      val w = s.trim.toLowerCase.split("\\s+").toSeq
      if (w.size < 2) Set.empty
      else w.sliding(2).map(_.mkString(" ")).toSet
    }
    val g = docs.map { case (id, s) => id -> grams(s) }.filter(_._2.nonEmpty)
    (for {
      (i, a) <- g; (j, b) <- g if i < j
      c = (a & b).size
      jac = c.toDouble / (a.size + b.size - c) if jac >= t
    } yield (i, j, BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  test("jaccardPairsExact and jaccardPairsPrefix match brute force on random corpora") {
    samples(corpusGen, 6).zipWithIndex.foreach { case (docs, k) =>
      val df = docs.toDF("doc_id", "text")
      for (t <- Seq(0.3, 0.6, 0.9)) {
        val expected = bruteJaccard(docs, t)
        def run(f: PipelineContext => org.apache.spark.sql.DataFrame) =
          PipelineContext.run { implicit ctx =>
            f(ctx).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet }
        val exact = run(implicit ctx =>
          Dedup.jaccardPairsExact(df, "doc_id", "text", Dedup.WordGrams(2), t))
        val prefix = run(implicit ctx =>
          Dedup.jaccardPairsPrefix(df, "doc_id", "text", Dedup.WordGrams(2), t))
        // a 4-candidate budget forces the gram postings into multiple
        // sequential blocks even on these tiny corpora — pins that the
        // segmented path reassembles identical pair counts
        val segmented = run(implicit ctx =>
          Dedup.jaccardPairsExact(df, "doc_id", "text", Dedup.WordGrams(2), t,
            maxCandidatesPerBlock = 4L))
        assert(exact === expected, s"corpus $k t=$t exact\ndocs=$docs")
        assert(prefix === expected, s"corpus $k t=$t prefix\ndocs=$docs")
        assert(segmented === expected, s"corpus $k t=$t segmented\ndocs=$docs")
      }
    }
  }

  // ---- components vs union-find ------------------------------------------

  private val edgesGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 14)
    m <- Gen.chooseNum(0, 20)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
    } yield (a.toLong, b.toLong))
  } yield es.filter { case (a, b) => a != b }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
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

  test("componentsOf matches union-find on random edge sets — BOTH routes (driver and distributed)") {
    // r18: componentsOf routes small edge sets to a driver-side
    // union-find; each random sample must match the reference under
    // BOTH the default (driver) route and the forced-distributed
    // pointer-jumping loop, which also pins the routes against each
    // other.
    val key = "spark.graft.components.maxDriverEdges"
    samples(edgesGen, 8).zipWithIndex.foreach { case (edges, k) =>
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        Seq("200000", "0").foreach { cap =>
          spark.conf.set(key, cap)
          try {
            val got = PipelineContext.run { implicit ctx =>
              Dedup.componentsOf(edges.toDF("id1", "id2"))
                .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap }
            assert(got === expected, s"edge set $k (maxDriverEdges=$cap): $edges")
          } finally spark.conf.unset(key)
        }
      }
    }
  }

  test("componentsOf driver route handles string ids like the distributed loop") {
    val edges = Seq(("b", "c"), ("a", "b"), ("x", "y"), ("m", "m"))
    val key = "spark.graft.components.maxDriverEdges"
    val routes = Seq("200000", "0").map { cap =>
      spark.conf.set(key, cap)
      try PipelineContext.run { implicit ctx =>
        Dedup.componentsOf(edges.toDF("id1", "id2"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      } finally spark.conf.unset(key)
    }
    assert(routes(0) === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "m" -> "m"))
    assert(routes(0) === routes(1))
  }

  // ---- round-8 selection/retrieval operators ------------------------------

  /** Small random corpora over a fixed vocabulary: enough repeated
    * words that tf/df/bigram statistics are non-trivial. */
  private val selVocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")
  private val docGen: Gen[String] =
    Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(selVocab)).map(_.mkString(" ")))

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopDocs matches a driver-side reference on random corpora") {
    samples(Gen.listOfN(12, docGen), 6).zipWithIndex.foreach { case (texts, it) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val queries = Seq((1L, texts.head.split(" ").take(2).mkString(" ")))
        .toDF("qid", "qtext")
      val got = PipelineContext.run { implicit ctx =>
        graft.operators.CurationPipeline.bm25TopDocs(
          docs, "id", "text", queries, "qid", "qtext", k = 5)
          .orderBy(col("rank")).collect()
          .map(r => (r.getLong(1), r.getDouble(2)))
      }
      // reference BM25 with the same ieee constant folds and rounding
      val toks = texts.map(_.split(" ").toSeq)
      val n = toks.length
      val avgdl = toks.map(_.length).sum.toDouble / n
      val qTerms = texts.head.split(" ").take(2).distinct.toSeq
      val scores = toks.zipWithIndex.flatMap { case (ws, id) =>
        val dl = ws.length
        val hit = qTerms.filter(ws.contains)
        if (hit.isEmpty) None
        else {
          val sc = hit.map { t =>
            val df = toks.count(_.contains(t))
            val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            val tf = ws.count(_ == t)
            idf * (tf * (1.2 + 1.0)) /
              (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
          }.sum
          Some(id.toLong -> r6(sc))
        }
      }
      val expect = scores.sortBy { case (id, sc) => (-sc, id) }.take(5)
      assert(got.map(_._1).toSeq === expect.map(_._1),
        s"iteration $it ranking mismatch")
      got.zip(expect).foreach { case ((_, g), (_, e)) =>
        assert(math.abs(g - e) < 2e-6, s"iteration $it score $g vs $e")
      }
    }
  }

  test("lmPerplexity matches a driver-side add-1 bigram reference on random corpora") {
    samples(Gen.listOfN(10, docGen), 6).zipWithIndex.foreach { case (texts, it) =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, i % 2 == 0) }.toDF("id", "text", "tgt")
      val got = PipelineContext.run { implicit ctx =>
        graft.operators.CurationPipeline.lmPerplexity(
          docs, "id", "text", col("tgt"))
          .orderBy(col("id")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
      val toks = texts.map(_.split(" ").toSeq)
      val tgt = toks.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
      val bigrams = (ws: Seq[String]) => ws.sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq
      val bc = tgt.flatMap(bigrams).groupBy(identity).map { case (k, v) => k -> v.size }
      val pc = bc.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
      val v = tgt.flatten.distinct.size
      got.foreach { case (id, nb, ppl) =>
        val bs = bigrams(toks(id.toInt))
        assert(nb === bs.length.toLong, s"iteration $it doc $id n_bigrams")
        val lp = bs.map { b =>
          math.log((bc.getOrElse(b, 0) + 1.0) / (pc.getOrElse(b._1, 0) + v))
        }.sum / bs.length
        assert(math.abs(ppl - math.exp(-lp)) < 1e-9,
          s"iteration $it doc $id ppl $ppl vs ${math.exp(-lp)}")
      }
    }
  }

  test("semanticDedup matches the greedy-exists rule on random unit vectors") {
    val vecGen: Gen[Array[Float]] =
      Gen.listOfN(4, Gen.chooseNum(-1.0, 1.0)).map(_.map(_.toFloat).toArray)
        .suchThat(v => v.exists(math.abs(_) > 0.05))
    samples(Gen.listOfN(24, vecGen), 4).zipWithIndex.foreach { case (vs, it) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val cents = df.filter(col("id") < 3)
      val got = PipelineContext.run { implicit ctx =>
        Dedup.semanticDedup(df, "id", "v", cents, "id", "v", minCosine = 0.8)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      }
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        r6(d / (math.sqrt(na) * math.sqrt(nb)))
      }
      // reference assignment: rounded argmax, smaller centroid wins ties
      val assign = vs.indices.map { i =>
        i.toLong -> (0 until 3).map(c => (c.toLong, cos(vs(i), vs(c))))
          .maxBy { case (c, s) => (s, -c) }._1
      }.toMap
      vs.indices.foreach { i =>
        val id = i.toLong
        assert(got(id)._1 === assign(id), s"iteration $it vec $id cluster")
        val dup = vs.indices.exists(o => o < i && assign(o.toLong) == assign(id)
          && cos(vs(o), vs(i)) >= 0.8)
        assert((got(id)._2 == 1L) === dup, s"iteration $it vec $id dup flag")
      }
    }
  }

  // ---- element mapping vs an independent reference fold -------------------

  private case class PAssoc(id: String, src: String, tgt: String,
      method: String, weight: Double, order: Double)

  private val mappingGen: Gen[(Seq[(String, String, Long, Double)], Seq[PAssoc])] =
    for {
      nElems <- Gen.chooseNum(2, 6)
      nFacts <- Gen.chooseNum(1, 30)
      facts <- Gen.listOfN(nFacts, for {
        e <- Gen.chooseNum(0, nElems - 1)
        ent <- Gen.oneOf("e1", "e2")
        per <- Gen.oneOf("2024-03-31", "2024-06-30")
        v <- Gen.chooseNum(-400, 400)
      } yield (ent, per, e.toLong, v / 4.0))
      nAssoc <- Gen.chooseNum(1, 8)
      // sources may repeat within a target (dict-overwrite semantics)
      // and may reference elements with no facts (skipped targets)
      assocs <- Gen.listOfN(nAssoc, for {
        src <- Gen.chooseNum(0, nElems) // nElems itself = factless
        tgt <- Gen.oneOf("t:A", "t:B", "t:C")
        m <- Gen.oneOf("sum", "average", "weighted_average",
          "first", "last", "calculated")
        w <- Gen.oneOf(0.0, 0.5, 1.0, 2.0)
        o <- Gen.chooseNum(1, 5)
      } yield PAssoc("", s"uri:$src", tgt, m, w, o.toDouble))
    } yield (facts, assocs.zipWithIndex.map { case (a, i) =>
      a.copy(id = s"a$i") })

  /** Plain-Scala replay of the documented ElementMapping semantics. */
  private def mappingReference(
      facts: Seq[(String, String, Long, Double)],
      assocs: Seq[PAssoc]): Map[(String, String, String), Double] = {
    val methodOf = assocs.groupBy(_.tgt).map { case (t, as) =>
      t -> as.minBy(a => (a.order, a.id)).method }
    // uri -> id resolution from the facts' own pairs, then per
    // (target, sourceId) dict-overwrite: last (order, id) weight wins,
    // smallest order keys the first/last ordering
    val uriToId = facts.map(f => s"uri:${f._3}" -> s"id:${f._3}").toMap
    val perSource: Map[String, Map[String, (Double, Double)]] =
      assocs.groupBy(_.tgt).map { case (t, as) =>
        t -> as.groupBy(a => uriToId.getOrElse(a.src, a.src)).map {
          case (sid, dup) =>
            sid -> (dup.maxBy(a => (a.order, a.id)).weight,
              dup.map(_.order).min)
        }
      }
    (for {
      (tgt, sources) <- perSource.toSeq
      method = methodOf(tgt)
      matched = facts.flatMap { case (ent, per, e, v) =>
        sources.get(s"id:$e").map { case (w, o) => (ent, per, e, v, w, o) }
      }
      ((ent, per), rows) <- matched.groupBy(r => (r._1, r._2)).toSeq
    } yield {
      val vs = rows.map(_._4)
      val value = method match {
        case "average" => vs.sum / vs.size
        case "weighted_average" =>
          val sw = rows.map(_._5).sum
          if (sw == 0.0) 0.0 else rows.map(r => r._4 * r._5).sum / sw
        case "first" => rows.minBy(r => (r._6, s"id:${r._3}", r._4))._4
        case "last" => rows.maxBy(r => (r._6, s"id:${r._3}", r._4))._4
        case _ => vs.sum // sum / calculated / unknown
      }
      (tgt, ent, per) -> value
    }).toMap
  }

  test("element mapping matches the independent reference fold on random structures") {
    import graft.views.ElementMapping
    samples(mappingGen, 25).zipWithIndex.foreach { case ((facts, assocs), i) =>
      val df = facts.toDF("entity_id", "period_end", "__e", "numeric_value")
        .withColumn("element_uri", concat(lit("uri:"), col("__e")))
        .withColumn("element_id", concat(lit("id:"), col("__e")))
        .drop("__e")
      val mapped = ElementMapping(df, assocs.map(a =>
        ElementMapping.Association(a.id, a.src, a.tgt, a.method, a.weight, a.order)))
      val want = mappingReference(facts, assocs)
      if (want.isEmpty) {
        // reference parity: zero matches pass the ORIGINAL frame
        // through, schema untouched
        assert(mapped.columns.toSeq === df.columns.toSeq,
          s"sample $i: no-match must pass the fact frame through")
        assert(mapped.count() === facts.size.toLong, s"sample $i passthrough")
      } else {
      val got = mapped
        .collect().map(r => (r.getString(0), r.getString(3), r.getString(2)) ->
          r.getDouble(4)).toMap // cols: target, name, period_end, entity_id, value
      assert(got.keySet === want.keySet, s"sample $i: group keys diverge")
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) <= 1e-9 * math.max(1.0, math.abs(want(k))),
          s"sample $i $k: got $v want ${want(k)}")
      }
      }
    }
  }

  // ---- randomized GraphStore mutation sequences vs an in-memory model -----

  private sealed trait MutOp
  private case class MIngest(keys: Seq[String]) extends MutOp
  private case class MSet(key: String) extends MutOp
  private case class MDelete(key: String) extends MutOp

  private val mutOpsGen: Gen[Seq[MutOp]] = {
    val keyGen = Gen.chooseNum(0, 9).map(i => s"k$i")
    val opGen: Gen[MutOp] = Gen.frequency(
      3 -> Gen.chooseNum(1, 4).flatMap(n =>
        Gen.listOfN(n, keyGen).map(ks => MIngest(ks.distinct))),
      4 -> keyGen.map(MSet(_)),
      2 -> keyGen.map(MDelete(_)))
    Gen.chooseNum(6, 10).flatMap(n => Gen.listOfN(n, opGen))
  }

  test("randomized mutation sequences match an in-memory model, counts and time travel included") {
    val schema = graft.schema.CustomSchemaJson.parse(
      """{"name":"prop","version":"1.0",
        "nodes":[{"name":"Thing","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"v","type":"INT64"}]}],
        "relationships":[]}""")
    samples(mutOpsGen, 5).zipWithIndex.foreach { case (ops, si) =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-prop-mut$si").toString
      // exercise BOTH retention widths (round-13 knob): the model's
      // time-travel window below widens with it
      val retain = 2 + (si % 2)
      val store = new graft.storage.GraphStore(spark, root, "g", schema,
        retainGenerations = retain)
      val model = scala.collection.mutable.Map[String, Long]()
      // model state at the END of each generation's tenure (appends
      // land in the ACTIVE generation, so a retained generation reads
      // as of the NEXT rewrite, its appends included)
      val genEnd = scala.collection.mutable.Map[Int, Map[String, Long]]()
      var tick = 0L
      ops.zipWithIndex.foreach { case (op, oi) =>
        val ctx = s"sample $si op $oi $op"
        op match {
          case MIngest(keys) =>
            tick += 1
            val fresh = keys.filterNot(model.contains)
            val n = store.ingestNodes("Thing",
              keys.map(k => (k, tick)).toDF("identifier", "v"),
              ignoreErrors = true)
            assert(n === fresh.size.toLong, ctx)
            fresh.foreach(k => model(k) = tick)
          case MSet(key) =>
            tick += 1
            genEnd(store.generationOf("Thing")) = model.toMap
            val n = store.updateNodeProps("Thing",
              Seq((key, tick)).toDF("__key", "v"))
            assert(n === (if (model.contains(key)) 1L else 0L), ctx)
            if (model.contains(key)) model(key) = tick
          case MDelete(key) =>
            genEnd(store.generationOf("Thing")) = model.toMap
            val n = store.deleteNodes("Thing",
              Seq(key).toDF("k"), detach = false)
            assert(n === (if (model.contains(key)) 1L else 0L), ctx)
            model.remove(key)
        }
        val got = store.node("Thing").select("identifier", "v")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === model.toMap, ctx)
      }
      // every generation inside the retention window reads exactly as
      // of its tenure end (retain−1 predecessors: cur−1 always, cur−2
      // too under the widened knob — no bucket can have advanced more
      // than that many times since, so all its named dirs are retained)
      val cur = store.generationOf("Thing")
      (1 until retain).foreach { back =>
        genEnd.get(cur - back).filter(_ => cur - back >= 1).foreach { snap =>
          val tt = store.nodeAt("Thing", cur - back).select("identifier", "v")
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          assert(tt === snap,
            s"sample $si (retain=$retain) time travel to gen ${cur - back}")
        }
      }
    }
  }

  test("randomized graph mutations with relationships: detach cascades match the model") {
    val schema = graft.schema.CustomSchemaJson.parse(
      """{"name":"propg","version":"1.0",
        "nodes":[{"name":"Thing","properties":[
          {"name":"identifier","type":"STRING","is_primary_key":true},
          {"name":"v","type":"INT64"}]}],
        "relationships":[
          {"name":"NEXT","from_node":"Thing","to_node":"Thing"}]}""")
    val keyGen = Gen.chooseNum(0, 7).map(i => s"k$i")
    sealed trait GOp
    case class GNodes(keys: Seq[String]) extends GOp
    case class GRels(pairs: Seq[(String, String)]) extends GOp
    case class GSet(key: String) extends GOp
    case class GDetach(key: String) extends GOp
    val opGen: Gen[GOp] = Gen.frequency(
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, keyGen).map(ks => GNodes(ks.distinct))),
      3 -> Gen.chooseNum(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(keyGen, keyGen))
          .map(ps => GRels(ps.distinct))),
      3 -> keyGen.map(GSet(_)),
      2 -> keyGen.map(GDetach(_)))
    val opsGen = Gen.chooseNum(6, 9).flatMap(n => Gen.listOfN(n, opGen))

    samples(opsGen, 4).zipWithIndex.foreach { case (ops, si) =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-prop-g$si").toString
      val store = new graft.storage.GraphStore(spark, root, "g", schema)
      val nodes = scala.collection.mutable.Map[String, Long]()
      val rels = scala.collection.mutable.Set[(String, String)]()
      val relGenEnd = scala.collection.mutable.Map[Int, Set[(String, String)]]()
      var tick = 0L
      ops.zipWithIndex.foreach { case (op, oi) =>
        val ctx = s"sample $si op $oi $op"
        op match {
          case GNodes(keys) =>
            tick += 1
            val fresh = keys.filterNot(nodes.contains)
            assert(store.ingestNodes("Thing",
              keys.map(k => (k, tick)).toDF("identifier", "v"),
              ignoreErrors = true) === fresh.size.toLong, ctx)
            fresh.foreach(k => nodes(k) = tick)
          case GRels(pairs) =>
            val fresh = pairs.filterNot(rels.contains)
            assert(store.ingestRels("NEXT",
              pairs.map { case (a, b) => (a, b) }.toDF("from", "to"),
              ignoreExisting = true) === fresh.size.toLong, ctx)
            rels ++= fresh
          case GSet(key) =>
            tick += 1
            assert(store.updateNodeProps("Thing",
              Seq((key, tick)).toDF("__key", "v"))
              === (if (nodes.contains(key)) 1L else 0L), ctx)
            if (nodes.contains(key)) nodes(key) = tick
          case GDetach(key) =>
            // record the rel table's state at the END of its current
            // generation's tenure — a detach may bump it (both the
            // FROM-side scope and the round-13 TO-side probe rewrite)
            relGenEnd(store.relGenerationOf("NEXT")) = rels.toSet
            assert(store.deleteNodes("Thing",
              Seq(key).toDF("k"), detach = true)
              === (if (nodes.contains(key)) 1L else 0L), ctx)
            nodes.remove(key)
            rels.retain { case (a, b) => a != key && b != key }
        }
        val gotN = store.node("Thing").select("identifier", "v")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(gotN === nodes.toMap, ctx)
        val gotR = store.rel("NEXT").select("src", "dst")
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(gotR === rels.toSet, ctx)
      }
      // rel-table TIME TRAVEL across detach rewrites (round 13: the
      // TO-side probe scopes the rewrite — retained generations must
      // still read their exact tenure-end state, untouched buckets
      // shared across manifests included)
      val curR = store.relGenerationOf("NEXT")
      relGenEnd.get(curR - 1).filter(_ => curR >= 2).foreach { snap =>
        val tt = store.relAt("NEXT", curR - 1).select("src", "dst")
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
        assert(tt === snap, s"sample $si rel time travel to gen ${curR - 1}")
      }
    }
  }

}
