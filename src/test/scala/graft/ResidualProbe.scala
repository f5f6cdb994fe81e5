package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Round-13 measurement probe: raw-model vs residual-model IVFADC
  * recall@10 at c = 16 on the sf0.001 embeddings fixture across nprobe —
  * the datum behind the residual path's pinned PqSpec floor (round-12
  * VERDICT #1 target: ≥ 0.60 at nprobe = 8 without the refine stage). */
object ResidualProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val topk = 10
    val exact = rows.keys.toSeq.sorted.map { q =>
      q -> rows.keys.filter(_ != q).toSeq
        .sortBy(x => (d2(rows(q), rows(x)), x)).take(topk).toSet
    }.toMap
    def recall(pairs: Array[(Long, Long)]): Double = {
      val byQ = pairs.groupBy(_._1)
      val rs = rows.keys.toSeq.sorted.map { q =>
        exact(q).intersect(byQ.getOrElse(q, Array.empty).map(_._2).toSet)
          .size.toDouble / topk
      }
      rs.sum / rs.length
    }
    val raw = functions.Pq.fit(emb, "embedding")
    val im = functions.Pq.fitIvfPq(emb, "embedding", centroids = 16)
    val rm = functions.Pq.fitIvfPqRotated(emb, "embedding", centroids = 16)
    val au = functions.Pq.fitIvfPqAuto(emb, "embedding", centroids = 16)
    println(f"isotropic auto-pick: ${au.variant}  explained=${au.explained}%.3f  momentCv=${au.momentCv}%.3f")
    Seq(2, 4, 8).foreach { np =>
      val r1 = recall(functions.Pq.ivfAdcTopk(emb, "embedding", raw, topk,
          centroids = 16, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r2 = recall(functions.Pq.ivfAdcTopk(emb, "embedding", im, topk,
          nprobe = np, idCol = "vec_id", queryIds = None)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r3 = recall(functions.Pq.ivfAdcTopk(emb, "embedding", rm, topk,
          nprobe = np, idCol = "vec_id", queryIds = None)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r4 = recall(functions.Pq.ivfAdcTopkAuto(emb, "embedding", au, topk,
          centroids = 16, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      println(f"isotropic nprobe=$np%2d  raw=$r1%.3f  residual=$r2%.3f  opq+residual=$r3%.3f  auto=$r4%.3f")
    }

    // clustered regime — the data shape residual encoding exists for:
    // 16 well-separated gaussians in 64-d, spread 1, separation ~10
    import spark.implicits._
    val rnd = new scala.util.Random(1313)
    val centers = Array.fill(16, 64)(rnd.nextGaussian() * 10.0)
    val cl = (0 until 500).map { i =>
      val c = centers(i % 16)
      (i.toLong, (0 until 64).map(j => c(j) + rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
    val clRows = cl.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val clExact = clRows.keys.toSeq.sorted.map { q =>
      q -> clRows.keys.filter(_ != q).toSeq
        .sortBy(x => (d2(clRows(q), clRows(x)), x)).take(topk).toSet
    }.toMap
    def clRecall(pairs: Array[(Long, Long)]): Double = {
      val byQ = pairs.groupBy(_._1)
      val rs = clRows.keys.toSeq.sorted.map { q =>
        clExact(q).intersect(byQ.getOrElse(q, Array.empty).map(_._2).toSet)
          .size.toDouble / topk
      }
      rs.sum / rs.length
    }
    val rawC = functions.Pq.fit(cl, "embedding")
    val imC = functions.Pq.fitIvfPq(cl, "embedding", centroids = 16)
    val rmC = functions.Pq.fitIvfPqRotated(cl, "embedding", centroids = 16)
    val auC = functions.Pq.fitIvfPqAuto(cl, "embedding", centroids = 16)
    println(f"clustered auto-pick: ${auC.variant}  explained=${auC.explained}%.3f  momentCv=${auC.momentCv}%.3f")
    Seq(2, 8).foreach { np =>
      val r1 = clRecall(functions.Pq.ivfAdcTopk(cl, "embedding", rawC, topk,
          centroids = 16, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r2 = clRecall(functions.Pq.ivfAdcTopk(cl, "embedding", imC, topk,
          nprobe = np, idCol = "vec_id", queryIds = None)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r3 = clRecall(functions.Pq.ivfAdcTopk(cl, "embedding", rmC, topk,
          nprobe = np, idCol = "vec_id", queryIds = None)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r4 = clRecall(functions.Pq.ivfAdcTopkAuto(cl, "embedding", auC, topk,
          centroids = 16, nprobe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      println(f"clustered nprobe=$np%2d  raw=$r1%.3f  residual=$r2%.3f  opq+residual=$r3%.3f  auto=$r4%.3f")
    }

    // harder shapes: many clusters vs a small codebook (the faiss
    // regime: codebook capacity spent on cluster OFFSETS vs spread)
    for ((nClusters, kk) <- Seq((64, 16), (64, 32), (64, 256))) {
      val rnd2 = new scala.util.Random(777)
      val cents2 = Array.fill(nClusters, 64)(rnd2.nextGaussian() * 10.0)
      val cl2 = (0 until 1000).map { i =>
        val c = cents2(i % nClusters)
        (i.toLong, (0 until 64).map(j => c(j) + rnd2.nextGaussian()).toSeq)
      }.toDF("vec_id", "embedding")
      val rows2 = cl2.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val exact2 = rows2.keys.toSeq.sorted.map { q =>
        q -> rows2.keys.filter(_ != q).toSeq
          .sortBy(x => (d2(rows2(q), rows2(x)), x)).take(topk).toSet
      }.toMap
      def rec2(pairs: Array[(Long, Long)]): Double = {
        val byQ = pairs.groupBy(_._1)
        val rs = rows2.keys.toSeq.sorted.map { q =>
          exact2(q).intersect(byQ.getOrElse(q, Array.empty).map(_._2).toSet)
            .size.toDouble / topk
        }
        rs.sum / rs.length
      }
      val raw2 = functions.Pq.fit(cl2, "embedding", k = kk)
      val im2 = functions.Pq.fitIvfPq(cl2, "embedding", k = kk, centroids = 64)
      val r1 = rec2(functions.Pq.ivfAdcTopk(cl2, "embedding", raw2, topk,
          centroids = 64, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      val r2 = rec2(functions.Pq.ivfAdcTopk(cl2, "embedding", im2, topk,
          nprobe = 8, idCol = "vec_id", queryIds = None)
        .collect().map(r => (r.getLong(0), r.getLong(1))))
      println(f"hard clusters=$nClusters k=$kk%3d nprobe=8  raw=$r1%.3f  residual=$r2%.3f")
    }

    // heavy-tailed mixture (round-13 VERDICT #5): cluster sizes ~ Zipf,
    // per-cluster σ varying 0.5..3 — closer to a real embedding corpus
    // than the equal-size 10σ blobs above (a few giant clusters, a long
    // tail of tiny ones, inhomogeneous spread)
    {
      val rnd3 = new scala.util.Random(2026)
      val nC = 32
      val cents3 = Array.fill(nC, 64)(rnd3.nextGaussian() * 10.0)
      val sigma = Array.tabulate(nC)(c => 0.5 + 2.5 * c / (nC - 1).toDouble)
      val weights = Array.tabulate(nC)(c => 1.0 / (c + 1)) // Zipf s=1
      val wsum = weights.sum
      val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / wsum)
      val zdocs = (0 until 1500).map { i =>
        val u = rnd3.nextDouble()
        val c = cum.indexWhere(u <= _)
        (i.toLong,
          (0 until 64).map(j => cents3(c)(j) + rnd3.nextGaussian() * sigma(c)).toSeq)
      }.toDF("vec_id", "embedding")
      val zRows = zdocs.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val zExact = zRows.keys.toSeq.sorted.map { q =>
        q -> zRows.keys.filter(_ != q).toSeq
          .sortBy(x => (d2(zRows(q), zRows(x)), x)).take(topk).toSet
      }.toMap
      def zRecall(pairs: Array[(Long, Long)]): Double = {
        val byQ = pairs.groupBy(_._1)
        val rs = zRows.keys.toSeq.sorted.map { q =>
          zExact(q).intersect(byQ.getOrElse(q, Array.empty).map(_._2).toSet)
            .size.toDouble / topk
        }
        rs.sum / rs.length
      }
      val rawZ = functions.Pq.fit(zdocs, "embedding")
      val imZ = functions.Pq.fitIvfPq(zdocs, "embedding", centroids = 16)
      val rmZ = functions.Pq.fitIvfPqRotated(zdocs, "embedding", centroids = 16)
      val auZ = functions.Pq.fitIvfPqAuto(zdocs, "embedding", centroids = 16)
      println(f"zipf auto-pick: ${auZ.variant}  explained=${auZ.explained}%.3f  momentCv=${auZ.momentCv}%.3f")
      Seq(4, 8).foreach { np =>
        val r1 = zRecall(functions.Pq.ivfAdcTopk(zdocs, "embedding", rawZ, topk,
            centroids = 16, nprobe = np)
          .collect().map(r => (r.getLong(0), r.getLong(1))))
        val r2 = zRecall(functions.Pq.ivfAdcTopk(zdocs, "embedding", imZ, topk,
            nprobe = np, idCol = "vec_id", queryIds = None)
          .collect().map(r => (r.getLong(0), r.getLong(1))))
        val r3 = zRecall(functions.Pq.ivfAdcTopk(zdocs, "embedding", rmZ, topk,
            nprobe = np, idCol = "vec_id", queryIds = None)
          .collect().map(r => (r.getLong(0), r.getLong(1))))
        val r4 = zRecall(functions.Pq.ivfAdcTopkAuto(zdocs, "embedding", auZ, topk,
            centroids = 16, nprobe = np)
          .collect().map(r => (r.getLong(0), r.getLong(1))))
        println(f"zipf nprobe=$np%2d  raw=$r1%.3f  residual=$r2%.3f  opq+residual=$r3%.3f  auto=$r4%.3f")
      }
    }

    // driver value-identity spot check on the residual path (clustered)
    val homes = clRows.map { case (id, x) =>
      id -> imC.cents.minBy { case (cid, cv) =>
        (d2(x, cv.toArray), cid)
      }._1
    }
    val centMap = imC.cents.toMap
    val codes = functions.Pq.encodeBlocks(
        functions.Pq.residuals(
          cl.select(col("vec_id"),
            org.apache.spark.sql.functions.transform(col("embedding"),
              _.cast("double")).as("v")),
          imC.cents), "rv", imC.pq)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = functions.Pq.ivfAdcTopk(cl, "embedding", imC, topk,
        nprobe = 8, idCol = "vec_id", queryIds = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    var bad = 0
    got.take(300).foreach { case (q, x, v) =>
      val c = centMap(homes(x)).toArray
      val qr = clRows(q).zip(c).map { case (a, b) => a - b }
      val want = (0 until imC.pq.m).map { b =>
        val cb = imC.pq.codebooks(b)(codes((x, b)).toInt)
        (0 until imC.pq.sub).map { i =>
          val t = qr(b * imC.pq.sub + i) - cb(i); t * t
        }.sum
      }.sum
      if (math.abs(v - want) > 1e-9 * math.max(1.0, want)) bad += 1
    }
    println(s"value-identity mismatches: $bad / 300")
    spark.stop()
  }
}
