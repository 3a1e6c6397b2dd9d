package graft

/** Correctness gate for the Galen 6-rule mutual recursion: the distributed
  * semi-naive evaluation must reach the exact fixpoint an in-memory naive
  * Datalog evaluation reaches on the same generated relations. The naive
  * model re-applies EVERY rule to the FULL collections each round (no
  * semi-naive shortcuts), so any delta-bookkeeping bug in the distributed
  * loop (a missed Δ⋈Δ substitution, an under-derived bilinear term)
  * diverges here. */
class GalenSpec extends SparkSpec {

  private def naive(n: Int): (Set[(Long, Long)], Set[(Long, Long, Long)]) = {
    val p0 = (1 until n).map(i => (i.toLong, (i / 2).toLong)).toSet
    val q0 = (1 until n).collect {
      case i if i % 64 == 0 && i > n / 4 && i < n / 2 =>
        (i.toLong, (i % 16).toLong, (i / 2).toLong)
    }.toSet
    val u = (1 until n).collect { case i if i % 128 == 0 =>
      (i.toLong, (i % 16).toLong, (i % 97 + 1).toLong) }.toSet
    val c = (1 until n).collect { case i if i % 128 == 0 =>
      (i.toLong, (i + 1).toLong, (i % 89 + 1).toLong) }.toSet
    val s = (0L to 2L).map(r => (r, r + 1)).toSet
    val rr = (1 until n).collect { case i if i % 256 == 0 =>
      ((i % 16).toLong, (i % 7).toLong, (i % 83 + 1).toLong) }.toSet
    def ix[A, B](xs: Iterable[(A, B)]): Map[A, Seq[B]] =
      xs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    var p = p0
    var q = q0
    var changed = true
    while (changed) {
      val pByX = ix(p.map { case (x, y) => (x, y) })
      val pByY = ix(p.map { case (x, y) => (y, x) })
      val qByX = ix(q.map { case (x, r0, z) => (x, (r0, z)) })
      val qByRZ = ix(q.map { case (x, r0, z) => ((r0, z), x) })
      val uByW = ix(u.map { case (w, r0, z) => (w, (r0, z)) })
      val sByR = ix(s.map { case (r0, q2) => (r0, q2) })
      val rByY = ix(rr.map { case (y, u2, e) => (y, (u2, e)) })
      val np = p ++
        (for ((x, y) <- p; z <- pByX.getOrElse(y, Nil)) yield (x, z)) ++ // IR1
        (for ((y, w) <- p; (r0, z) <- uByW.getOrElse(w, Nil);           // IR3
              x <- qByRZ.getOrElse((r0, y), Nil)) yield (x, z)) ++
        (for ((y, w, z) <- c; x <- pByY.getOrElse(w, Nil)               // IR4
              if p.contains((x, y))) yield (x, z))
      val nq = q ++
        (for ((x, y) <- p; (r0, z) <- qByX.getOrElse(y, Nil)) yield (x, r0, z)) ++ // IR2
        (for ((x, r0, z) <- q; q2 <- sByR.getOrElse(r0, Nil)) yield (x, q2, z)) ++ // IR5
        (for ((x, y, z) <- q; (u2, e) <- rByY.getOrElse(y, Nil);        // IR6
              o <- q.collect { case (`z`, `u2`, o0) => o0 }) yield (x, e, o))
      changed = np.size != p.size || nq.size != q.size
      p = np
      q = nq
    }
    (p, q)
  }

  test("galen 6-rule mutual recursion == naive in-memory fixpoint") {
    val n = 512
    val (ep, eq) = naive(n)
    val (pDf, qDf, times, _) = GalenBench.run(spark, n.toLong)
    // FULL SET equality against the naive fixpoint, both collections
    val gp = pDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gq = qDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gp == ep, s"p differs: extra=${(gp -- ep).take(3)} missing=${(ep -- gp).take(3)}")
    assert(gq == eq, s"q differs: extra=${(gq -- eq).take(3)} missing=${(eq -- gq).take(3)}")
    // the loop must genuinely iterate (depth log2(n) ancestors via IR1)
    assert(times.size >= 5, s"fixpoint converged in only ${times.size} rounds")
  }
}
