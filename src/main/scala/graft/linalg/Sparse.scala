package graft.linalg

/** Sparse-vector kernels (SURVEY §2.7 M2/M3) over `Map[String,Double]`
  * document vectors — the reference's string-encoded `termId:w,...`
  * vectors (task2_2.java:131-146) as first-class map values.
  *
  * Pure Scala functions, used both driver-side (centroid math, O(k)
  * rows) and inside executor closures (assignment UDFs). The maps are
  * per-document sparse (≪ vocabulary), so the kernels are O(nnz).
  */
object Sparse {
  type Vec = Map[String, Double]

  /** Cosine similarity with the reference's 3-decimal rounding
    * (task2_2.java:148-180, round at :179); 0 when either norm is 0. */
  def cosine(a: Vec, b: Vec, round3: Boolean = true): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val (small, large) = if (a.size <= b.size) (a, b) else (b, a)
    var dot = 0.0
    small.foreach { case (k, v) =>
      val w = large.getOrElse(k, 0.0)
      if (w != 0.0) dot += v * w
    }
    val na = math.sqrt(a.valuesIterator.map(x => x * x).sum)
    val nb = math.sqrt(b.valuesIterator.map(x => x * x).sum)
    if (na == 0.0 || nb == 0.0) 0.0
    else {
      val c = dot / (na * nb)
      if (round3) math.round(c * 1000.0) / 1000.0 else c
    }
  }

  /** Squared Euclidean distance over the key union
    * (task2_2.java:183-200). */
  def sqDist(a: Vec, b: Vec): Double = {
    var s = 0.0
    a.foreach { case (k, v) => val d = v - b.getOrElse(k, 0.0); s += d * d }
    b.foreach { case (k, v) => if (!a.contains(k)) s += v * v }
    s
  }

  /** Index of the centroid with max cosine similarity; first max wins
    * (reference's strict `>` comparison ⇒ lowest index on ties,
    * task2_2.java:272-279). */
  def nearestByCosine(v: Vec, centroids: IndexedSeq[Vec]): Int = {
    var best = 0; var bestSim = Double.NegativeInfinity; var i = 0
    while (i < centroids.length) {
      val s = cosine(v, centroids(i))
      if (s > bestSim) { bestSim = s; best = i }
      i += 1
    }
    best
  }

  /** Min squared distance to any centroid (K-Means|| cost,
    * task2_3.java:215-232). */
  def minSqDist(v: Vec, centroids: IndexedSeq[Vec]): Double = {
    var m = Double.PositiveInfinity; var i = 0
    while (i < centroids.length) {
      val d = sqDist(v, centroids(i)); if (d < m) m = d; i += 1
    }
    m
  }
}
