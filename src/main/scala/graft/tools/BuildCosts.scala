package graft.tools

/** One-time layout/build costs recorded by the stored-artifact
  * builders (the bucketed lineitem landing, the co-purchase edge
  * artifact — and anything else that amortizes a build across
  * serve-time queries). The bench artifact publishes the snapshot
  * next to the serve-only timings, so the amortization story always
  * carries BOTH sides (e13 reports its ANN build/serve split in its
  * own output; this generalizes that honesty rule to artifacts whose
  * consuming queries report serve time only — VERDICT r14 item 7).
  *
  * Driver-side, in-memory, per-JVM: build costs are only meaningful
  * within the session that paid them.
  */
object BuildCosts {
  private val costs =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Run `body`, recording its wall-clock seconds under `name`. */
  def timed[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    costs.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Everything recorded so far (name → seconds). */
  def snapshot(): Map[String, Double] = costs.toMap
}
