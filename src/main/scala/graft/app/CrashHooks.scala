package graft.app

/** Test-only crash injection for the intake's durability contracts: the
  * per-seam proofs (gram-retire/family-fold, mid/base fold, marker writes)
  * each pin ONE chosen boundary; the randomized soak
  * (`graft.tools.CrashSoak`, plus the seeded spec variant) arms a crash at
  * a random SEAM INDEX per batch, replays the batch, and diffs the final
  * outputs against an uncrashed control — turning the per-seam proofs into
  * a whole-surface one.
  *
  * A "seam" is the boundary right after each state-mutating driver action
  * in [[Intake.processBatch]] and [[Intake.rebucket]] (output writes,
  * state-part writes, fold writes, retires, migration publishes) — the
  * places a real kill between actions would land. Disarmed cost is one
  * volatile read per seam, nothing else; production never arms it.
  *
  * Seam names are dynamic (family folds carry their prefix), so there is
  * no static registry to size an arm bound from; instead the harness
  * MEASURES the bound: [[startCounting]]/[[stopCounting]] around an
  * uncrashed run count the seams actually crossed, and the soak arms
  * within that measured range — a seam added later widens the measured
  * count automatically instead of silently skewing the clean-run
  * probability (the hazard a hard-coded bound had).
  */
private[graft] object CrashHooks {

  /** Thrown by an armed seam — distinct from every real failure class so
    * harnesses catch exactly the injected kill and nothing else. */
  final class InjectedCrash(val seamName: String)
    extends RuntimeException(s"injected crash at seam '$seamName'")

  @volatile private var armAt: Int = -1
  private val hits = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var counting = false
  private val crossedN = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Arm: the `k`-th seam crossed after this call throws. A `k` beyond
    * the seams a batch actually crosses means no crash (the soak's way of
    * sometimes letting a batch run clean). */
  private[graft] def arm(k: Int): Unit = { hits.set(0); armAt = k }

  private[graft] def disarm(): Unit = armAt = -1

  /** Start counting seam crossings (for measuring a run's arm bound). */
  private[graft] def startCounting(): Unit = { crossedN.set(0); counting = true }

  /** Stop counting and return the seams crossed since [[startCounting]]. */
  private[graft] def stopCounting(): Int = { counting = false; crossedN.get() }

  /** Crossed by [[Intake]] after each state-mutating action. */
  private[app] def seam(name: String): Unit = {
    if (counting) crossedN.incrementAndGet()
    if (armAt >= 0 && hits.getAndIncrement() == armAt)
      throw new InjectedCrash(name)
  }
}
