package graft.lake

/** Test seam for the conflict-aware commit path: installs a hook that
  * runs right before a read-modify-write op's FIRST commit attempt, so
  * specs can deterministically make it lose the race to a concurrent
  * writer (nondeterministic thread interleaving can't reliably produce
  * the conflict window). */
object LakeTestHooks {
  def withRaceHook[A](hook: String => Unit)(body: => A): A = {
    val old = LakeTable.raceHook
    LakeTable.raceHook = hook
    try body finally LakeTable.raceHook = old
  }
}
