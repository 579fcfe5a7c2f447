package graft.lake

/** Test-only bridge into the lake package: lets specs replay a commit
  * at an already-taken version to exercise the exclusive-publish path.
  */
object LakeTestAccess {
  def recommitAt(t: LakeTable, version: Int, fromVersion: Int): Int =
    t.commitForTest(version, t.manifest(fromVersion))
}
