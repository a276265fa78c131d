package graft

/** Fake requeue children for BenchForkSpec's incomplete-adjudication
  * drills (review r19 ×2 — both shapes must surface `requeue_failed`
  * despite a clean exit 0):
  *  - [[BenchOneAllFail]]: the requested row comes back as the all-FAIL
  *    sentinel (wall −1 — every child rep threw, e.g. OOM at the
  *    child's 4g bound): a well-formed line with NO adjudicating
  *    measurement in it;
  *  - [[BenchOneWrongName]]: a well-formed line for a name NOBODY
  *    requested (registry drift / stray stdout), leaving the requested
  *    name missing while the row COUNT matches. */
object BenchOneAllFail {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("fake_row")
    println(s"""{"benchone":"$name","wall":-1.000,"cpu":-1.00,"rows":-1,"reps":["FAIL","FAIL","FAIL"]}""")
  }
}

object BenchOneWrongName {
  def main(args: Array[String]): Unit =
    println("""{"benchone":"some_other_row","wall":0.5,"cpu":0.40,"rows":3,"reps":[[0.5,0.40,0.00,0.00,0.00,1,0,0,0]]}""")
}
