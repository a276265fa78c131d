package graft

/** Fake requeue child for BenchForkSpec's SIGKILL drill: prints one
  * well-formed benchone line, flushes, then sends ITSELF the real
  * signal 9 (exit 137 — not an in-JVM exception), reproducing the
  * BENCH_r18 driver-kill failure mode from the child side. The parent
  * under test must (a) keep the flushed partial measurement,
  * (b) surface a non-empty requeue failure reason, and (c) never
  * throw — the two-phase record it committed before the fork stands. */
object BenchOneKillSelf {
  def main(args: Array[String]): Unit = {
    // one well-formed line for the FIRST requested row, so the spec
    // can assert partial output survives the kill
    val name = args.headOption.getOrElse("fake_row")
    println(s"""{"benchone":"$name","wall":0.123,"cpu":0.10,"rows":7,"reps":[[0.123,0.10,0.00,0.00,0.00,1,0,0,0]]}""")
    Console.out.flush()
    new ProcessBuilder("kill", "-9", ProcessHandle.current().pid().toString)
      .start().waitFor()
    Thread.sleep(60000) // never reached: SIGKILL is not interceptable
  }
}
