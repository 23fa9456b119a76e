package graft
// scratch check main (not part of the library surface)
object Prof {
  def main(args: Array[String]): Unit = {
    // current use: verify the sbt output path the driver's bench
    // parse depends on — the final stdout line must be BARE JSON
    // (no "[info] " prefix, no trailing "[success]" line)
    println("""{"metric":"probe","value":1}""")
  }
}
