package graft
object QueriesEvents { val qs: Seq[Q] = Seq() }
