package graft
object QueriesText { val qs: Seq[Q] = Seq() }
