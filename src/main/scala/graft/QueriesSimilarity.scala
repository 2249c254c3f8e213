package graft
object QueriesSimilarity { val qs: Seq[Q] = Seq() }
