package graft.queries

/** Placeholder — filled in as the Dedup operators land. */
object DedupQueries { val defs: Seq[QueryDef] = Seq() }
