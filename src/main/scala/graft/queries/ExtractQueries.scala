package graft.queries

/** Placeholder — filled in as the Extract operators land. */
object ExtractQueries { val defs: Seq[QueryDef] = Seq() }
