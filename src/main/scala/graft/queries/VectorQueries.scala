package graft.queries

/** Placeholder — filled in as the Vector operators land. */
object VectorQueries { val defs: Seq[QueryDef] = Seq() }
