package graft.queries

/** Union of every query module. Modules are added here as they land. */
object Registry {
  def all: Map[String, QueryDef] =
    Relational.defs ++ Dedup.defs ++ TextOps.defs ++ Vectors.defs ++
      Multimodal.defs ++ Dialect.defs ++ Stats.defs ++ Corpus.defs ++
      TimeSeries.defs
}
