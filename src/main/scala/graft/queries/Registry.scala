package graft.queries

/** Union of every query module. Modules are added here as they land. */
object Registry {
  def all: Map[String, QueryDef] = {
    val modules = Seq(
      Relational.defs, Dedup.defs, TextOps.defs, Vectors.defs,
      Multimodal.defs, Dialect.defs, Stats.defs, Corpus.defs,
      TimeSeries.defs, Streaming.defs)
    // Each module's defs asserts within-module uniqueness (QueryDef.gate);
    // this asserts no key is claimed by two different modules.
    QueryDef.gate(modules.flatten: _*)
  }
}
