"""PySpark-native anonymise/minimise analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference ``elliotjreed/database-anonymiser-minimiser`` (a Go CLI that
exports relational databases to SQL dumps while anonymising PII columns and
minimising row sets), re-expressed Spark-first:

- the YAML/JSON config is the logical-plan input (reference:
  ``internal/config/config.go:15-18``),
- each table compiles to a declarative DataFrame plan (scan -> minimise ->
  anonymise -> sink) that Catalyst optimises (predicate/limit pushdown and
  column pruning are native, cf. SURVEY.md section 4),
- anonymisation rules are pure JVM-side column expressions (deterministic,
  keyed on the original value) so value-consistency across tables holds with
  no shared state, unlike the reference's mutex-guarded in-memory map
  (``internal/anonymiser/anonymiser.go:19-23``) which cannot scale,
- the FK topological sort (``internal/schema/schema.go:62-166``) runs
  driver-side on table *names* only — never on data.

Beyond reference parity the package adds large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing,
event-time windows) designed for 100 TB / multi-executor operation.
"""

__version__ = "0.1.0"
