"""Custom operators beyond Spark built-ins.

Two families:
- Training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) — additive capabilities the reference
  lacks, designed for 100 TB scale: everything is expression- or
  join-based, nothing materializes on the driver.
- Relational extensions (as-of join) — composition-of-DataFrame-ops
  implementations of operators Spark lacks.
"""
