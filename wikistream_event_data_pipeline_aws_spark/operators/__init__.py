"""Library-level operators (SURVEY §4: the only 'engine' features Spark
doesn't hand us directly): MERGE without Iceberg/Delta, deterministic
dedup, and the LLM-data-pipeline extensions (text dedup, similarity
search, text analysis, multimodal plumbing)."""
