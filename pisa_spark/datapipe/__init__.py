"""Training-data pipeline operators (SURVEY.md §2 companion layer).

Large-scale corpus-preparation operations a 100 TB web-text pipeline
needs around the index engine: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), benchmark
decontamination, similarity search (brute-force + IVF + LSH ANN),
text analysis (language ID, quality/repetition filter signals, token
counting, winnowing fingerprints), curation (PII redaction,
deterministic stratified sampling), and multimodal binary-column
plumbing.

Everything is deterministic and integer-quantized so the driver's
DuckDB oracle reproduces each result value-exactly (see
``pisa_spark.datapipe.entries``).
"""
