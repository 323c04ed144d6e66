"""Data-pipeline function library: text analysis, dedup, similarity.

These extend the engine beyond the reference surface with the operators
a large-scale training-data pipeline needs (BASELINE.json north star).
Everything in the oracle-checked path is built-in Column expressions —
JVM-side, codegen-friendly, no Python in the hot loop.
"""
