"""Large-scale training-data pipeline operators (beyond-reference surface):
text analysis, deduplication, similarity search, multimodal plumbing.

These extend the reference's capabilities per the north star in
BASELINE.json; everything is built from Spark built-ins (JVM-side,
codegen-friendly) except the clearly-marked multimodal decode stubs.
"""
