"""Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the data-processing capabilities of
``sixscripts-ai/ai-knowledge-graph`` (reference snapshot at
``/root/reference``) expressed as ``ray.data.Dataset`` pipelines:

- ``functions/`` — pure, Ray-free scalar/batch functions (chunking,
  JSON repair, normalization, the deterministic mock model).
- ``sources/``  — dataset readers / synthesizers (Common-Crawl-style
  ``pages`` table, triples corpora).
- ``stages/``   — ``Dataset -> Dataset`` transforms (extraction,
  chunking, triple extraction actor pool, canonicalization, inference,
  cleaning, dedup, materialization, text analysis, similarity).
- ``pipelines/`` — phase composition + config (the reference's
  ``generate-graph.py`` lifecycle re-expressed Ray-Data-first).
- ``state/``    — partitioned checkpoint manifest for resumable runs.

No module in this package calls ``ray.init()`` — the caller owns the
Ray session.
"""

__version__ = "0.1.0"
