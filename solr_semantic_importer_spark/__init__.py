"""PySpark-native full-text (BM25) indexing + query engine.

A from-scratch re-expression of the capabilities of the reference
``krickert/solr-semantic-importer`` (a Solr crawl->transform->chunk->embed->index
pipeline plus the Solr/Lucene BM25 index semantics its configsets install) as an
idiomatic Spark engine:

- Layer A (dataflow): crawl/scan, date normalization, crawl-id stamping,
  chunking with overlap, parent/chunk fan-out, facet counts -- all as
  DataFrame transformations (``operators/``, ``sources/``).
- Layer B (index/query): vectorized analysis (tokenize+lowercase, the
  reference's ``text_general`` chain), posting-list construction with
  delta-gap + varint compression and hot-term salting, global df/avgdl
  stats, block-max WAND top-k BM25(k1=1.2, b=0.75) -- ``index/`` and
  ``query/``.

Reference semantics citations (into /root/reference) live in each module's
docstrings. Nothing here is a port: the execution design is Spark-first
(DataFrame/Catalyst; Arrow-batched pandas UDFs only where built-ins cannot
express the semantics).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
