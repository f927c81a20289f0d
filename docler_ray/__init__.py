"""docler_ray — a from-scratch Ray-Data-native document extraction engine.

Re-expresses the processing capabilities of phil65/docler (reference at
/root/reference, surveyed in SURVEY.md) as streaming Ray Data pipelines over
zero-copy Arrow batches: HTML boilerplate-strip extraction, PDF-style layout
parsing, page segmentation, chunking, dedup and text-analysis operators.

Not a port: the reference is an async per-document wrapper library around
third-party converters; this engine implements the extraction algorithms
itself as vectorized ``map_batches`` stages with actor pools for stateful
parsers. What is preserved from the reference is the *contract*: the in-band
marker grammar (``docler_ray.markers``), the output row shape (``docs`` /
``chunks`` tables), the (mime, lang) dispatch model, and chunker semantics.
"""

__version__ = "0.1.0"
