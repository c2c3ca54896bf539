"""Composite operators that go beyond single-query expression work:
approximate similarity (LSH / IVF), pandas-UDF vector kernels, and
multimodal column plumbing."""
