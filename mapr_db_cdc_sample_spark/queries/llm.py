"""LLM-data-pipeline operator queries (SURVEY.md §2.2 Q37-Q40 + extensions).

Populated in Phase 3: dedup (exact, MinHash LSH, SimHash, n-gram Jaccard,
embedding near-dup), similarity search (exact top-k cosine, IVF/LSH),
text analysis (lang stats, term frequencies, quality, fingerprints).
"""

from __future__ import annotations
